"""Unigram language-model quality scoring (the perplexity-filter shape).

CCNet/RedPajama-style corpora gate documents on language-model
perplexity: a document whose tokens are corpus-typical scores high, one
full of rare garble scores low.  This module is that filter's exact
unigram core — per-document mean token log-probability under the
corpus's own unigram LM — expressed Ray-Data-first:

- phase 1: corpus unigram counts ``(token, tf)`` via the
  hive-partitioned disk-shuffle sum (``boilerplate.unit_term_
  frequencies`` — the postings-shuffle pattern, never Ray Data's
  pull-based sort shuffle);
- phase 2 (driver, tiny): each vocab entry's log-probability is
  quantized ONCE to a fixed-point integer ``lp = floor(ln(tf/C) *
  scale + 0.5)`` (C = total tokens).  All later arithmetic is integer
  sums + one final division, so the engine and a DuckDB oracle agree
  bit-for-bit — no float summation-order hazards anywhere;
- phase 3 (map_batches): broadcast the small ``(token, lp)`` table via
  ``ray.put``; per batch one ``split_pattern`` + ``index_in`` probe +
  two ``np.bincount`` reductions.  No per-row Python, no corpus
  materialization.

Reference parity note: vfs-index has no LM scoring; this is a
beyond-reference LLM-data operator (brief: quality scoring for
training-data curation).  Scale note: the broadcast assumes the vocab
fits in the object store (same bound as functions/keywords.py); the
driver-side ``math.log`` loop over the vocab exists for oracle-exact
libm parity — at web scale swap it for ``np.log`` over the array (the
sub-ulp difference only matters to the SQL hash gate, not the filter).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .boilerplate import _SEPS, unit_term_frequencies


def unigram_logprobs(tf_table: pa.Table, *, scale: int = 10**6) -> pa.Table:
    """Fixed-point unigram log-probabilities from a corpus ``(unit,
    tf)`` table: ``lp = floor(ln(tf / C) * scale + 0.5)`` with
    ``C = sum(tf)``.  Uses libm ``math.log`` so DuckDB's ``ln`` (also
    libm) lands on the identical double before quantization."""
    tf = tf_table["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(tf.sum())
    lp = np.fromiter(
        (math.floor(math.log(c / total) * scale + 0.5) for c in tf.tolist()),
        dtype=np.int64, count=len(tf))
    u = tf_table["unit"]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    return pa.table({"unit": u, "lp": pa.array(lp, pa.int64()),
                     "total": pa.array(np.full(len(lp), total, np.int64))})


def lm_score(ds, *, unit: str = "token", text_col: str = "text",
             id_col: str = "doc_id", tf_table: pa.Table | None = None,
             num_parts: int | None = None, scale: int = 10**6):
    """Per-document unigram-LM score: a Dataset of ``(id_col, n_tokens,
    avg_logprob_x1e6)`` where ``avg_logprob_x1e6 = floor(sum(lp)/n +
    0.5)`` over the document's tokens (higher = more corpus-typical;
    threshold it to build the quality filter).  ``tf_table`` (a
    ``(unit, tf)`` table, e.g. from ``unit_term_frequencies``) is
    computed from ``ds`` itself when not given; tokens missing from a
    user-supplied table score as singletons (tf=1).  Null/empty rows
    emit ``n_tokens=0, avg=0``."""
    import ray

    sep = _SEPS[unit]
    if tf_table is None:
        tf_table = unit_term_frequencies(ds, unit=unit, text_col=text_col,
                                         num_parts=num_parts)
    lp_t = unigram_logprobs(tf_table, scale=scale)
    total = int(lp_t["total"][0].as_py()) if lp_t.num_rows else 1
    oov_lp = math.floor(math.log(1 / max(total, 1)) * scale + 0.5)
    vocab_ref = ray.put(lp_t.select(["unit", "lp"]))

    def score(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        vunits = voc["unit"]
        if isinstance(vunits, pa.ChunkedArray):
            vunits = vunits.combine_chunks()
        vlp = voc["lp"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(batch)
        pos = pc.index_in(flat, value_set=vunits)
        posn = pos.to_numpy(zero_copy_only=False)
        if posn.dtype.kind == "f":
            missing = np.isnan(posn)
        else:
            missing = posn == None  # noqa: E711  (object array from nulls)
        posn = np.where(missing, 0, posn).astype(np.int64)
        tok_lp = vlp[posn] if len(vlp) else np.zeros(len(posn), np.int64)
        tok_lp = np.where(missing, np.int64(oov_lp), tok_lp)
        # integer-valued fp64 sums: every |lp| * doc_len << 2^53, so
        # bincount's float accumulation is exact regardless of order
        sum_lp = np.bincount(parent.astype(np.int64),
                             weights=tok_lp.astype(np.float64), minlength=n)
        ntok = np.bincount(parent.astype(np.int64), minlength=n)
        avg = np.floor(sum_lp / np.maximum(ntok, 1) + 0.5).astype(np.int64)
        avg[ntok == 0] = 0
        # id passes through untouched (int64 doc ids OR string urls)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(ntok.astype(np.int64), pa.int64()),
            "avg_logprob_x1e6": pa.array(avg, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def quality_filter(ds, *, pct: int = 30, unit: str = "token",
                   text_col: str = "text", id_col: str = "doc_id",
                   tf_table: pa.Table | None = None,
                   num_parts: int | None = None, scale: int = 10**6):
    """Corpus-percentile quality gate (the CCNet perplexity filter's
    thresholding step): score every document with ``lm_score``, find
    the EXACT ``pct``-th percentile of ``avg_logprob_x1e6`` over the
    whole corpus (discrete ascending rank ``ceil(pct*n/100)`` — the
    ``events_quantiles`` / DuckDB convention, exact because scores are
    already fixed-point integers), and keep documents scoring at or
    above it (ties at the threshold survive).  Returns ``(dataset,
    threshold)`` where the dataset holds the surviving ``(id, n_tokens,
    avg_logprob_x1e6)`` rows.

    100-TB shape: the scored table (3 ints/doc) is materialized to
    object-store Arrow refs; per-ref value-count partials ship only
    (distinct score, count) pairs to the driver — the corpus text never
    moves again, and the survivors stay distributed
    (``from_arrow_refs``).  At extreme doc counts write the scores to
    parquet first and histogram from a pruned re-read."""
    import ray

    from .boilerplate import _group_counts

    if not 1 <= pct <= 100:
        raise ValueError("pct must be in [1, 100]")
    scored = lm_score(ds, unit=unit, text_col=text_col, id_col=id_col,
                      tf_table=tf_table, num_parts=num_parts, scale=scale)
    refs = scored.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def val_counts(t: pa.Table) -> pa.Table:
        return _group_counts(
            t.select(["avg_logprob_x1e6"]), ["avg_logprob_x1e6"],
            [("avg_logprob_x1e6", "count")])

    partials = [t for t in ray.get([val_counts.remote(r) for r in refs])
                if t.num_rows]
    empty = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                       ("avg_logprob_x1e6", pa.int64())]).empty_table()
    if not partials:
        return ray.data.from_arrow(empty), 0
    m = _group_counts(pa.concat_tables(partials).combine_chunks(),
                      ["avg_logprob_x1e6"],
                      [("avg_logprob_x1e6_count", "sum")])
    vals = m["avg_logprob_x1e6"].to_numpy(zero_copy_only=False)
    cnts = m["avg_logprob_x1e6_count_sum"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    rank = (pct * n + 99) // 100                  # ceil(pct*n/100), 1-based
    thr = int(vals[np.searchsorted(np.cumsum(cnts), rank)])

    @ray.remote(num_cpus=1)
    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["avg_logprob_x1e6"],
                                         pa.scalar(thr, pa.int64())))

    return ray.data.from_arrow_refs([filt.remote(r) for r in refs]), thr
