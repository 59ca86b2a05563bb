"""Per-document keyword extraction (rare-term tf/df profile).

For every document, its top-``k`` tokens ranked by corpus rarity:
``(df ASC, tf DESC, token ASC)`` — the rarest tokens corpus-wide,
frequency-in-doc breaking ties.  This is the integer-exact core of
tf-idf keyword tagging (tf·log(N/df) is monotone in exactly this
order for a fixed doc when df dominates), chosen so the engine, the
DuckDB oracle, and the tests can agree on bit-identical output with
no floating point anywhere.

Reference parity note: vfs-index has no per-doc keyword surface; this
is a beyond-reference LLM-data operator (document tagging / topic
hinting before curation).  The 100-TB shape:

- the (unit, df) vocabulary table comes from
  ``boilerplate.unit_doc_frequencies`` (per-batch partial distinct-doc
  counts, hive-partitioned disk-shuffle sum — never a Ray Data sort
  shuffle);
- the vocabulary is sorted once on the driver by UTF-8 bytes, then
  broadcast via ``ray.put``.  Token sort rank == position in the
  sorted vocab, so every per-batch ordering key is an integer array;
- per batch: one Arrow hash aggregation (doc, token) -> tf, one
  ``index_in`` probe against the broadcast vocab, one ``np.lexsort``
  + boundary-diff head-take.  No per-row Python, no corpus
  materialization.  A document never spans batches (one row per doc),
  so per-batch tf is exact.

Scale note: the broadcast assumes the vocabulary fits in the object
store (webtext head + long tail at ~10^8 distinct tokens × ~16 B is
a few GiB — one copy per node, zero-copy per task).  Beyond that,
partition BOTH sides by ``fnv(token) % P`` (the same spill pattern)
and join per part before the per-doc top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .boilerplate import _SEPS, _group_counts, unit_doc_frequencies

# df assigned to tokens absent from a user-supplied vocabulary: sorts
# after every real df, so unknown tokens can never displace known ones
_DF_MISSING = np.int64(2) ** np.int64(62)


def _sort_vocab_bytes(df_table: pa.Table) -> pa.Table:
    """Sort the (unit, df) vocab by raw UTF-8 bytes (DuckDB's binary
    collation for ORDER BY on VARCHAR == Arrow's lexicographic string
    order), so vocab position doubles as the token tie-break sort key
    inside the per-batch kernel. Vectorized — the vocab can be the
    whole web head."""
    u = df_table["unit"]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    return df_table.take(pc.sort_indices(u))


def doc_keywords(ds, *, k: int = 3, unit: str = "token",
                 text_col: str = "text", id_col: str = "doc_id",
                 df_table: pa.Table | None = None,
                 num_parts: int | None = None):
    """Top-``k`` keywords per document by ``(df ASC, tf DESC, token
    ASC)``.  Returns a Dataset of ``(id_col, rank, token, tf, df)``
    with rank 1-based; documents with fewer than ``k`` distinct tokens
    emit fewer rows.  ``df_table`` (an (unit, df) table, e.g. from
    ``unit_doc_frequencies``) is computed from ``ds`` itself when not
    given; tokens missing from a user-supplied table rank last."""
    import ray

    sep = _SEPS[unit]
    if df_table is None:
        df_table = unit_doc_frequencies(ds, unit=unit, text_col=text_col,
                                        num_parts=num_parts)
    vocab = _sort_vocab_bytes(df_table)
    vocab_ref = ray.put(vocab)

    def kb(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        vunits = voc["unit"]
        if isinstance(vunits, pa.ChunkedArray):
            vunits = vunits.combine_chunks()
        vdf = voc["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        tf_t = _group_counts(pa.table({"p": parent, "tok": flat}),
                             ["p", "tok"], [("tok", "count")])
        gp = tf_t["p"].to_numpy(zero_copy_only=False)
        gtok = tf_t["tok"]
        if isinstance(gtok, pa.ChunkedArray):
            gtok = gtok.combine_chunks()
        gtf = tf_t["tok_count"].to_numpy(zero_copy_only=False
                                         ).astype(np.int64)
        pos = pc.index_in(gtok, value_set=vunits)
        pos = pos.to_numpy(zero_copy_only=False)
        missing = np.isnan(pos) if pos.dtype.kind == "f" else \
            (pos == None)  # noqa: E711  (object array from nulls)
        pos = np.where(missing, len(vdf), pos).astype(np.int64)
        if missing.any():
            # unknown tokens tie-break among themselves by code-point
            # order (== UTF-8 byte order), placed after the whole vocab
            miss_idx = np.flatnonzero(missing)
            toks_np = gtok.to_numpy(zero_copy_only=False)
            _, inv = np.unique(toks_np[miss_idx].astype(str),
                               return_inverse=True)
            pos[miss_idx] = len(vdf) + inv
        dfv = np.where(missing, _DF_MISSING,
                       vdf[np.minimum(pos, len(vdf) - 1)]
                       if len(vdf) else _DF_MISSING).astype(np.int64)
        # order: doc, then df asc, tf desc, vocab position (== token
        # bytes) asc — all integer keys, primary key LAST for lexsort
        order = np.lexsort((pos, -gtf, dfv, gp))
        gp_s = gp[order]
        bnd = np.flatnonzero(np.concatenate(
            [[True], gp_s[1:] != gp_s[:-1]]))
        starts = np.repeat(bnd, np.diff(np.append(bnd, len(gp_s))))
        rank = np.arange(len(gp_s), dtype=np.int64) - starts
        keep = rank < k
        sel = order[keep]
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(gp[sel], pa.int64())),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
            "token": gtok.take(pa.array(sel, pa.int64())),
            "tf": pa.array(gtf[sel], pa.int64()),
            "df": pa.array(dfv[sel], pa.int64()),
        })

    return ds.map_batches(kb, batch_format="pyarrow")
