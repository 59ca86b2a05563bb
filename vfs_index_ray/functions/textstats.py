"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting. All vectorized per-batch `map_batches` kernels
over the documents/pages table.

Ratio outputs are fixed-point ints (``*_x1e4``) so results hash-compare
exactly against the DuckDB oracle SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenizer import word_tokens_flat

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")
_DE_MARKERS = ("der", "die", "und", "das", "ist", "nicht")
_ES_MARKERS = ("el", "la", "los", "de", "que", "es")


def _x1e4(x: np.ndarray) -> np.ndarray:
    """Half-up fixed-point rounding matching SQL floor(x*10000 + 0.5)."""
    return np.floor(x * 10000.0 + 0.5).astype(np.int64)


class TokenStats:
    """Per-doc token statistics (quality signals).

    Output: doc_id, n_tokens, n_uniq, stop_ratio_x1e4, avg_len_x1e4.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.stop = pa.array(list(STOPWORDS), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, parent, dl = word_tokens_flat(texts)
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=self.stop
                           ).to_numpy(zero_copy_only=False)
        len_sum = np.bincount(parent, weights=tok_lens, minlength=n)
        stop_cnt = np.bincount(parent, weights=is_stop.astype(np.float64),
                               minlength=n)
        # distinct tokens per doc: sort (parent, hash) runs
        from ..hashing import fnv1a64_tokens
        h = fnv1a64_tokens(flat)
        if len(h):
            order = np.lexsort((h, parent))
            p, t = parent[order], h[order]
            new = np.empty(len(p), bool)
            new[0] = True
            new[1:] = (p[1:] != p[:-1]) | (t[1:] != t[:-1])
            uniq = np.bincount(p[np.flatnonzero(new)], minlength=n)
        else:
            uniq = np.zeros(n, np.int64)
        nt = dl.astype(np.float64)
        safe = np.maximum(nt, 1.0)
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_tokens": pa.array(dl.astype(np.int64), pa.int64()),
            "n_uniq": pa.array(uniq.astype(np.int64), pa.int64()),
            "stop_ratio_x1e4": pa.array(_x1e4(stop_cnt / safe), pa.int64()),
            "avg_len_x1e4": pa.array(_x1e4(len_sum / safe), pa.int64()),
        })


class Fingerprint:
    """Deterministic content fingerprint: md5(lower(text)) hex — chosen so
    the DuckDB oracle (``md5(lower(text))``) reproduces it exactly."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch[self.text_col])
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in lowered.to_pylist()]
        return pa.table({
            "doc_id": batch[self.id_col],
            "fp": pa.array(fps, pa.string()),
        })


# GPT-2-style pre-tokenizer, RE2-compatible (no lookahead): contraction
# suffixes, letter runs, digit runs, punctuation runs, whitespace runs.
# pyarrow and DuckDB both run RE2, so counts agree exactly.
BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


class BpeTokenCount:
    """Subword-style token counting: the number of BPE pre-tokenizer
    segments (the standard proxy for LLM token budgets before merges).
    Fully vectorized via RE2 (``pc.count_substring_regex``)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[self.text_col],
                                     pattern=BPE_SPLIT)
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_bpe_tokens": n.cast(pa.int64()),
        })


class GopherQuality:
    """Gopher-style document quality signals (Rae et al. 2021, public
    recipe), the ones that are exactly SQL-checkable:

    - ``n_lines``, ``dup_line_frac_x1e4``: repeated-line fraction
      (repetition filter);
    - ``symbol_ratio_x1e4``: codepoints outside [a-zA-Z0-9 ] over all
      codepoints (symbol-to-char ratio);
    - ``bullet_ratio_x1e4``: lines starting with '- ' or '* '.

    All fixed-point ints; vectorized (line hashing via lexsort runs, CJK
    -safe codepoint classes over one UTF-32 buffer)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..hashing import fnv1a64_tokens
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = batch.num_rows
        lines = pc.split_pattern(texts, pattern="\n")
        parent = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(lines)
        n_lines = np.bincount(parent, minlength=n).astype(np.int64)
        # distinct lines per doc: (parent, line-hash) run starts
        h = fnv1a64_tokens(flat)
        if len(h):
            order = np.lexsort((h, parent))
            p, t = parent[order], h[order]
            new = np.empty(len(p), bool)
            new[0] = True
            new[1:] = (p[1:] != p[:-1]) | (t[1:] != t[:-1])
            uniq = np.bincount(p[np.flatnonzero(new)], minlength=n)
        else:
            uniq = np.zeros(n, np.int64)
        safe_lines = np.maximum(n_lines, 1).astype(np.float64)
        dup_frac = (n_lines - uniq) / safe_lines
        # bullet lines
        is_bullet = pc.or_(pc.starts_with(flat, pattern="- "),
                           pc.starts_with(flat, pattern="* ")
                           ).to_numpy(zero_copy_only=False)
        bullet = np.bincount(parent, weights=is_bullet.astype(np.float64),
                             minlength=n) / safe_lines
        # symbol ratio over codepoints (one UTF-32 buffer for the batch)
        py = texts.to_pylist()
        joined = "".join(s or "" for s in py)
        codes = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
        lens = np.fromiter((len(s or "") for s in py), np.int64, count=n)
        ok = ((codes >= ord("a")) & (codes <= ord("z"))) | \
             ((codes >= ord("A")) & (codes <= ord("Z"))) | \
             ((codes >= ord("0")) & (codes <= ord("9"))) | \
             (codes == ord(" "))
        csum = np.concatenate([[0], np.cumsum(~ok, dtype=np.int64)])
        ends = np.cumsum(lens)
        sym = (csum[ends] - csum[ends - lens]) / np.maximum(lens, 1)
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac_x1e4": pa.array(_x1e4(dup_frac), pa.int64()),
            "symbol_ratio_x1e4": pa.array(_x1e4(sym), pa.int64()),
            "bullet_ratio_x1e4": pa.array(_x1e4(bullet), pa.int64()),
        })


class RepetitionStats:
    """Word-bigram repetition signals (the Gopher-family duplicate-
    n-gram filters, Rae et al. 2021 public recipe):

    - ``n_bigrams``: adjacent word pairs in the doc (``max(0, n_tok-1)``);
    - ``dup_bigram_frac_x1e4``: fraction of bigram occurrences that are
      repeats (``1 - distinct/total``) — high on looped / spammy text;
    - ``top_bigram_frac_x1e4``: share of the single most frequent bigram.

    One split + one element-wise join + one Arrow hash aggregation per
    batch; per-doc reductions are bincount / maximum.at — no row loops.
    Exact-string bigram equality (space-joined pair), never hashes, so
    the DuckDB oracle (ord+1 self-join) matches bit-for-bit.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = batch.num_rows
        toks = pc.split_pattern(texts, pattern=" ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        m = len(flat)
        n_big = np.zeros(n, np.int64)
        n_dist = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        if m >= 2:
            same = parent[1:] == parent[:-1]
            bg = pc.binary_join_element_wise(
                flat.slice(0, m - 1), flat.slice(1), " ")
            pi = parent[:-1][same]
            bgf = bg.filter(pa.array(same))
            n_big = np.bincount(pi, minlength=n).astype(np.int64)
            grp = pa.table({"p": pa.array(pi), "bg": bgf})
            try:
                g = pa.TableGroupBy(grp, ["p", "bg"],
                                    use_threads=False).aggregate(
                    [("bg", "count")])
            except TypeError:
                g = pa.TableGroupBy(grp, ["p", "bg"]).aggregate(
                    [("bg", "count")])
            gp = g["p"].to_numpy(zero_copy_only=False)
            gc = g["bg_count"].to_numpy(zero_copy_only=False)
            n_dist = np.bincount(gp, minlength=n).astype(np.int64)
            np.maximum.at(mx, gp, gc)
        safe = np.maximum(n_big, 1).astype(np.float64)
        dup = (n_big - n_dist) / safe
        top = np.where(n_big > 0, mx / safe, 0.0)
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_bigrams": pa.array(n_big, pa.int64()),
            "dup_bigram_frac_x1e4": pa.array(_x1e4(dup), pa.int64()),
            "top_bigram_frac_x1e4": pa.array(_x1e4(top), pa.int64()),
        })


def top_terms(ds, k: int = 20, text_col: str = "text"):
    """Exact corpus-wide top-k frequent terms (vocabulary head /
    stop-word discovery): per-batch partial counts (vectorized
    value_counts — each batch contributes at most its distinct terms,
    not its token count) → uniform groupby sum → tiny driver top-k.
    Ties: count desc, token asc. Returns pa.Table (token, n)."""
    from .boilerplate import partial_aggregate

    def prepare(t: pa.Table) -> pa.Table:
        flat, _, _ = word_tokens_flat(t[text_col])
        vc = pc.value_counts(flat)
        return pa.table({
            "token": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    tbl = partial_aggregate(ds, ["token"], [("n", "sum")],
                            prepare=prepare)
    toks = np.asarray(tbl["token"].to_pylist())
    ns = tbl["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((toks, -ns))[:k]
    return pa.table({
        "token": pa.array(toks[order].tolist(), pa.string()),
        "n": pa.array(ns[order], pa.int64()),
    })


def top_bigrams(ds, k: int = 20, text_col: str = "text"):
    """Exact corpus-wide top-k frequent BIGRAMS (collocation head —
    the n-gram LM / phrase-mining counting shape): tokens flatten once
    per batch, adjacent pairs join where both tokens share a parent
    row (no cross-document bigrams), then the same partial-counts →
    tiny-merge → driver top-k plan as ``top_terms``.  Each batch ships
    at most its DISTINCT bigrams.  Ties: count desc, bigram asc."""
    from .boilerplate import partial_aggregate

    def prepare(t: pa.Table) -> pa.Table:
        flat, parent, _ = word_tokens_flat(t[text_col])
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        valid = pa.array(parent[:-1] == parent[1:])
        left = flat.slice(0, len(flat) - 1).filter(valid)
        right = flat.slice(1).filter(valid)
        bg = pc.binary_join_element_wise(left, right, " ")
        vc = pc.value_counts(bg)
        return pa.table({
            "bigram": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    tbl = partial_aggregate(ds, ["bigram"], [("n", "sum")],
                            prepare=prepare)
    if tbl is None:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    bgs = np.asarray(tbl["bigram"].to_pylist())
    ns = tbl["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bgs, -ns))[:k]
    return pa.table({
        "bigram": pa.array(bgs[order].tolist(), pa.string()),
        "n": pa.array(ns[order], pa.int64()),
    })


class MisraGries:
    """Space-saving heavy-hitters sketch (the streaming top-k analog of
    the exact groupby — ICDE'19 top-k frequent terms on streams is this
    family): at most ``capacity`` counters; any term with true count
    > n_tokens/capacity is guaranteed present; counts are within
    n_tokens/capacity of truth. Mergeable across batches/actors."""

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self.counts: dict[str, int] = {}
        self.n_tokens = 0

    def update(self, tokens: pa.Array) -> None:
        vc = pc.value_counts(tokens)
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_pylist()
        self.n_tokens += int(sum(cnts))
        for t, c in zip(vals, cnts):
            self.counts[t] = self.counts.get(t, 0) + int(c)
        if len(self.counts) > self.capacity:
            # decrement-by-median-of-excess: classic MG batch shrink
            excess = sorted(self.counts.values()
                            )[len(self.counts) - self.capacity - 1]
            self.counts = {t: c - excess for t, c in self.counts.items()
                           if c > excess}

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.capacity)
        out.n_tokens = self.n_tokens + other.n_tokens
        for src in (self.counts, other.counts):
            for t, c in src.items():
                out.counts[t] = out.counts.get(t, 0) + c
        if len(out.counts) > out.capacity:
            excess = sorted(out.counts.values()
                            )[len(out.counts) - out.capacity - 1]
            out.counts = {t: c - excess for t, c in out.counts.items()
                          if c > excess}
        return out

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(self.counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]


def top_terms_sketch(ds, k: int = 20, capacity: int = 4096,
                     text_col: str = "text") -> list[tuple[str, int]]:
    """Streaming top-k via per-batch Misra-Gries partials merged on the
    driver — one small summary per block crosses the wire, never the
    term universe. Guaranteed to contain every term with frequency
    > n_tokens/capacity."""

    def partial(t: pa.Table) -> pa.Table:
        mg = MisraGries(capacity)
        flat, _, _ = word_tokens_flat(t[text_col])
        mg.update(flat)
        # ONE row per partial summary (list columns), so summary
        # boundaries survive any downstream re-batching
        return pa.table({
            "tokens": pa.array([list(mg.counts.keys())],
                               pa.list_(pa.string())),
            "counts": pa.array([list(mg.counts.values())],
                               pa.list_(pa.int64())),
            "n_tokens": pa.array([mg.n_tokens], pa.int64()),
        })

    total = MisraGries(capacity)
    for row in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_rows()):
        mg = MisraGries(capacity)
        mg.counts = dict(zip(row["tokens"], row["counts"]))
        mg.n_tokens = int(row["n_tokens"])
        total = total.merge(mg)
    return total.top(k)


class LangId:
    """n-gram/script heuristic language ID (en/ja/de/es fallback en).

    CJK codepoint fraction decides ja; otherwise stopword-marker counts.
    Rows-only operator (no SQL oracle)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.de = pa.array(list(_DE_MARKERS), pa.string())
        self.es = pa.array(list(_ES_MARKERS), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = batch.num_rows
        flat, parent, dl = word_tokens_flat(texts)
        de_cnt = np.bincount(parent, weights=pc.is_in(
            flat, value_set=self.de).to_numpy(zero_copy_only=False
                                              ).astype(np.float64),
            minlength=n)
        es_cnt = np.bincount(parent, weights=pc.is_in(
            flat, value_set=self.es).to_numpy(zero_copy_only=False
                                              ).astype(np.float64),
            minlength=n)
        # CJK fraction per row. Pure-ASCII batches (checked zero-copy on
        # the Arrow value buffer) cannot contain CJK — skip the whole
        # re-encode. Otherwise: one UTF-32 buffer for the batch, per-row
        # segment sums via cumsum differences (no Python loop; same
        # join-then-window pattern as the trigram tokenizer).
        from ..hashing import _string_array_buffers
        data, offsets = _string_array_buffers(texts)
        ascii_only = (not texts.null_count and len(texts) and
                      not (data[offsets[0]:offsets[-1]] & 0x80).any())
        if ascii_only:
            cjk_frac = np.zeros(n, np.float64)
        else:
            py = texts.to_pylist()
            joined = "".join(s or "" for s in py)
            codes = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
            lens = np.fromiter((len(s or "") for s in py), np.int64,
                               count=n)
            cjk = ((codes >= 0x3040) & (codes <= 0x30FF)) | \
                  ((codes >= 0x4E00) & (codes <= 0x9FFF))
            csum = np.concatenate([[0], np.cumsum(cjk, dtype=np.int64)])
            ends = np.cumsum(lens)
            row_cjk = csum[ends] - csum[ends - lens]
            cjk_frac = row_cjk / np.maximum(lens, 1)
        nt = np.maximum(dl.astype(np.float64), 1.0)
        pred = np.where(cjk_frac > 0.2, "ja",
                        np.where(de_cnt / nt > 0.05, "de",
                                 np.where(es_cnt / nt > 0.08, "es", "en")))
        return pa.table({
            "doc_id": batch[self.id_col],
            "lang_pred": pa.array(pred.tolist(), pa.string()),
        })


class Decontaminate:
    """Benchmark-decontamination filter: drop (or flag) documents whose
    text contains ANY of a set of probe n-grams (exact substring — the
    standard eval-set decontamination rule for training corpora).

    The probe list is tiny (benchmark n-grams) and is captured in the
    actor state once — a broadcast small side, never re-shipped per
    batch (pass a ``ray.put`` handle + ``ray.get`` in ``__init__`` for
    very large probe sets). Matching is one vectorized RE2
    ``match_substring`` pass per probe over the whole batch column; no
    per-row Python.

    ``mode="clean"`` emits surviving rows' ids; ``mode="flag"`` emits
    (doc_id, probe_idx) per contaminated doc with the FIRST matching
    probe's index.

    Null text counts as UNCONTAMINATED (a null cannot contain a probe):
    nulls are filled to False explicitly rather than relying on
    numpy-conversion coincidence.
    """

    def __init__(self, probes: list[str], text_col: str = "text",
                 id_col: str = "doc_id", mode: str = "clean"):
        if not probes:
            raise ValueError("need at least one probe n-gram")
        if mode not in ("clean", "flag"):
            raise ValueError(mode)
        self.probes = list(probes)
        self.text_col = text_col
        self.id_col = id_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        hit_any = None
        first = np.full(batch.num_rows, -1, np.int64)
        for i, p in enumerate(self.probes):
            # match_substring propagates nulls; null text is explicitly
            # uncontaminated (documented above)
            m = pc.fill_null(pc.match_substring(col, p), False)
            mn = m.to_numpy(zero_copy_only=False).astype(bool)
            first = np.where((first < 0) & mn, i, first)
            hit_any = mn if hit_any is None else (hit_any | mn)
        ids = batch[self.id_col]
        if self.mode == "clean":
            keep = np.flatnonzero(~hit_any)
            return pa.table({self.id_col: ids.take(pa.array(keep))})
        bad = np.flatnonzero(hit_any)
        return pa.table({
            self.id_col: ids.take(pa.array(bad)),
            "probe_idx": pa.array(first[bad], pa.int64()),
        })


class RedactRegex:
    """Regex redaction (PII-scrub shape): replace every match of an RE2
    pattern in the text column with a placeholder. Arrow's
    ``replace_substring_regex`` and DuckDB's ``regexp_replace`` are both
    RE2, so the oracle runs the IDENTICAL pattern — engine and SQL agree
    byte-for-byte. One vectorized pass per batch; compiled once per
    actor (stateful map_batches stage)."""

    def __init__(self, pattern: str, replacement: str,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.pattern = pattern
        self.replacement = replacement
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(
            batch[self.text_col], pattern=self.pattern,
            replacement=self.replacement)
        return pa.table({
            self.id_col: batch[self.id_col],
            "text": red,
        })


class ChunkDocuments:
    """Sliding-window document chunking (LLM-training context packing):
    each doc becomes ``1 + max(0, ceil((len - window)/stride))`` chunks
    of ``window`` chars starting every ``stride`` chars (the final chunk
    is shorter; docs shorter than one window yield one chunk).

    Pure-ASCII batches build the whole output column with numpy index
    arithmetic on the Arrow value buffer — zero per-chunk Python (the
    copies are unavoidable since windows overlap, but they happen as one
    fancy-index gather). Non-ASCII/null batches fall back to per-chunk
    slicing (code-point windows).
    """

    def __init__(self, window: int = 256, stride: int = 192,
                 text_col: str = "text", id_col: str = "doc_id"):
        if stride <= 0 or window <= 0 or stride > window:
            raise ValueError("need 0 < stride <= window")
        self.window = window
        self.stride = stride
        self.text_col = text_col
        self.id_col = id_col

    def _n_chunks(self, lens: np.ndarray) -> np.ndarray:
        extra = np.ceil(np.maximum(lens - self.window, 0)
                        / self.stride).astype(np.int64)
        return extra + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        W, S = self.window, self.stride
        from ..hashing import _string_array_buffers
        if n and not texts.null_count:
            data, offsets = _string_array_buffers(texts)
            view_ok = not (data[offsets[0]:offsets[-1]] & 0x80).any()
        else:
            view_ok = False
        if view_ok:
            row_start = offsets[:-1]
            lens = (offsets[1:] - row_start).astype(np.int64)
            nc = self._n_chunks(lens)
            total = int(nc.sum())
            row_of = np.repeat(np.arange(n, dtype=np.int64), nc)
            first = np.repeat(np.cumsum(nc) - nc, nc)
            ordinal = np.arange(total, dtype=np.int64) - first
            cstart = ordinal * S
            clen = np.minimum(W, lens[row_of] - cstart)
            out_ends = np.cumsum(clen)
            nbytes = int(out_ends[-1]) if total else 0
            if nbytes > 2**31 - 1:
                # overlap (window > stride) inflates output; int32 string
                # offsets would silently wrap past 2 GiB — fall back to
                # the row-wise path, which builds pa.array incrementally
                view_ok = False
        if view_ok:
            abs_start = row_start[row_of] + cstart
            intra = np.arange(nbytes, dtype=np.int64) - \
                np.repeat(out_ends - clen, clen)
            buf = data[np.repeat(abs_start, clen) + intra]
            out_off = np.empty(total + 1, np.int32)
            out_off[0] = 0
            out_off[1:] = out_ends
            chunks = pa.StringArray.from_buffers(
                total, pa.py_buffer(out_off.tobytes()),
                pa.py_buffer(buf.tobytes()))
            out_ids = ids[row_of]
            out_ord = ordinal
        else:
            out_ids, out_ord, pych = [], [], []
            for did, t in zip(ids.tolist(), texts.to_pylist()):
                t = t or ""
                k = int(self._n_chunks(np.array([len(t)]))[0])
                for j in range(k):
                    out_ids.append(did)
                    out_ord.append(j)
                    pych.append(t[j * S:j * S + W])
            chunks = pa.array(pych, pa.string())
            out_ids = np.asarray(out_ids, np.int64)
            out_ord = np.asarray(out_ord, np.int64)
        return pa.table({
            self.id_col: pa.array(np.asarray(out_ids, np.int64),
                                  pa.int64()),
            "chunk_id": pa.array(np.asarray(out_ord, np.int64),
                                 pa.int64()),
            "chunk": chunks,
        })
