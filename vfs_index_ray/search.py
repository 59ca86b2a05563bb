"""Query engine: term lookup, intersection, BM25 top-k over index segments.

Maps the reference's query machinery onto the segment layout:

- key point-lookup (index_file.go:1424-1459 FindByKey + bsearch) →
  ``part = term_id % P`` pruning + Parquet row-group predicate pushdown on
  the sorted ``term_id`` column;
- posting-list AND intersection on record identity
  (search_finder.go:108-193) → sorted-uint64 ``np.intersect1d`` in
  df-ascending order (the reference's intended selectivity ordering,
  search_cond.go:688-698);
- ``Nears`` tf-share ranking (search_cond.go:297-381) → BM25 top-k, exact
  fp64 with fixed accumulation order (ascending term_id, tie-break doc_id
  asc) so results are rank-identical across parallelism levels and vs the
  single-process oracle;
- posting-result cache (cache/cache.go) → per-engine decoded-postings cache.

Three scoring paths, all exact (bit-identical results; fuzz + scale
tests assert it):
- ``exact``: decode every query term's postings, one vectorized pass;
  per-term contribution arrays are cached (query-independent), so warm
  queries only pay the accumulate + top-k.
- ``maxscore``: candidate generation via term-level upper bounds derived
  from the per-block (tf_max, dl_min) metadata, then exact rescore of
  candidates probing only the skip blocks that contain them — frequent
  terms' posting lists are mostly never decoded. Best p99.
- ``blockmax``: Block-Max-WAND-style pruning — an event sweep over every
  term's block doc-ranges finds the doc regions whose summed block upper
  bounds can beat a bootstrap threshold; only those regions are decoded
  and rescored. Measured (BASELINE.md round-2 sweep, both block-size and
  doc-order axes): the sweep itself costs more than vectorized exact
  scoring on cached lists, so ``maxscore`` is the head-term winner here.
- ``auto`` (default for the actor/service paths): ``maxscore`` for
  multi-term queries over big lists, ``exact`` otherwise — informed by
  those measurements; results are bit-identical either way.

Distributed path: ``bm25_topk_ray`` scores doc-range buckets independently
(a doc's postings for every term share its bucket), then a tiny global
sort+limit — scatter/gather with no per-doc exchange.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import BM25_B, BM25_K1
from .build import read_stats
from .codec import decode_block, decode_chunk
from .tokenizer import tokenize_query


def load_tombstones(index_dir: str) -> np.ndarray:
    """Union of all committed tombstone files (sorted-unique uint64 doc
    ids). Each file is a one-column parquet under ``tombstones/``,
    content-addressed and published tmp+rename — files are immutable
    and mergeable, so concurrent deleters and readers never conflict
    (same protocol as segment sidecars). Missing dir = no deletes."""
    d = os.path.join(index_dir, "tombstones")
    arrs = []
    if os.path.isdir(d):
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                arrs.append(pq.read_table(
                    os.path.join(d, name), use_threads=False
                )["doc_id"].to_numpy(zero_copy_only=False
                                     ).astype(np.uint64))
    arrs = [a for a in arrs if len(a)]
    if not arrs:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(arrs))


def sorted_union(arrays: list[np.ndarray]) -> np.ndarray:
    """Deduped ascending union of uint64 arrays (np.unique semantics).
    Radix sort (kind='stable' on ints) + boundary diff — 2-4x
    np.unique's quicksort on posting-sized inputs (measured). Always
    sorts; callers that know a single input is already sorted-unique
    should shortcut before calling."""
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return np.empty(0, np.uint64)
    c = np.concatenate(arrays) if len(arrays) > 1 else arrays[0].copy()
    c.sort(kind="stable")
    keep = np.empty(len(c), bool)
    keep[0] = True
    keep[1:] = c[1:] != c[:-1]
    return c[keep]


def sorted_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted-unique uint64 arrays via galloping
    membership probes of the smaller into the larger —
    O(min log max), never sorts (np.intersect1d concat-sorts both)."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0 or len(b) == 0:
        return np.empty(0, a.dtype)
    pos = np.searchsorted(b, a)
    ok = pos < len(b)
    pos = np.minimum(pos, len(b) - 1)
    ok &= b[pos] == a
    return a[ok]


def _range_scan_part(path: str, lo: int | None, hi: int | None
                     ) -> np.ndarray:
    """One partition of a key-range scan: pushdown read of the chunks in
    [lo, hi], decode, return this part's deduped ascending doc_ids."""
    filters = []
    if lo is not None:
        filters.append(("term_id", ">=", np.uint64(lo)))
    if hi is not None:
        filters.append(("term_id", "<=", np.uint64(hi)))
    from .codec import chunk_rows_columnar
    tbl = pq.read_table(path, filters=filters or None, use_threads=False)
    out = [decode_chunk(row)[0] for row in chunk_rows_columnar(tbl)]
    out = [d for d in out if len(d)]
    if not out:
        return np.empty(0, np.uint64)
    return sorted_union(out)


def _range_scan_remote():
    from .remote import remote_1cpu
    return remote_1cpu(_range_scan_part)


def _nearest_part(path: str, key: int, less: bool
                  ) -> tuple[int, int] | None:
    """Per-part nearest-key probe (SearchEngine.nearest_term body): one
    row group picked from term_id min/max statistics, two columns."""
    key_u = np.uint64(key)
    pf = pq.ParquetFile(path)
    md = pf.metadata
    ki = pf.schema_arrow.names.index("term_id")
    cand_gi = None
    ok_stats = True
    for gi in range(md.num_row_groups):
        st = md.row_group(gi).column(ki).statistics
        if st is None or not st.has_min_max:
            ok_stats = False
            break
        if less:
            if np.uint64(st.min) <= key_u:
                cand_gi = gi  # last group containing keys <= key
        else:
            if np.uint64(st.max) >= key_u:
                cand_gi = gi  # first group containing keys >= key
                break
    if ok_stats and cand_gi is None:
        return None
    if ok_stats:
        tbl = pf.read_row_groups([cand_gi], columns=["term_id", "df"],
                                 use_threads=False)
    else:  # stats unavailable: filtered full read of 2 columns
        tbl = pq.read_table(path, columns=["term_id", "df"],
                            use_threads=False)
    terms = tbl["term_id"].to_numpy(zero_copy_only=False)
    dfs = tbl["df"].to_numpy(zero_copy_only=False)
    mask = terms <= key_u if less else terms >= key_u
    if not mask.any():
        return None
    idx = np.flatnonzero(mask)
    i = idx[-1] if less else idx[0]
    return (int(terms[i]), int(dfs[i]))


def _nearest_remote():
    from .remote import remote_1cpu
    return remote_1cpu(_nearest_part)


def _phrase_chunk(index_dir: str, seq: list[int], by_df: list[int],
                  chunk_docs: np.ndarray) -> np.ndarray:
    """One candidate-doc chunk of a distributed positional phrase match
    (SearchEngine._phrase_positional_distributed): staged rare-pivot
    chain scoped to the chunk, df order precomputed by the driver."""
    eng = SearchEngine(index_dir, io_threads=False)
    return eng._phrase_positional_staged(
        seq, sorted(set(seq)), np.asarray(chunk_docs, np.uint64),
        by_df=by_df, doc_filter="range")


def _phrase_chunk_remote():
    from .remote import remote_1cpu
    return remote_1cpu(_phrase_chunk)


def _proximity_chunk(index_dir: str, tids: list[int], window: int,
                     chunk_docs: np.ndarray) -> np.ndarray:
    """One candidate-doc chunk of a distributed proximity match."""
    eng = SearchEngine(index_dir, io_threads=False)
    return eng._proximity_verify(tids, window,
                                 np.asarray(chunk_docs, np.uint64),
                                 doc_filter="range")


def _proximity_chunk_remote():
    from .remote import remote_1cpu
    return remote_1cpu(_proximity_chunk)


@dataclass
class Postings:
    """Decoded (or decodable) postings of one term."""
    term_id: int
    df: int
    chunks: list[dict]            # raw segment rows (bucket asc)
    docs: np.ndarray | None = None
    tfs: np.ndarray | None = None
    dls: np.ndarray | None = None
    scores: np.ndarray | None = None  # cached BM25 contributions (T2/T3)
    ub: float | None = None           # memoized _term_ub (engine-fixed)
    champions: np.ndarray | None = None  # memoized frontier champion docs

    def decode(self) -> "Postings":
        if self.docs is None:
            if self.chunks:
                parts = [decode_chunk(c) for c in self.chunks]
                self.docs = np.concatenate([p[0] for p in parts])
                self.tfs = np.concatenate([p[1] for p in parts])
                self.dls = np.concatenate([p[2] for p in parts])
            else:
                self.docs = np.empty(0, np.uint64)
                self.tfs = np.empty(0, np.uint64)
                self.dls = np.empty(0, np.uint64)
        return self


class SearchEngine:
    def __init__(self, index_dir: str, corpus_files=None,
                 id_col: str = "doc_id", url_col: str = "url",
                 io_threads: bool = True):
        # io_threads=False for engines constructed INSIDE Ray tasks or
        # 1-cpu actors: Arrow's default thread pool x concurrent tasks
        # oversubscribes the node (CLAUDE.md)
        self.io_threads = bool(io_threads)
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self.mode = self.stats["mode"]
        self.num_parts = self.stats["num_parts"]
        self.avgdl = float(self.stats["avgdl"]) or 1.0
        self.ndocs = int(self.stats["n_docs"])
        self.corpus_files = corpus_files
        self.id_col = id_col
        self.url_col = url_col
        self._cache: dict[int, Postings] = {}
        # per-query instrumentation (reference EnableStats/OptQueryStat,
        # search_cond.go:57-80): last_query_stats after each bm25/match
        self.last_query_stats: dict = {}
        self.last_fetch_stats: dict = {}
        self._blooms: dict[int, bytes | None] = {}  # per-part term bloom
        self.last_load_stats: dict = {}
        # doc-level tombstones (delete_docs): result-set APIs filter
        # against this sorted set; merge.purge_tombstones rewrites the
        # segments without the deleted docs and drops the set
        self.tombstones = load_tombstones(index_dir)
        self._tomb_filtered: dict[int, Postings] = {}

    # ------------------------------------------------------------------
    def _segment_file(self, part: int) -> str:
        return os.path.join(self.index_dir, "segments",
                            f"part={part:05d}.parquet")

    def _bloom(self, part: int) -> bytes | None:
        """Lazy-load the part's term bloom filter (None if absent —
        older indexes have no bloom files)."""
        if part not in self._blooms:
            path = os.path.join(self.index_dir, "segments",
                                f"part={part:05d}.bloom")
            try:
                with open(path, "rb") as f:
                    self._blooms[part] = f.read()
            except OSError:
                self._blooms[part] = None
        return self._blooms[part]

    def load_terms(self, term_ids: list[int]) -> dict[int, Postings]:
        """Fetch raw segment rows for the given terms (part-pruned +
        row-group-pushdown read), with per-engine caching. Terms the
        part's bloom filter rules out short-circuit to df=0 without
        touching the segment file (negative-lookup fast path)."""
        from .codec import bloom_test
        missing: dict[int, list[int]] = {}
        bloom_skips = 0
        for tid in term_ids:
            if tid not in self._cache:
                missing.setdefault(tid % self.num_parts, []).append(tid)
        for part in list(missing):
            bloom = self._bloom(part)
            if bloom is None:
                continue
            tids = missing[part]
            maybe = bloom_test(bloom, np.array(tids, np.uint64))
            for tid, ok in zip(tids, maybe):
                if not ok:  # definitely absent: no parquet read
                    self._cache[tid] = Postings(tid, 0, [])
                    bloom_skips += 1
            kept = [t for t, ok in zip(tids, maybe) if ok]
            if kept:
                missing[part] = kept
            else:
                del missing[part]
        self.last_load_stats = {"parts_read": len(missing),
                                "bloom_skips": bloom_skips}
        for part, tids in missing.items():
            path = self._segment_file(part)
            if not os.path.exists(path):
                # 'term absent' is an empty pushdown read on an existing
                # part file; a MISSING part file means the index is
                # truncated (e.g. mid-absorb segment invalidation, partial
                # copy) — silently answering df=0 would return wrong
                # results from an index whose stats.json claims coverage
                raise RuntimeError(
                    f"index partition file missing: {path} (stats.json "
                    f"claims num_parts={self.num_parts}); the index is "
                    "truncated or mid-rebuild")
            tbl = pq.read_table(
                path, filters=[("term_id", "in", [np.uint64(t) for t in tids])],
                use_threads=self.io_threads)
            from .codec import chunk_rows_columnar
            rows_by_term: dict[int, list[dict]] = {t: [] for t in tids}
            for row in chunk_rows_columnar(tbl):  # numpy views, no boxing
                rows_by_term[int(row["term_id"])].append(row)
            for tid in tids:
                rows = rows_by_term[tid]
                df = int(rows[0]["df"]) if rows else 0
                self._cache[tid] = Postings(tid, df, rows)
        return {tid: self._cache[tid] for tid in term_ids}

    # ------------------------------------------------------------------
    # doc-level deletes (tombstones). The reference has no delete story
    # (merge assumes doc-disjoint sources, merged_index_file.go:272-456);
    # a 100 TB corpus needs takedowns, so this is extension surface.
    # Semantics (Lucene's deleted-docs model): result-set APIs — match/
    # count, bm25, nears, phrase_match[,_positional], proximity_match,
    # term_range_docs, fetch_rows — never return a deleted doc, effective
    # immediately and on every engine opened afterwards. Corpus
    # STATISTICS stay stale until merge.purge_tombstones physically
    # rewrites the segments: df/select/cooccur_distance/stats.json still
    # count deleted docs, and BM25 scores survivors with the stored
    # (df, avgdl, N) — identical scores to pre-delete, minus the dead
    # docs. With tombstones present bm25 forces the exact path: the
    # pruned paths bootstrap thresholds from champion docs that may be
    # deleted, which could over-prune live results.
    def delete_docs(self, doc_ids) -> int:
        """Tombstone the given doc ids. Commit is tmp + rename of a
        content-addressed parquet under ``tombstones/`` — idempotent
        (same set → same file), crash-safe, and mergeable (readers union
        all files; concurrent deleters never conflict). Returns how many
        ids were newly deleted."""
        import hashlib
        ids = np.unique(np.asarray(doc_ids, np.uint64))
        if len(ids) == 0:
            return 0
        if len(self.tombstones):
            pos = np.minimum(np.searchsorted(self.tombstones, ids),
                             len(self.tombstones) - 1)
            new = ids[self.tombstones[pos] != ids]
        else:
            new = ids
        if len(new) == 0:
            return 0
        d = os.path.join(self.index_dir, "tombstones")
        os.makedirs(d, exist_ok=True)
        tag = hashlib.sha1(ids.tobytes()).hexdigest()[:12]
        final = os.path.join(d, f"del-{tag}.parquet")
        if not os.path.exists(final):
            tmp = os.path.join(d, f".tmp.del-{tag}.parquet")
            pq.write_table(pa.table({"doc_id": pa.array(ids, pa.uint64())}),
                           tmp)
            os.replace(tmp, final)
        self.tombstones = np.union1d(self.tombstones, new)
        self._tomb_filtered.clear()
        return int(len(new))

    def _live(self, docs: np.ndarray) -> np.ndarray:
        """Drop tombstoned ids from a doc array (any order)."""
        tomb = self.tombstones
        if not len(tomb) or not len(docs):
            return docs
        pos = np.minimum(np.searchsorted(tomb, docs), len(tomb) - 1)
        return docs[tomb[pos] != docs]

    def _live_postings(self, p: Postings) -> Postings:
        """Per-term postings with tombstoned docs masked out; ``df``
        deliberately stays the STORED value (stale-statistics scoring —
        survivors score identically to pre-delete). Cached per term,
        invalidated by delete_docs."""
        got = self._tomb_filtered.get(p.term_id)
        if got is not None:
            return got
        p = p.decode()
        tomb = self.tombstones
        pos = np.minimum(np.searchsorted(tomb, p.docs),
                         max(len(tomb) - 1, 0))
        keep = tomb[pos] != p.docs if len(tomb) else \
            np.ones(len(p.docs), bool)
        q = Postings(p.term_id, p.df, [], docs=p.docs[keep],
                     tfs=p.tfs[keep], dls=p.dls[keep])
        self._tomb_filtered[p.term_id] = q
        return q

    # ------------------------------------------------------------------
    def query_term_ids(self, q: str) -> list[int]:
        return [tid for _, tid in tokenize_query(q, self.mode)]

    def df(self, q: str) -> dict[str, int]:
        """df per query token (A2/A3 CountOfKey analog)."""
        pairs = tokenize_query(q, self.mode)
        loaded = self.load_terms([tid for _, tid in pairs])
        return {tok: loaded[tid].df for tok, tid in pairs}

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.ndocs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------------
    def match(self, q: str) -> np.ndarray:
        """AND over query terms → ascending doc_ids (J3/J4 analog)."""
        tids = self.query_term_ids(q)
        if not tids:
            return np.empty(0, np.uint64)
        loaded = self.load_terms(tids)
        # df-ascending order: cheapest list first, early-exit on empty
        order = sorted(set(tids), key=lambda t: (loaded[t].df, t))
        out = loaded[order[0]].decode().docs
        for tid in order[1:]:
            if len(out) == 0:
                break
            big = loaded[tid].decode().docs
            # galloping membership: O(|out| log |big|) — with
            # df-ascending order |out| only shrinks, so a rare∧head AND
            # never sorts or scans the head list (intersect1d would)
            pos = np.searchsorted(big, out)
            ok = pos < len(big)
            pos = np.minimum(pos, max(len(big) - 1, 0))
            if len(big):
                ok &= big[pos] == out
            out = out[ok]
        return self._live(out)

    def count(self, q: str) -> int:
        return int(len(self.match(q)))

    def min_should_match(self, q: str, m: int = 2
                         ) -> tuple[np.ndarray, np.ndarray]:
        """OR-retrieval with a term-overlap threshold — 'match at
        least ``m`` of the query terms' (the minimum_should_match
        relaxation between AND (``match``) and pure OR): posting lists
        for the distinct query terms are concatenated and the per-doc
        multiplicity comes from ONE sort + boundary diff (never
        np.unique — the lists are already sorted).  Returns
        (ascending live doc_ids, n_matched per doc).  Reference
        analog: query.go only has AND; this is the standard IR
        relaxation over the same postings."""
        tids = sorted(set(self.query_term_ids(q)))
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64))
        if not tids:
            return empty
        loaded = self.load_terms(tids)
        arrs = [loaded[t].decode().docs for t in tids]
        arrs = [a for a in arrs if len(a)]
        if not arrs:
            return empty
        alld = np.concatenate(arrs)
        alld.sort(kind="stable")
        starts = np.flatnonzero(
            np.concatenate([[True], alld[1:] != alld[:-1]]))
        counts = np.diff(np.append(starts, len(alld)))
        docs = alld[starts]
        keep = counts >= m
        docs, counts = docs[keep], counts[keep]
        tomb = self.tombstones
        if len(tomb) and len(docs):
            pos = np.minimum(np.searchsorted(tomb, docs),
                             len(tomb) - 1)
            live = tomb[pos] != docs
            docs, counts = docs[live], counts[live]
        return docs, counts.astype(np.int64)

    # ------------------------------------------------------------------
    def _term_score(self, tf: np.ndarray, dl: np.ndarray, df: int) -> np.ndarray:
        # grouping matches the oracle exactly: idf * (tf*(k1+1) / denom)
        tf = tf.astype(np.float64)
        dl = dl.astype(np.float64)
        tfn = tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
        return self.idf(df) * tfn

    @staticmethod
    def _topk(docs: np.ndarray, scores: np.ndarray, k: int):
        """score desc, doc_id asc — deterministic."""
        if len(docs) > max(k * 4, 64) and k < len(docs):
            # narrow with a partition first (ties kept), then exact-sort
            cut = np.partition(-scores, k)[k]  # (k+1)-th best, negated
            keep = np.flatnonzero(-scores <= cut)
            docs, scores = docs[keep], scores[keep]
        order = np.lexsort((docs, -scores))[:k]
        return docs[order], scores[order]

    def bm25(self, q: str, k: int = 10, method: str = "exact",
             search_after: tuple[float, int] | None = None):
        """Top-k BM25, OR semantics. Returns (doc_ids, scores).

        ``search_after=(score, doc_id)`` is the stateless deep-
        pagination cursor (the last hit of the previous page): only
        results strictly AFTER it in ``(score desc, doc_id asc)``
        order qualify, so page N+1 never re-ships or re-ranks pages
        1..N and the cost of page depth is O(1) — unlike
        offset-pagination, which re-materializes every prior page.
        Cursor requests pin the exact scoring path: both pruned paths
        (MaxScore/blockmax) keep only k candidates above their bound
        θ, which is the wrong bound under a cursor (the θ-seeded
        cursor variant — bootstrap θ from the cursor score — is the
        disk-resident-list optimization; exact keeps pagination fp64
        rank-identical to a single deep top-k)."""
        import time
        t0 = time.perf_counter()
        tids = sorted(set(self.query_term_ids(q)))  # ascending accumulation
        if not tids or not self.ndocs:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        loaded = self.load_terms(tids)
        tids = [t for t in tids if loaded[t].df > 0]
        if not tids:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        if len(self.tombstones):
            # deletes are visible immediately: score live-filtered
            # postings on the exact path (see delete_docs semantics)
            loaded = {t: self._live_postings(loaded[t]) for t in tids}
            method = "exact"
        if search_after is not None:
            method = "exact"  # see docstring: cursor pins exact
        if method == "auto":
            # measured (BASELINE.md block-size sweep): MaxScore wins on
            # multi-term queries with big lists (term-level pruning, no
            # sweep); exact wins when everything is small/cached
            total_df = sum(loaded[t].df for t in tids)
            method = "maxscore" if (len(tids) > 1 and
                                    total_df > 65536) else "exact"
        if method == "maxscore" and len(tids) > 1:
            out = self._bm25_maxscore(tids, loaded, k)
        elif method == "blockmax":
            out = self._bm25_blockmax(tids, loaded, k)
        else:
            out = self._bm25_exact(tids, loaded, k,
                                   search_after=search_after)
        self.last_query_stats = {
            "query": q, "method": method, "k": k,
            "n_terms": len(tids),
            "total_df": int(sum(loaded[t].df for t in tids)),
            "n_decoded": int(sum(len(loaded[t].docs)
                                 for t in tids
                                 if loaded[t].docs is not None)),
            "ms": round((time.perf_counter() - t0) * 1e3, 3),
        }
        return out

    def explain(self, q: str, k: int = 10, method: str = "auto") -> dict:
        """Run the query and return its execution profile (reference
        EnableStats/OptQueryStat parity, search_cond.go:57-80): resolved
        method, per-term dfs, postings decoded, parts read vs bloom-
        skipped, wall time."""
        self.bm25(q, k, method)
        out = dict(self.last_query_stats)
        out.update({f"load_{k_}": v
                    for k_, v in self.last_load_stats.items()})
        pairs = tokenize_query(q, self.mode)
        loaded = self.load_terms([tid for _, tid in pairs])
        out["terms"] = {tok: loaded[tid].df for tok, tid in pairs}
        return out

    def bm25_scores_for(self, q: str, doc_ids) -> tuple[np.ndarray,
                                                        np.ndarray]:
        """Exact BM25 scores of SPECIFIC documents — the random-access
        scoring primitive rank fusion needs (fielded_bm25's threshold
        algorithm).  Decodes only the skip blocks that can contain the
        targets (the J2/J4 point-probe path, never the full lists) and
        accumulates per term in ascending term_id order with the same
        sequential fp64 additions as the full scorer, so a doc's score
        here is bit-identical to its score in ``bm25``.  Tombstoned
        docs score 0.  Returns (sorted-unique doc_ids, scores)."""
        targets = np.unique(np.asarray(doc_ids, np.uint64))
        scores = np.zeros(len(targets), np.float64)
        if len(targets) == 0 or not self.ndocs:
            return targets, scores
        tids = sorted(set(self.query_term_ids(q)))
        if not tids:
            return targets, scores
        loaded = self.load_terms(tids)
        for t in tids:  # ascending term_id: oracle-parity accumulation
            p = loaded[t]
            if p.df == 0:
                continue
            tf, dl, hit = self._probe_blocks(p, targets)
            if hit.any():
                scores[hit] += self._term_score(
                    tf[hit], np.maximum(dl[hit], 1), p.df)
        if len(self.tombstones):
            pos = np.minimum(np.searchsorted(self.tombstones, targets),
                             len(self.tombstones) - 1)
            dead = self.tombstones[pos] == targets
            scores[dead] = 0.0
        return targets, scores

    def weighted_or(self, weights: dict[str, int], k: int = 10,
                    exclude=None):
        """Integer-weighted disjunctive top-k — the more-like-this
        scoring core: each doc scores the SUM of the weights of the
        query tokens it contains (distinct-token semantics: a token
        counts once per doc regardless of tf).  Weights are int64 so
        accumulation order is irrelevant and the result is bit-exact
        vs a SQL transcription — no fp ordering contract needed.
        ``exclude`` drops seed doc ids from the result; tombstoned
        docs are filtered like every other query path.  Reference
        analog: the A7 tf-scoring union, with caller-supplied integer
        impacts instead of BM25 (search_cond.go query union shape).
        Returns (doc_ids asc-by-rank, scores) with (score desc,
        doc_id asc) ties."""
        pairs = tokenize_query(" ".join(sorted(weights)), self.mode)
        tok2tid = {tok: tid for tok, tid in pairs}
        items = sorted({(tok2tid[t], int(w))
                        for t, w in weights.items() if t in tok2tid})
        loaded = self.load_terms([tid for tid, _ in items])
        ps = [(loaded[tid].decode(), w) for tid, w in items
              if loaded[tid].df > 0]
        if not ps:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        docs_all = sorted_union([p.docs for p, _ in ps])
        scores = np.zeros(len(docs_all), np.int64)
        for p, w in ps:
            pos = np.searchsorted(docs_all, p.docs)
            scores[pos] += w
        drop = np.asarray(sorted(exclude), np.uint64) \
            if exclude else np.empty(0, np.uint64)
        if len(self.tombstones):
            drop = np.union1d(drop, self.tombstones.astype(np.uint64))
        if len(drop) and len(docs_all):
            pos = np.minimum(np.searchsorted(drop, docs_all),
                             len(drop) - 1)
            keep = drop[pos] != docs_all
            docs_all, scores = docs_all[keep], scores[keep]
        return self._topk(docs_all, scores, k)

    def index_stats(self) -> dict:
        """Corpus-level statistics from segment METADATA columns alone
        (no postings decode): distinct indexed terms (term-hash
        partitioning keeps every term's chunk rows in exactly one
        part, so per-part distinct counts sum), total postings (sum of
        per-chunk dfs = distinct (term, doc) pairs), plus the build's
        audited n_docs / total_tokens from stats.json.  Reads only the
        (term_id, df) columns — cost scales with vocabulary size, not
        corpus size.  Reports STORED statistics: deletes are
        stale-stats by design (see delete_docs) until a physical
        purge rewrites the segments.  Reference analog: the countBy
        metadata the Go engine keeps per index file (A2/A3), lifted to
        whole-corpus totals."""
        n_terms = 0
        n_postings = 0
        for part in range(self.num_parts):
            path = os.path.join(self.index_dir, "segments",
                                f"part={part:05d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=["term_id", "df"],
                              use_threads=False)
            tid = t["term_id"].to_numpy(zero_copy_only=False)
            if len(tid):
                # segment rows are lexsorted by term_id (commit
                # invariant): boundary diff, never np.unique
                n_terms += int(1 + np.count_nonzero(tid[1:] != tid[:-1]))
            n_postings += int(t["df"].to_numpy(
                zero_copy_only=False).astype(np.int64).sum())
        return {"n_docs": self.ndocs, "n_terms": n_terms,
                "n_postings": n_postings,
                "total_tokens": int(self.stats["total_tokens"])}

    def _bm25_exact(self, tids, loaded, k, search_after=None):
        # accumulate term-by-term in ascending term_id order: each doc's
        # score is built by the same sequential fp64 additions as the
        # oracle (np.add.reduceat would sum pairwise — NOT order-exact)
        ps = [loaded[t].decode() for t in tids]
        for p in ps:  # per-term contribution arrays are query-independent
            if p.scores is None:
                p.scores = self._term_score(p.tfs, p.dls, p.df)
        if len(ps) == 1:
            docs_all = ps[0].docs
        else:
            docs_all = sorted_union([p.docs for p in ps])
        scores = np.zeros(len(docs_all), np.float64)
        for p in ps:  # ascending term_id
            pos = np.searchsorted(docs_all, p.docs)
            scores[pos] += p.scores
        if search_after is not None:
            cs = float(search_after[0])
            cd = np.uint64(search_after[1])
            keep = (scores < cs) | ((scores == cs) & (docs_all > cd))
            docs_all, scores = docs_all[keep], scores[keep]
        return self._topk(docs_all, scores, k)

    # --- MaxScore candidate generation + exact rescore -----------------
    def _term_ub(self, p: Postings) -> float:
        """Upper bound of this term's contribution. Chunks carrying an
        impact frontier (codec.py imp_tf/imp_dl: per-distinct-tf min dl)
        get the EXACT max single-posting contribution below the tf cap —
        strictly tighter than the global (tf_max, dl_min) pairing, which
        combines a max tf and a min dl that usually belong to different
        docs. Frontier-less (small/old) chunks fall back to block
        metadata. Memoized on the Postings object (avgdl/df are fixed
        per engine, and the cache is per engine)."""
        if p.ub is not None:
            return p.ub
        ub = 0.0
        for c in p.chunks:
            itf = c.get("imp_tf")
            if itf is not None and len(itf):
                idl = np.maximum(np.asarray(c["imp_dl"], np.uint64), 1)
                ub = max(ub, float(self._term_score(
                    np.asarray(itf, np.uint64), idl, p.df).max()))
                continue
            tf_max = max(c["block_tf_max"]) if len(c["block_tf_max"]) else 0
            dl_min = min(c["block_dl_min"]) if len(c["block_dl_min"]) else 1
            if tf_max:
                ub = max(ub, float(self._term_score(
                    np.array([tf_max], np.uint64),
                    np.array([max(dl_min, 1)], np.uint64), p.df)[0]))
        p.ub = ub
        return ub

    def _probe_blocks(self, p: Postings, targets: np.ndarray):
        """tf/dl for ``targets`` (sorted doc ids) in term ``p``, decoding
        only the skip blocks that can contain them (J2/J4 point-probe)."""
        tf_out = np.zeros(len(targets), np.uint64)
        dl_out = np.ones(len(targets), np.uint64)
        hit = np.zeros(len(targets), bool)
        for c in p.chunks:
            lasts = np.asarray(c["skip_doc_last"], np.uint64)
            if len(lasts) == 0:
                continue
            blk = np.searchsorted(lasts, targets)  # candidate block per target
            valid = blk < len(lasts)
            for bi in np.unique(blk[valid]):
                sel = np.flatnonzero(valid & (blk == bi))
                bd, bt, bl = decode_block(c, int(bi))
                pos = np.searchsorted(bd, targets[sel])
                ok = (pos < len(bd))
                pos2 = np.minimum(pos, len(bd) - 1)
                ok &= bd[pos2] == targets[sel]
                found = sel[ok]
                tf_out[found] = bt[pos2[ok]]
                dl_out[found] = bl[pos2[ok]]
                hit[found] = True
        return tf_out, dl_out, hit

    def _bootstrap_theta(self, tids, loaded, k, max_blocks: int = 4):
        """Champion-block θ bootstrap (the impact-ordering payoff without
        an index-format change): exact-score a tiny set of docs drawn
        from each term's highest-upper-bound skip blocks (and the top
        cached contributions of already-decoded terms). The kth best of
        these EXACT scores is a valid lower bound on the final kth-best
        score, so MaxScore phase 1 starts with a tight θ and can stop
        decoding head terms early. Returns (boot_docs, theta) or
        (None, -inf) when there aren't k docs to bound with — any real
        docs give a valid bound, so correctness never depends on which
        blocks are picked."""
        from .codec import decode_block
        cands = []
        blocks: list[tuple[float, dict, int]] = []
        for t in tids:
            p = loaded[t]
            if p.docs is not None:
                if len(p.docs) == 0:
                    continue
                if p.scores is None:
                    p.scores = self._term_score(p.tfs, p.dls, p.df)
                m = min(32, len(p.scores))
                idx = np.argpartition(-p.scores, m - 1)[:m]
                cands.append(p.docs[idx])
                continue
            if p.champions is not None:
                cands.append(p.champions)
                continue
            champ = []
            for c in p.chunks:
                idoc = c.get("imp_doc")
                if idoc is not None and len(idoc):
                    # impact frontier: the chunk's top-contribution docs
                    # are stored — no block decode at all (frontier bins
                    # below the cap ARE real postings, so these are the
                    # chunk's true champions for the query-time avgdl)
                    itf = np.asarray(c["imp_tf"], np.uint64)
                    idl = np.maximum(np.asarray(c["imp_dl"], np.uint64), 1)
                    contrib = self._term_score(itf, idl, p.df)
                    top = (np.argsort(-contrib)[:4] if len(contrib) > 4
                           else slice(None))
                    champ.append(np.asarray(idoc, np.uint64)[top])
                    continue
                if len(c["skip_doc_last"]) == 0:
                    continue
                tf_max = np.asarray(c["block_tf_max"], np.uint64)
                dl_min = np.maximum(
                    np.asarray(c["block_dl_min"], np.uint64), 1)
                ub = self._term_score(tf_max, dl_min, p.df)
                for bi in np.argsort(-ub)[:2]:
                    blocks.append((float(ub[bi]), c, int(bi)))
            if champ:
                p.champions = np.concatenate(champ)
                cands.append(p.champions)
        blocks.sort(key=lambda x: -x[0])
        for _, c, bi in blocks[:max_blocks]:
            d, _, _ = decode_block(c, bi)
            cands.append(d)
        if not cands:
            return None, -np.inf
        boot = sorted_union(cands)
        if len(boot) < k:
            return None, -np.inf
        scores = self._score_targets(tids, loaded, boot)
        theta = float(np.partition(scores, len(scores) - k)[-k])
        return boot, theta

    def _bm25_maxscore(self, tids, loaded, k):
        ubs = {t: self._term_ub(loaded[t]) for t in tids}
        by_ub = sorted(tids, key=lambda t: (-ubs[t], t))
        suffix = np.cumsum([ubs[t] for t in by_ub][::-1])[::-1]
        boot_docs, theta = self._bootstrap_theta(tids, loaded, k)
        # phase 1: accumulate partial scores term-by-term (ub desc) until
        # the remaining suffix bound can't reach the current kth best
        # (θ starts at the champion-block bootstrap, so head terms after
        # the first are often never decoded at all)
        cand_docs = np.empty(0, np.uint64)
        cand_part = np.empty(0, np.float64)
        decoded: set[int] = set()
        eps = 1e-9  # partial sums are pairwise-accumulated; guard ulp noise
        for i, tid in enumerate(by_ub):
            if i > 0 and suffix[i] < theta - eps and \
                    (len(cand_docs) >= k or boot_docs is not None):
                break
            p = loaded[tid].decode()
            decoded.add(tid)
            s = self._term_score(p.tfs, p.dls, p.df)
            docs = np.concatenate([cand_docs, p.docs])
            part = np.concatenate([cand_part, s])
            order = np.argsort(docs, kind="stable")
            d, v = docs[order], part[order]
            new = np.empty(len(d), bool)
            new[0] = True
            new[1:] = d[1:] != d[:-1]
            st = np.flatnonzero(new)
            cand_docs = d[st]
            cand_part = np.add.reduceat(v, st)
            if len(cand_docs) >= k:
                theta = max(theta, float(np.partition(
                    cand_part, len(cand_part) - k)[-k]))
        # phase 2: exact rescore of candidates — probe undecoded terms'
        # blocks; then recompute every candidate's score from scratch in
        # ascending-term order (bit-identical to the exact path)
        # prune candidates that cannot reach theta even with all skipped ubs
        skipped = [t for t in tids if t not in decoded]
        max_extra = float(np.sum([ubs[t] for t in skipped])) if skipped else 0.0
        if len(cand_docs) > k:
            keep = cand_part + max_extra >= theta - eps
            cand_docs = cand_docs[keep]
        if boot_docs is not None:
            # the θ witnesses must stay candidates (they may BE the top-k)
            cand_docs = np.union1d(cand_docs, boot_docs)
        targets = np.sort(cand_docs)
        per_term = []
        for tid in tids:  # ascending
            p = loaded[tid]
            # probe-vs-decode cost rule: block probes pay off only when
            # the candidate set is much smaller than the posting list
            # (flat score distributions leave pruning ineffective — then
            # a full vectorized decode beats per-block probing)
            if tid not in decoded and p.docs is None and \
                    len(targets) * 4 >= p.df:
                p.decode()
            if tid in decoded or p.docs is not None:
                p.decode()
                pos = np.searchsorted(p.docs, targets)
                ok = pos < len(p.docs)
                pos2 = np.minimum(pos, max(len(p.docs) - 1, 0))
                if len(p.docs):
                    ok &= p.docs[pos2] == targets
                tf = np.where(ok, p.tfs[pos2] if len(p.docs) else 0, 0)
                dl = np.where(ok, p.dls[pos2] if len(p.docs) else 1, 1)
            else:
                tf, dl, ok = self._probe_blocks(p, targets)
            per_term.append((tf.astype(np.uint64), dl.astype(np.uint64),
                             ok, p.df))
        scores = np.zeros(len(targets), np.float64)
        for tf, dl, ok, df in per_term:  # ascending term order, like exact
            contrib = np.zeros(len(targets), np.float64)
            nz = ok & (tf > 0)
            if nz.any():
                contrib[nz] = self._term_score(tf[nz], dl[nz], df)
            scores = np.where(nz, scores + contrib, scores)
        return self._topk(targets, scores, k)

    # ------------------------------------------------------------------
    def phrase_match(self, phrase: str, text_col: str = "text"
                     ) -> np.ndarray:
        """Exact phrase search: AND of the phrase's index keys gives
        candidates (the reference's trigram-AND pattern), then the small
        candidate set is verified by a vectorized substring check on the
        corpus text. The reference skips verification and can
        false-positive across token boundaries (e.g. two trigrams from
        different positions) — we verify, documented divergence.
        Semantics: all tokens present AND lower(text) contains the
        lowercased phrase as a substring."""
        cands = self.match(phrase)
        if len(cands) == 0 or self.corpus_files is None:
            return cands
        rows = self.fetch_rows(cands, columns=[self.id_col, self.url_col,
                                               text_col])
        texts = rows[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        needle = phrase.lower() if self.mode == "word" else phrase
        hay = pc.utf8_lower(texts) if self.mode == "word" else texts
        ok = pc.match_substring(hay, pattern=needle
                                ).to_numpy(zero_copy_only=False)
        if self.id_col in rows.column_names:
            ids = rows[self.id_col].to_numpy(zero_copy_only=False
                                             ).astype(np.uint64)
        else:
            from .hashing import doc_ids_from_urls
            col = rows[self.url_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ids = doc_ids_from_urls(col)
        return np.sort(ids[ok])

    # ------------------------------------------------------------------
    def positions_flat(self, term_ids: list[int], docs: np.ndarray,
                       doc_filter: str = "in"
                       ) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """Flat positional postings for candidate docs: per term, a
        (doc_rep, ordinal) pair of aligned arrays sorted by (doc,
        ordinal). ALL varint decoding happens in one vectorized pass per
        part (concatenated buffer + per-row cumsum restart — the same
        trick as the block codec); no per-(term,doc) Python loop."""
        from .codec import varint_decode
        if not self.stats.get("positions"):
            raise ValueError("index was built without positions=True")
        doc_set = np.sort(np.asarray(docs, np.uint64))
        out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        by_part: dict[int, list[int]] = {}
        for tid in term_ids:
            by_part.setdefault(tid % self.num_parts, []).append(tid)
        e = np.empty(0, np.uint64)
        for part, tids in by_part.items():
            path = os.path.join(self.index_dir, "positions",
                                f"part={part:05d}.parquet")
            if not os.path.exists(path):
                continue
            filters = [("term_id", "in", [np.uint64(t) for t in tids])]
            if len(doc_set) > 0 and doc_filter == "range":
                # contiguous candidate chunk (the distributed pure-head
                # fan-out): a min/max range predicate gives the same
                # row-group pruning as an in-list for a dense span but
                # is O(1) to evaluate per row instead of a set probe
                # over thousands of members; exact membership is
                # re-applied via the searchsorted pass below
                filters.append(("doc_id", ">=", doc_set[0]))
                filters.append(("doc_id", "<=", doc_set[-1]))
            elif 0 < len(doc_set) <= 8192:
                # small SCATTERED candidate set (e.g. rare∧head
                # phrase): push the doc ids down — rows are (term,
                # doc)-sorted, so row groups of a head term's span
                # prune on doc statistics instead of decoding its
                # whole positional list
                filters.append(("doc_id", "in", list(doc_set)))  # keep
                # np.uint64 scalars: plain ints > 2^63 overflow isin
            tbl = pq.read_table(path, filters=filters, use_threads=False)
            t = tbl["term_id"].to_numpy(zero_copy_only=False)
            d = tbl["doc_id"].to_numpy(zero_copy_only=False)
            if len(doc_set) == 0 or len(d) == 0:
                continue
            pos_in = np.minimum(np.searchsorted(doc_set, d),
                                len(doc_set) - 1)
            keep = np.flatnonzero(doc_set[pos_in] == d)
            if len(keep) == 0:
                continue
            pos_col = tbl["pos"]
            if isinstance(pos_col, pa.ChunkedArray):
                pos_col = pos_col.combine_chunks()
            if pos_col.offset:  # raw-buffer math assumes offset 0
                pos_col = pa.concat_arrays([pos_col])
            offs = np.frombuffer(pos_col.buffers()[1], np.int64,
                                 count=len(pos_col) + 1)
            data = np.frombuffer(pos_col.buffers()[2] or b"", np.uint8)
            starts, ends = offs[keep], offs[keep + 1]
            lens = ends - starts
            total = int(lens.sum())
            if total == 0:
                continue
            if (lens == 0).any():
                # a kept row with an empty pos buffer would corrupt the
                # ce[cumsum(lens)-1] count recovery below for EVERY row;
                # the builder never emits one — fail loudly, not silently
                raise ValueError(
                    "malformed positional index: empty pos buffer for a "
                    f"kept (term, doc) row in {path}")
            # vectorized multi-slice gather of the kept rows' buffers
            v0 = np.concatenate([[0], np.cumsum(lens)[:-1]])
            idx = np.repeat(starts - v0, lens) + np.arange(total)
            buf = data[idx]
            flat = varint_decode(buf)
            is_end = (buf & 0x80) == 0
            ce = np.cumsum(is_end)
            counts = np.diff(np.concatenate(
                [[0], ce[np.cumsum(lens) - 1]]))
            # per-row cumsum restart (first value of each row absolute)
            ords = np.cumsum(flat, dtype=np.uint64)
            vstarts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            prefix = np.where(vstarts > 0, ords[vstarts - 1], 0
                              ).astype(np.uint64)
            ords = ords - np.repeat(prefix, counts)
            doc_rep = np.repeat(d[keep], counts).astype(np.uint64)
            term_rep = np.repeat(t[keep], counts)
            # rows are sorted (term, doc) → contiguous per-term runs
            bnd = np.flatnonzero(np.concatenate(
                [[True], term_rep[1:] != term_rep[:-1]]))
            ends_v = np.append(bnd[1:], len(term_rep))
            for s0, e0 in zip(bnd, ends_v):
                out[int(term_rep[s0])] = (doc_rep[s0:e0], ords[s0:e0])
        for tid in term_ids:
            out.setdefault(tid, (e, e.copy()))
        return out

    def _position_keys(self, flat_pair, cand_sorted: np.ndarray
                       ) -> np.ndarray:
        """(doc, ordinal) → packed uint64 key: candidate index << 32 |
        ordinal. Ordinals are token positions (< 2^32 for any real doc),
        so +1 arithmetic stays inside the doc."""
        dr, orr = flat_pair
        if len(dr) == 0:
            return np.empty(0, np.uint64)
        ci = np.searchsorted(cand_sorted, dr).astype(np.uint64)
        return (ci << np.uint64(32)) | orr

    def phrase_match_positional(self, phrase: str) -> np.ndarray:
        """Token-adjacency phrase matching from positional postings — no
        corpus access (the proper IR semantics: the exact token sequence
        appears, regardless of the separators between tokens)."""
        # key sequence WITH duplicates, in order (dedup would break
        # repeated keys). Word mode: token hashes; trigram mode: packed
        # trigram windows — chaining consecutive windows makes the
        # trigram AND *exact* (the reference's unverified AND can
        # false-positive on scattered trigrams)
        if self.mode == "trigram":
            from .tokenizer import pack_trigram
            seq = pack_trigram(phrase)
        else:
            import re

            from .hashing import fnv1a64
            from .tokenizer import WORD_SPLIT
            seq = [fnv1a64(tok)
                   for tok in re.split(WORD_SPLIT, phrase.lower()) if tok]
        if not seq:
            return np.empty(0, np.uint64)
        cands = self.match(phrase)
        if len(cands) == 0:
            return cands
        cand_sorted = np.sort(np.asarray(cands, np.uint64))
        uniq = sorted(set(seq))
        if len(cand_sorted) > self.phrase_stage_threshold and len(uniq) > 1:
            # pure-head phrase: too many candidates for the positional
            # read to push doc filters down. With Ray up, split the
            # candidates into ≤threshold contiguous doc chunks and run
            # the staged chain per chunk as parallel tasks (pushdown
            # re-engages for EVERY term in every chunk, and the
            # decode+intersect parallelizes); else switch to serial
            # rare-pivot chaining (one term at a time, df-ascending,
            # each fetch scoped to the docs still alive)
            use_dist = self.phrase_distributed
            if use_dist is None:
                import ray
                use_dist = ray.is_initialized() and \
                    len(cand_sorted) > 2 * self.phrase_stage_threshold
            if use_dist:
                return self._phrase_positional_distributed(
                    seq, uniq, cand_sorted)
            return self._phrase_positional_staged(seq, uniq, cand_sorted)
        # vectorized across ALL candidate docs at once: pack (doc,
        # ordinal) into one sortable key, then chain sorted-set
        # intersections of (prefix_end + 1) with the next term's keys
        flat = self.positions_flat(uniq, cand_sorted)
        A = self._position_keys(flat[seq[0]], cand_sorted)
        one = np.uint64(1)
        for tid in seq[1:]:
            if len(A) == 0:
                break
            A = np.intersect1d(A + one, self._position_keys(
                flat[tid], cand_sorted), assume_unique=True)
        if len(A) == 0:
            return np.empty(0, np.uint64)
        return cand_sorted[np.unique(A >> np.uint64(32)).astype(np.int64)]

    # candidate count above which phrase matching goes term-at-a-time
    # (must match the regime where positions_flat can no longer push the
    # doc set down into the parquet read)
    phrase_stage_threshold = 8192
    # None = auto (Ray up and candidates > 2x threshold → chunked
    # fan-out); True/False pins the distributed vs serial-staged path
    phrase_distributed: bool | None = None

    def _phrase_positional_distributed(self, seq: list[int],
                                       uniq: list[int],
                                       cand_sorted: np.ndarray
                                       ) -> np.ndarray:
        """Pure-head phrase fan-out: contiguous ≤threshold-doc candidate
        chunks, one Ray task each, running the staged rare-pivot chain
        scoped to its chunk. Because every chunk is under the pushdown
        threshold, every term's positional read row-group-prunes on the
        chunk's (term, doc)-sorted doc range, and the varint decode +
        key intersections — the wall-time of a pure-head phrase — run on
        all cores instead of one. Docs partition cleanly (a phrase match
        is per-doc), so the union of chunk results is exact."""
        import ray

        # df order computed ONCE here; tasks skip their own load_terms
        loaded = self.load_terms(uniq)
        by_df = sorted(uniq, key=lambda t: (loaded[t].df, t))
        # chunk size: small enough for ~3 tasks per core (the decode +
        # intersect work is the wall-time), never above the pushdown
        # threshold, floor 1024 so per-task read/scheduling overhead
        # stays amortized (tests pin a tiny threshold to force fan-out)
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
        target = int(np.ceil(len(cand_sorted) / (3 * ncpu)))
        chunk_sz = min(max(1, self.phrase_stage_threshold),
                       max(1024, target))
        n_chunks = int(np.ceil(len(cand_sorted) / chunk_sz))
        chunks = np.array_split(cand_sorted, n_chunks)
        task = _phrase_chunk_remote()
        parts = ray.get([task.remote(self.index_dir, list(seq), by_df, c)
                         for c in chunks])
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty(0, np.uint64)
        return np.sort(np.concatenate(parts))

    def _phrase_positional_staged(self, seq: list[int], uniq: list[int],
                                  cand_sorted: np.ndarray,
                                  by_df: list[int] | None = None,
                                  doc_filter: str = "in") -> np.ndarray:
        """Rare-pivot phrase chaining: process terms df-ASCENDING; after
        each term only phrase-start bases satisfying every occurrence so
        far survive, and the NEXT term's positional read is scoped to
        the surviving docs (candidate pushdown re-engages as soon as the
        live set shrinks under the threshold). A pure-head phrase thus
        decodes the rarest term's full positional list ONCE and reads
        only matching row groups of the other heads, instead of decoding
        every head term's full list.

        Base keys: (cand_idx << 32 | ordinal) − idx — a base survives
        term t at position idx iff t occurs at base+idx. Occurrences
        with ordinal < idx cannot host the idx-th phrase token (the
        subtraction would borrow into another candidate's key space, or
        wrap past zero for candidate 0) and are masked out before the
        subtraction."""
        if by_df is None:
            loaded = self.load_terms(uniq)
            by_df = sorted(uniq, key=lambda t: (loaded[t].df, t))
        idxs_of: dict[int, list[int]] = {t: [] for t in uniq}
        for i, t in enumerate(seq):
            idxs_of[t].append(i)
        A: np.ndarray | None = None
        live = cand_sorted
        for tid in by_df:
            flat = self.positions_flat([tid], live, doc_filter=doc_filter)
            K = self._position_keys(flat[tid], cand_sorted)
            T: np.ndarray | None = None
            for idx in idxs_of[tid]:
                ok = (K & np.uint64(0xFFFFFFFF)) >= np.uint64(idx)
                bases = K[ok] - np.uint64(idx)
                T = bases if T is None else np.intersect1d(
                    T, bases, assume_unique=True)
            A = T if A is None else np.intersect1d(A, T,
                                                   assume_unique=True)
            if A is None or len(A) == 0:
                return np.empty(0, np.uint64)
            live = cand_sorted[np.unique(A >> np.uint64(32)
                                         ).astype(np.int64)]
        return live

    def proximity_match(self, q: str, window: int) -> np.ndarray:
        """Positional proximity: docs where some occurrence of every
        query term fits in a token window of ``window`` (max ordinal −
        min ordinal ≤ window). Classic k-sorted-lists minimal-range scan
        per candidate doc. Pure-head queries (candidates above 2× the
        pushdown threshold) fan out as chunked Ray tasks exactly like
        phrase matching — the per-doc window test partitions cleanly."""
        tids = sorted(set(self.query_term_ids(q)))
        if not tids:
            return np.empty(0, np.uint64)
        cands = self.match(q)
        if len(cands) == 0:
            return cands
        cand_sorted = np.sort(np.asarray(cands, np.uint64))
        use_dist = self.phrase_distributed
        if use_dist is None:
            import ray
            use_dist = ray.is_initialized() and \
                len(cand_sorted) > 2 * self.phrase_stage_threshold
        if use_dist and len(cand_sorted) > 1:
            import ray
            ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
            target = int(np.ceil(len(cand_sorted) / (3 * ncpu)))
            chunk_sz = min(max(1, self.phrase_stage_threshold),
                           max(1024, target))
            n_chunks = int(np.ceil(len(cand_sorted) / chunk_sz))
            task = _proximity_chunk_remote()
            parts = ray.get([task.remote(self.index_dir, tids, window, c)
                             for c in np.array_split(cand_sorted,
                                                     n_chunks)])
            parts = [p for p in parts if len(p)]
            if not parts:
                return np.empty(0, np.uint64)
            return np.sort(np.concatenate(parts))
        return self._proximity_verify(tids, window, cand_sorted)

    def _proximity_verify(self, tids: list[int], window: int,
                          cand_sorted: np.ndarray,
                          doc_filter: str = "in") -> np.ndarray:
        # vectorized exact minimal-window test across all docs at once:
        # a doc matches iff for SOME occurrence position p,
        # max_j next_j(p) − p ≤ window, where next_j(p) is list j's first
        # occurrence ≥ p in the same doc (the optimal window's low end is
        # always an occurrence, so scanning occurrence positions is exact)
        flat = self.positions_flat(tids, cand_sorted,
                                   doc_filter=doc_filter)
        keys = [self._position_keys(flat[t], cand_sorted) for t in tids]
        P = sorted_union(keys) if keys else np.empty(0, np.uint64)
        if len(P) == 0:
            return np.empty(0, np.uint64)
        sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
        max_next = np.zeros(len(P), np.uint64)
        for kj in keys:
            if len(kj) == 0:
                return np.empty(0, np.uint64)  # term absent everywhere
            i = np.searchsorted(kj, P)
            ok = i < len(kj)
            v = kj[np.minimum(i, len(kj) - 1)]
            same_doc = ok & ((v >> np.uint64(32)) == (P >> np.uint64(32)))
            nj = np.where(same_doc, v, sentinel)
            max_next = np.maximum(max_next, nj)
        good = (max_next != sentinel) & \
               (max_next - P <= np.uint64(window))
        if not good.any():
            return np.empty(0, np.uint64)
        return cand_sorted[np.unique(P[good] >> np.uint64(32)
                                     ).astype(np.int64)]

    # ------------------------------------------------------------------
    def term_range_docs(self, lo: int | None, hi: int | None,
                        distributed: bool | None = None) -> np.ndarray:
        """Key-space range scan (reference J6 full semantics: string/
        trigram range, index_file.go:1208-1422 keyRecordsBy +
        commonNearFnByKey): ascending doc_ids of every indexed term with
        ``lo <= term_id <= hi`` (None = open bound).

        Every part is touched (terms are hash-partitioned), so the scan
        fans out as ONE RAY TASK PER PART (each returns its deduped doc
        array; the driver unions ≤ P small arrays) — a wide string range
        at scale is parallel per-part work, never a driver-sequential
        key-space walk. The sorted ``term_id`` layout makes each read a
        parquet row-group pushdown — only groups overlapping the key
        range are decoded. In trigram mode the packed key order IS the
        lexicographic order of the 3-rune windows, so this is a
        string-range scan. ``distributed=None`` auto-selects Ray tasks
        when Ray is up and the index is multi-part."""
        paths = []
        for part in range(self.num_parts):
            path = self._segment_file(part)
            if not os.path.exists(path):
                raise RuntimeError(
                    f"index partition file missing: {path}; the index "
                    "is truncated or mid-rebuild")
            paths.append(path)
        if distributed is None:
            import ray
            distributed = ray.is_initialized() and self.num_parts > 1
        if distributed:
            import ray
            task = _range_scan_remote()
            parts = ray.get([task.remote(p, lo, hi) for p in paths])
        else:
            parts = [_range_scan_part(p, lo, hi) for p in paths]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty(0, np.uint64)
        if len(parts) == 1:
            return self._live(parts[0])
        return self._live(sorted_union(parts))

    def select_keys(self, **kw) -> pa.Table:
        """Ordered key-space scan with a vectorized user condition
        (reference Select(OptCcondFn), index_file.go:481-537). See
        vfs_index_ray.scan.select_keys."""
        from .scan import select_keys
        return select_keys(self, **kw)

    def select(self, visit, **kw) -> int:
        """Visitor traversal of the key space (reference
        Select(OptTraverse), index_file.go:481-537). See
        vfs_index_ray.scan.select."""
        from .scan import select
        return select(self, visit, **kw)

    def nearest_term(self, key: int, less: bool = True,
                     distributed: bool | None = None
                     ) -> tuple[int, int] | None:
        """Nearest indexed key (reference J7 on the KEY space:
        FindNearByKey index_file.go:1461-1534 — exact hit if present,
        else climb to the closest indexed key below/above).

        Returns (term_id, df) of the largest indexed term <= key
        (``less=True``) or the smallest >= key. Per part this reads ONE
        row group picked from the term_id min/max statistics (terms are
        sorted within a segment file); parts probe as parallel Ray tasks
        (``distributed=None`` auto-selects, same policy as
        ``term_range_docs``/``select_keys`` — serial at 8 parts is fine,
        serial at 512 is not) and the driver merges one candidate per
        part."""
        paths = []
        for part in range(self.num_parts):
            path = self._segment_file(part)
            if not os.path.exists(path):
                raise RuntimeError(
                    f"index partition file missing: {path}; the index "
                    "is truncated or mid-rebuild")
            paths.append(path)
        if distributed is None:
            import ray
            distributed = ray.is_initialized() and self.num_parts > 1
        if distributed:
            import ray
            task = _nearest_remote()
            cands = ray.get([task.remote(p, int(key), less)
                             for p in paths])
        else:
            cands = [_nearest_part(p, int(key), less) for p in paths]
        cands = [c for c in cands if c is not None]
        if not cands:
            return None
        return (max(cands, key=lambda c: c[0]) if less
                else min(cands, key=lambda c: c[0]))

    # ------------------------------------------------------------------
    def nears(self, q: str, k: int | None = None):
        """The reference's ``Nears`` tf-share ranking (search_cond.go:
        297-381), kept for API parity — BM25 replaces it as the primary
        ranking (north_rule). Per doc: score = Σ_{matching keys}
        df_key / Σ df; distance = ceil((1−score)·1e5)/1e5; results sorted
        by distance ascending. Divergence: ties break by doc_id
        (the reference's sort is unstable)."""
        tids = sorted(set(self.query_term_ids(q)))
        if not tids:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        loaded = self.load_terms(tids)
        tids = [t for t in tids if loaded[t].df > 0]
        if not tids:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        total_df = float(sum(loaded[t].df for t in tids))
        if len(self.tombstones):
            loaded = {t: self._live_postings(loaded[t]) for t in tids}
        ps = [loaded[t].decode() for t in tids]
        docs_all = ps[0].docs if len(ps) == 1 else \
            sorted_union([p.docs for p in ps])
        score = np.zeros(len(docs_all), np.float64)
        for p in ps:
            score[np.searchsorted(docs_all, p.docs)] += p.df / total_df
        dist = np.ceil((1.0 - score) * 1e5) / 1e5
        order = np.lexsort((docs_all, dist))
        if k is not None:
            order = order[:k]
        return docs_all[order], dist[order]

    # --- Block-Max WAND-style pruning (event sweep over block ranges) ---
    def _block_meta(self, p: Postings):
        """(block_lo, block_hi, block_ub) arrays for one term: each skip
        block's inclusive doc range and its BM25 upper bound from the
        stored (tf_max, dl_min)."""
        los, his, ubs = [], [], []
        for c in p.chunks:
            lasts = np.asarray(c["skip_doc_last"], np.uint64)
            if len(lasts) == 0:
                continue
            tf_max = np.asarray(c["block_tf_max"], np.uint64)
            dl_min = np.maximum(np.asarray(c["block_dl_min"], np.uint64), 1)
            ub = self._term_score(tf_max, dl_min, p.df)
            lo = np.empty_like(lasts)
            lo[0] = np.uint64(0)
            lo[1:] = lasts[:-1]  # exclusive-prev → treat as inclusive-lo:
            # conservative (range slightly wider than actual) = still a
            # valid upper bound region
            los.append(lo)
            his.append(lasts)
            ubs.append(ub)
        if not los:
            e = np.empty(0, np.uint64)
            return e, e.copy(), np.empty(0, np.float64)
        return (np.concatenate(los), np.concatenate(his),
                np.concatenate(ubs))

    def _bm25_blockmax(self, tids, loaded, k):
        """Exact top-k with block-max pruning: sweep all terms' block
        doc-ranges; only doc regions whose summed block upper bounds can
        beat a bootstrap threshold are decoded and exactly rescored.
        Bit-identical to the exact path (validated in tests)."""
        # bootstrap θ: exact-score the docs of the rarest terms
        by_df = sorted(tids, key=lambda t: (loaded[t].df, t))
        boot: np.ndarray | None = None
        for t in by_df:
            p = loaded[t].decode()
            boot = p.docs if boot is None else \
                np.union1d(boot, p.docs)
            if len(boot) >= k:
                break
        if boot is None or len(boot) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        boot_scores = self._score_targets(tids, loaded, np.sort(boot))
        if len(boot) < k:
            # fewer candidates than k anywhere near: fall back to exact
            return self._bm25_exact(tids, loaded, k)
        theta = np.partition(boot_scores, len(boot_scores) - k)[-k]

        # event sweep: +ub at block lo, -ub after block hi (conservative
        # boundary handling keeps the bound valid)
        blk = [(t, *self._block_meta(loaded[t])) for t in tids]
        starts = np.concatenate([b[1] for b in blk])
        ends = np.concatenate([b[2] for b in blk])
        ubs = np.concatenate([b[3] for b in blk])
        pos = np.concatenate([starts, ends])
        kind = np.concatenate([np.zeros(len(starts), np.int8),
                               np.ones(len(ends), np.int8)])
        delta = np.concatenate([ubs, -ubs])
        order = np.lexsort((kind, pos))
        pos, delta = pos[order], delta[order]
        cum = np.cumsum(delta)
        # qualifying positions: cum ≥ θ (within fp slack)
        ok = cum >= theta - 1e-9
        if not ok.any():
            dd, ss = self._topk(np.sort(boot), boot_scores, k)
            return dd, ss
        # merge qualifying sweep segments into doc intervals
        seg_lo = pos[ok]
        nxt = np.empty(len(pos), np.uint64)
        nxt[:-1] = pos[1:]
        nxt[-1] = np.uint64(0xFFFFFFFFFFFFFFFF)
        seg_hi = nxt[ok]
        # candidates: decode blocks overlapping any qualifying segment,
        # keep docs inside the segments
        targets = [np.sort(boot)]
        for t in tids:
            p = loaded[t]
            if p.docs is not None:
                d = p.docs
                inside = self._in_intervals(d, seg_lo, seg_hi)
                targets.append(d[inside])
                continue
            for c in p.chunks:
                lasts = np.asarray(c["skip_doc_last"], np.uint64)
                if len(lasts) == 0:
                    continue
                lo = np.empty_like(lasts)
                lo[0] = np.uint64(0)
                lo[1:] = lasts[:-1]
                hit = np.flatnonzero(self._ranges_overlap(
                    lo, lasts, seg_lo, seg_hi))
                for bi in hit:
                    d, _, _ = decode_block(c, int(bi))
                    inside = self._in_intervals(d, seg_lo, seg_hi)
                    targets.append(d[inside])
        cand = sorted_union(targets)
        scores = self._score_targets(tids, loaded, cand)
        return self._topk(cand, scores, k)

    @staticmethod
    def _in_intervals(docs: np.ndarray, lo: np.ndarray,
                      hi: np.ndarray) -> np.ndarray:
        """Membership of each doc in any [lo_i, hi_i] interval (lo sorted)."""
        if len(lo) == 0:
            return np.zeros(len(docs), bool)
        i = np.searchsorted(lo, docs, side="right") - 1
        i = np.maximum(i, 0)
        return (docs >= lo[i]) & (docs <= hi[i])

    @staticmethod
    def _ranges_overlap(blo, bhi, seg_lo, seg_hi) -> np.ndarray:
        """For each block range, does it overlap any qualifying segment?"""
        if len(seg_lo) == 0:
            return np.zeros(len(blo), bool)
        j = np.searchsorted(seg_hi, blo, side="left")
        j = np.minimum(j, len(seg_lo) - 1)
        return (seg_lo[j] <= bhi) & (seg_hi[j] >= blo)

    def _score_targets(self, tids, loaded, targets: np.ndarray) -> np.ndarray:
        """Exact scores for sorted target docs — ascending-term sequential
        accumulation, probing undecoded terms' blocks only."""
        scores = np.zeros(len(targets), np.float64)
        for t in tids:  # ascending term_id
            p = loaded[t]
            if p.docs is not None:
                pos = np.searchsorted(p.docs, targets)
                ok = pos < len(p.docs)
                pos2 = np.minimum(pos, max(len(p.docs) - 1, 0))
                if len(p.docs):
                    ok &= p.docs[pos2] == targets
                tf = np.where(ok, p.tfs[pos2] if len(p.docs) else 0, 0)
                dl = np.where(ok, p.dls[pos2] if len(p.docs) else 1, 1)
            else:
                tf, dl, ok = self._probe_blocks(p, targets)
            nz = ok & (tf > 0)
            if nz.any():
                contrib = np.zeros(len(targets), np.float64)
                contrib[nz] = self._term_score(
                    tf[nz].astype(np.uint64), dl[nz].astype(np.uint64),
                    p.df)
                scores = np.where(nz, scores + contrib, scores)
        return scores

    # ------------------------------------------------------------------
    def cooccur_distance(self, qa: str, qb: str,
                         filter_head: bool = False) -> float:
        """Approximate co-occurrence distance between two queries
        (reference A6: search_cond.go:552-612):
        ``1 − |A∩B| / max(|A|,|B|)`` per key pair, averaged over the
        cross product of the two queries' keys (distanceOfKeys,
        search_cond.go:448-536). 1.0 = never co-occur, 0.0 = identical
        doc sets. Uses cached postings + sorted intersections.

        ``filter_head=True`` mirrors the reference's filterByAvg
        (search_cond.go:240-280, O9): with >10 keys per side, keys with
        df above the median are dropped (stop-trigram suppression)."""
        keys_a = self.query_term_ids(qa)
        keys_b = self.query_term_ids(qb)
        if not keys_a or not keys_b:
            return 1.0
        loaded = self.load_terms(list(set(keys_a) | set(keys_b)))
        if filter_head:
            def suppress(keys: list[int]) -> list[int]:
                if len(keys) <= 10:
                    return keys
                dfs = np.array([loaded[t].df for t in keys], np.float64)
                med = float(np.median(dfs))
                kept = [t for t, d in zip(keys, dfs) if d <= med]
                return kept or keys
            keys_a = suppress(keys_a)
            keys_b = suppress(keys_b)
        dists = []
        for ta in keys_a:
            for tb in keys_b:
                pa_, pb_ = loaded[ta].decode(), loaded[tb].decode()
                denom = max(len(pa_.docs), len(pb_.docs))
                if denom == 0:
                    dists.append(1.0)
                    continue
                inter = len(sorted_intersect(pa_.docs, pb_.docs))
                dists.append(1.0 - inter / denom)
        return float(np.mean(dists))

    # ------------------------------------------------------------------
    @staticmethod
    def _prune_row_groups(pf: "pq.ParquetFile", key: str,
                          want: np.ndarray) -> list[int] | None:
        """Row groups whose [min,max] statistics of ``key`` intersect the
        sorted ``want`` id set; None = stats unavailable, read all."""
        md = pf.metadata
        try:
            ki = pf.schema_arrow.names.index(key)
        except ValueError:
            return None
        keep = []
        for gi in range(md.num_row_groups):
            stats = md.row_group(gi).column(ki).statistics
            if stats is None or not stats.has_min_max:
                return None
            lo, hi = np.uint64(stats.min), np.uint64(stats.max)
            # any want id in [lo, hi]?
            a = np.searchsorted(want, lo, side="left")
            if a < len(want) and want[a] <= hi:
                keep.append(gi)
        return keep

    def fetch_rows(self, doc_ids: np.ndarray, columns=None) -> pa.Table:
        """Materialize matched rows from the corpus (J5/M8 analog) as a
        true broadcast semi-join: per-file row-group pruning on the id
        column's parquet statistics (doc_id-sorted corpora read only the
        groups containing matches), then an in-group sorted-set filter.
        Never reads row groups that cannot contain a match; falls back to
        a streaming Ray map_batches filter when ids must be derived from
        the url column (no pushdown possible).

        ``last_fetch_stats`` records row_groups_total / row_groups_read
        so pruning is assertable in tests."""
        if self.corpus_files is None:
            raise ValueError("SearchEngine built without corpus_files")

        want = self._live(np.unique(np.asarray(doc_ids, np.uint64)))
        files = (self.corpus_files if isinstance(self.corpus_files, list)
                 else [self.corpus_files])
        schema = pq.read_schema(files[0])
        key = self.id_col if self.id_col in schema.names else self.url_col
        read_cols = columns
        if read_cols is not None:
            read_cols = [c for c in read_cols if c in schema.names]
            if key not in read_cols:
                read_cols = read_cols + [key]
        if key != self.id_col:
            out = self._fetch_rows_by_url(files, want, read_cols)
        else:
            total = read = 0
            parts: list[pa.Table] = []
            for f in files:
                pf = pq.ParquetFile(f)
                total += pf.metadata.num_row_groups
                if len(want) == 0:
                    continue
                groups = self._prune_row_groups(pf, key, want)
                if groups is None:
                    groups = list(range(pf.metadata.num_row_groups))
                read += len(groups)
                if not groups:
                    continue
                tbl = pf.read_row_groups(groups, columns=read_cols,
                                         use_threads=False)
                ids = tbl[key].to_numpy(zero_copy_only=False
                                        ).astype(np.uint64)
                pos = np.minimum(np.searchsorted(want, ids), len(want) - 1)
                parts.append(tbl.filter(pa.array(want[pos] == ids)))
            self.last_fetch_stats = {"row_groups_total": total,
                                     "row_groups_read": read}
            out = (pa.concat_tables(parts) if parts
                   else schema.empty_table() if read_cols is None
                   else schema.empty_table().select(read_cols))
        if columns is not None:
            out = out.select([c for c in columns if c in out.column_names])
        return out

    def _fetch_rows_by_url(self, files, want: np.ndarray,
                           read_cols) -> pa.Table:
        """Streaming semi-join for url-keyed corpora: broadcast the sorted
        id set, derive ids per batch, return only matches — the corpus is
        never materialized anywhere."""
        import ray
        import ray.data

        from .hashing import doc_ids_from_urls
        url_col = self.url_col
        if len(want) == 0:
            empty = pq.read_schema(files[0]).empty_table()
            return empty if read_cols is None else empty.select(read_cols)
        want_ref = ray.put(want)

        def keep(batch: pa.Table) -> pa.Table:
            w = ray.get(want_ref)
            col = batch[url_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ids = doc_ids_from_urls(col)
            pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
            return batch.filter(pa.array(w[pos] == ids))

        ds = ray.data.read_parquet(files, columns=read_cols)
        batches = list(ds.map_batches(keep, batch_format="pyarrow",
                                      zero_copy_batch=True)
                       .iter_batches(batch_format="pyarrow"))
        if not batches:
            empty = pq.read_schema(files[0]).empty_table()
            return empty if read_cols is None else empty.select(read_cols)
        return pa.concat_tables(batches)


# ----------------------------------------------------------------------
# Ray-parallel paths
# ----------------------------------------------------------------------

class QueryActor:
    """Actor-pool batch scorer: a Dataset of query strings → top-k results.

    State (stats, decoded-postings cache) loads once per actor
    (reference T2/T5: per-process posting/page caches). Use:
    ``queries_ds.map_batches(QueryActor, fn_constructor_kwargs=...,
    concurrency=N, batch_format="pyarrow")``.
    """

    def __init__(self, index_dir: str, k: int = 10, method: str = "auto"):
        # 1-cpu pool actor: no Arrow thread fan-out (CLAUDE.md)
        self.engine = SearchEngine(index_dir, io_threads=False)
        self.k = k
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_out, rank_out, doc_out, score_out = [], [], [], []
        for q in batch["query"].to_pylist():
            docs, scores = self.engine.bm25(q, self.k, self.method)
            for r, (d, s) in enumerate(zip(docs.tolist(), scores.tolist()), 1):
                q_out.append(q)
                rank_out.append(r)
                doc_out.append(d)
                score_out.append(s)
        return pa.table({
            "query": pa.array(q_out, pa.string()),
            "rank": pa.array(rank_out, pa.int32()),
            "doc_id": pa.array(doc_out, pa.uint64()),
            "score": pa.array(score_out, pa.float64()),
        })


def fielded_bm25(fields: list[tuple["SearchEngine", float]], q: str,
                 k: int = 10):
    """Weighted multi-field BM25 (the Lucene multi-field boost query:
    ``score(d) = Σ_f w_f · BM25_f(q, d)`` — each field its own index
    with its own df/N/avgdl statistics).  Complete top-k via the
    threshold algorithm: retrieve each field's top-K (doubling K),
    exact-score the candidate UNION in every field with
    ``bm25_scores_for`` point probes, and stop once the kth combined
    score strictly exceeds ``Σ_f w_f · (f's Kth retrieved score)`` —
    any document outside every retrieved list is bounded above by
    that sum, so no unseen doc can displace the returned k (ties
    included, because the stop is strict).  Terminates at candidate
    exhaustion otherwise.  fp64 parity: combined scores accumulate
    field-by-field in the given order starting from 0.0, matching a
    SQL ``w1*s1 + w2*s2`` transcription exactly.

    Reference parity: vfs-index indexes one column per index directory
    (column.go); multi-field scoring is the extension-surface analog
    of querying several of its column indexes at once."""
    if not fields:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    K = max(64, 2 * k)
    while True:
        tops = [eng.bm25(q, K) for eng, _ in fields]
        exhausted = all(len(ids) < K for ids, _ in tops)
        floor = sum(w * (sc[K - 1] if len(sc) >= K else 0.0)
                    for (ids, sc), (_, w) in zip(tops, fields))
        cand = np.unique(np.concatenate(
            [ids for ids, _ in tops]).astype(np.uint64))
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        comb = np.zeros(len(cand), np.float64)
        for eng, w in fields:
            _, s = eng.bm25_scores_for(q, cand)
            comb += w * s
        order = np.lexsort((cand.astype(np.int64), -comb))[:k]
        if exhausted:
            break
        if len(order) == k and comb[order[-1]] > floor:
            break
        K *= 2
    return cand[order], comb[order]


def bm25_topk_ray(index_dir: str, q: str, k: int = 10):
    """Distributed exact top-k: score doc-range buckets independently.

    Every chunk of a doc's postings shares ``bucket = doc_id >> S``, so a
    per-bucket task sees all of its docs' query-term postings: exact
    scores, no cross-task exchange; global merge is a tiny sort+limit.
    """
    import ray.data

    stats = read_stats(index_dir)
    engine = SearchEngine(index_dir)
    tids = sorted(set(engine.query_term_ids(q)))
    if not tids:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    parts = sorted({t % stats["num_parts"] for t in tids})
    files = [engine._segment_file(p) for p in parts]
    for f in files:
        if not os.path.exists(f):
            raise RuntimeError(f"index partition file missing: {f}; the "
                               "index is truncated or mid-rebuild")
    tid_set = [np.uint64(t) for t in tids]
    ds = ray.data.read_parquet(
        files, filter=pc.field("term_id").isin(tid_set))
    ndocs, avgdl = stats["n_docs"], stats["avgdl"]

    def score_bucket(group: pa.Table) -> pa.Table:
        from .codec import chunk_rows_columnar
        rows = sorted(chunk_rows_columnar(group),
                      key=lambda r: (int(r["term_id"]), int(r["bucket"])))
        decoded = []
        for row in rows:  # ascending term_id (+ bucket)
            d, tf, dl = decode_chunk(row)
            df = int(row["df"])
            idf = math.log(1.0 + (ndocs - df + 0.5) / (df + 0.5))
            tff = tf.astype(np.float64)
            dlf = dl.astype(np.float64)
            tfn = tff * (BM25_K1 + 1.0) / (
                tff + BM25_K1 * (1.0 - BM25_B + BM25_B * dlf / avgdl))
            decoded.append((d, idf * tfn))
        if len(decoded) == 1:
            docs_all = decoded[0][0]
        else:
            docs_all = sorted_union([d for d, _ in decoded])
        scores = np.zeros(len(docs_all), np.float64)
        for d, s in decoded:  # sequential per doc, ascending term order
            scores[np.searchsorted(docs_all, d)] += s
        dd, ss = SearchEngine._topk(docs_all, scores, k)
        return pa.table({"doc_id": pa.array(dd, pa.uint64()),
                         "score": pa.array(ss, pa.float64())})

    out = ds.groupby("bucket").map_groups(score_bucket,
                                          batch_format="pyarrow")
    rows = out.take_all()  # ≤ k per bucket
    if not rows:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    docs = np.array([r["doc_id"] for r in rows], np.uint64)
    scores = np.array([r["score"] for r in rows], np.float64)
    return SearchEngine._topk(docs, scores, k)
