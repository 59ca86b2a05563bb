"""Segment merge / compaction (reference §3.3: baseMergeIndex,
IndexFileMerged.Merge/Split, merged_index_file.go:272-456).

The reference k-way-merges sorted KeyRecordLists with overlap resolution
(MergeKerRecordList, merged_index_file.go:300-422); its invariant tests
assert count(merged) = count(a) + count(b) − overlap
(vfsindex_internal_test.go:752-975). Here:

- ``merge_indexes([a, b, ...], out)``: per hash partition, decode all
  sources' posting chunks, stack with source priority (later wins on a
  duplicate (term, doc)), re-encode. One Ray task per partition — same
  shape as the build's encode phase, no global shuffle (sources share the
  partition function).
- ``repartition_index(src, out, new_num_parts)``: the Split/Merge analog —
  re-hash terms into a different partition count.

Assumption (documented): inputs are doc-disjoint, or a doc shared between
inputs has identical content (the reference has the same property through
its (fileID, offset) record identity). True doc replacement = tombstone
the old doc (``SearchEngine.delete_docs``) in its source index, absorb the
new content as a fresh wave/index, then ``purge_tombstones`` at leisure —
the reference itself has no delete story.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .build import IndexBuilder, SegmentWriter, read_stats
from .codec import decode_chunk


def decode_segment_table(tbl: pa.Table):
    """Expand segment rows back into flat posting arrays
    (terms, docs, tfs, dls), ordered (term asc, bucket asc → doc asc)."""
    from .codec import chunk_rows_columnar
    terms_l, docs_l, tfs_l, dls_l = [], [], [], []
    for row in chunk_rows_columnar(tbl):
        d, tf, dl = decode_chunk(row)
        terms_l.append(np.full(len(d), np.uint64(row["term_id"])))
        docs_l.append(d)
        tfs_l.append(tf)
        dls_l.append(dl)
    if not terms_l:
        e = np.empty(0, np.uint64)
        return e, e.copy(), e.copy(), e.copy()
    return (np.concatenate(terms_l), np.concatenate(docs_l),
            np.concatenate(tfs_l), np.concatenate(dls_l))


def _merge_part(part: int, src_files: list[str], writer: SegmentWriter):
    """Merge one partition across sources. Later sources win duplicates."""
    terms_l, docs_l, tfs_l, dls_l, prio_l = [], [], [], [], []
    counts = []
    for pri, f in enumerate(src_files):
        if not os.path.exists(f):
            counts.append(0)
            continue
        t, d, tf, dl = decode_segment_table(pq.read_table(f))
        counts.append(len(t))
        terms_l.append(t)
        docs_l.append(d)
        tfs_l.append(tf)
        dls_l.append(dl)
        prio_l.append(np.full(len(t), pri, np.int64))
    if not terms_l:
        empty = pa.table({"term_id": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.uint64()),
                          "tf": pa.array([], pa.uint32()),
                          "dl": pa.array([], pa.uint32())})
        writer.encode_part(part, empty)
        return {"part": part, "n_sources": counts, "n_merged": 0,
                "overlap": 0}
    terms = np.concatenate(terms_l)
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    prio = np.concatenate(prio_l)
    # sort by (term, doc, prio); keep the LAST (highest prio) of each dup
    order = np.lexsort((prio, docs, terms))
    t, d, tf, dl = terms[order], docs[order], tfs[order], dls[order]
    n = len(t)
    keep = np.empty(n, bool)
    keep[:-1] = (t[:-1] != t[1:]) | (d[:-1] != d[1:])
    keep[-1] = True
    overlap = int(n - keep.sum())
    sel = np.flatnonzero(keep)
    postings = pa.table({
        "term_id": pa.array(t[sel], pa.uint64()),
        "doc_id": pa.array(d[sel], pa.uint64()),
        "tf": pa.array(tf[sel].astype(np.uint32), pa.uint32()),
        "dl": pa.array(dl[sel].astype(np.uint32), pa.uint32()),
    })
    writer.encode_part(part, postings)
    return {"part": part, "n_sources": counts, "n_merged": int(keep.sum()),
            "overlap": overlap}


def merged_sources(out_dir: str) -> list[str]:
    """Constituent source index dirs recorded in the merged index's wave
    lineage (the ``merge:<dir>`` entries merge_indexes writes)."""
    import json

    srcs: list[str] = []
    waves_dir = os.path.join(out_dir, "waves")
    if not os.path.isdir(waves_dir):
        return srcs
    for name in sorted(os.listdir(waves_dir)):
        if name.endswith(".json"):
            with open(os.path.join(waves_dir, name)) as f:
                w = json.load(f)
            for e in w.get("files", []):
                if isinstance(e, str) and e.startswith("merge:"):
                    srcs.append(e[len("merge:"):])
    return srcs


def clean_merged_sources(out_dir: str, src_dirs: list[str] | None = None,
                         force: bool = False) -> dict:
    """Space reclamation after compaction (reference column.go:586-602
    deleteMergedFiles/cleanDirs, ``EnableCleanAfterMerge`` config.go, CLI
    ``clean`` cmd/vfs-index/main.go:145): delete the constituent source
    indexes once the merged index is FULLY committed.

    Safety protocol: ``verify_index(out_dir)`` must pass (every part
    sidecar + segment file + doc/token sums) before a single byte is
    removed — so a crash anywhere leaves either all data (commit
    incomplete → nothing deleted) or a committed merged index that
    answers every query (clean partially/fully done). Idempotent:
    already-missing sources are skipped, re-running completes a crashed
    clean. ``src_dirs`` defaults to the merged index's recorded lineage.
    """
    import shutil

    from .build import verify_index

    srcs = list(src_dirs) if src_dirs is not None \
        else merged_sources(out_dir)
    if not force:
        rep = verify_index(out_dir)
        if not rep["ok"]:
            raise ValueError("refusing to clean: merged index at "
                             f"{out_dir} is not fully committed: "
                             f"{rep['errors'][:3]}")
    removed, missing = [], []
    out_real = os.path.realpath(out_dir)
    for s in srcs:
        if os.path.realpath(s) == out_real:
            continue  # never delete the merged index itself
        if os.path.isdir(s):
            shutil.rmtree(s)
            removed.append(s)
        else:
            missing.append(s)
    return {"removed": removed, "already_missing": missing}


def merge_indexes(src_dirs: list[str], out_dir: str,
                  assume_doc_disjoint: bool = True,
                  n_docs_override: int | None = None,
                  max_parts: int | None = None,
                  clean_after_merge: bool = False) -> dict:
    """Merge several indexes built with identical (mode, num_parts) into
    ``out_dir``. Returns merged stats + per-part merge report.

    ``max_parts`` bounds one merge round (the reference's time-budgeted,
    cancellable MergeDuration, config.go:5-9 / column.go:512-518):
    committed partitions survive, the next call resumes the rest; a
    partial round returns ``{"status": "partial", ...}`` without
    finalizing.

    ``clean_after_merge`` (reference ``EnableCleanAfterMerge``): delete
    the source indexes once the merged index is fully committed and
    verified — see ``clean_merged_sources`` for the crash protocol. Only
    applies on the finalizing round, never on a partial one."""
    stats = [read_stats(s) for s in src_dirs]
    num_parts = stats[0]["num_parts"]
    mode = stats[0]["mode"]
    for s in stats[1:]:
        if s["num_parts"] != num_parts or s["mode"] != mode:
            raise ValueError("sources must share num_parts and mode; "
                             "use repartition_index first")
    out = IndexBuilder(out_dir, mode=mode, num_parts=num_parts,
                       bucket_shift=stats[0]["bucket_shift"],
                       compression=stats[0].get("compression", "lz4"))
    writer = SegmentWriter(out.segments_dir, out.bucket_shift,
                           compression=out.compression)

    def merge_batch(batch: pa.Table) -> pa.Table:
        reports = []
        for p in batch["p"].to_pylist():
            files = [os.path.join(s, "segments", f"part={p:05d}.parquet")
                     for s in src_dirs]
            reports.append(_merge_part(int(p), files, writer))
        return pa.table({
            "part": pa.array([r["part"] for r in reports], pa.int32()),
            "n_merged": pa.array([r["n_merged"] for r in reports],
                                 pa.int64()),
            "overlap": pa.array([r["overlap"] for r in reports], pa.int64()),
            "n_sources": pa.array([r["n_sources"] for r in reports],
                                  pa.list_(pa.int64())),
        })

    todo = [p for p in range(num_parts)
            if p not in out._done_parts()]
    deferred = []
    if max_parts is not None and len(todo) > max_parts:
        todo, deferred = todo[:max_parts], todo[max_parts:]
    reports = []
    if todo:
        parts_ds = ray.data.from_items([{"p": p} for p in todo],
                                       override_num_blocks=len(todo))
        reports = parts_ds.map_batches(merge_batch, batch_format="pyarrow",
                                       batch_size=1).take_all()
    if deferred:
        return {"status": "partial", "parts_done": len(out._done_parts()),
                "parts_remaining": len(deferred), "merge_report": reports}
    # stats: docs per the disjointness contract; tokens from part sidecars
    if n_docs_override is not None:
        n_docs = n_docs_override
    elif assume_doc_disjoint:
        n_docs = sum(s["n_docs"] for s in stats)
    else:
        raise ValueError("need n_docs_override when inputs share docs")
    # synthesize a wave sidecar so finalize() has the doc count + lineage
    from .build import _atomic_write_json
    _atomic_write_json(os.path.join(out.waves_dir, "wave=0000.json"),
                       {"wave": 0, "files": [f"merge:{s}" for s in src_dirs],
                        "n_docs": int(n_docs)})
    merged_stats = out.finalize()
    merged_stats["merge_report"] = reports
    if clean_after_merge:
        # commit point is finalize() above; the clean re-verifies the
        # committed index before deleting, and a crash in between simply
        # leaves the sources for a later clean_merged_sources() call
        merged_stats["clean_report"] = clean_merged_sources(
            out_dir, src_dirs)
    return merged_stats


def purge_tombstones(src_dir: str, out_dir: str) -> dict:
    """Physically rewrite an index WITHOUT its tombstoned docs (the
    compaction half of the delete story — see SearchEngine.delete_docs
    for the query-time half). Per hash partition, one Ray task decodes
    the segment, masks the deleted docs, and re-encodes — identical in
    shape to the build's encode phase and to merge_indexes, no global
    shuffle; positional sidecar files get the same row filter. df,
    n_docs, total_tokens and avgdl all come out exactly as a fresh
    build of the surviving corpus would produce them (deterministic
    segment content → byte-identical segments, pinned by test), so
    after a purge the pruned BM25 paths are valid again and the purged
    index carries no tombstones.

    Resumable: each partition commits a ``purge/part=N.json`` sidecar
    recording the deleted doc ids it actually dropped (needed to fix
    n_docs on the driver); re-runs skip committed partitions and re-read
    their sidecars, and every write is tmp+rename idempotent."""
    import json

    from .build import _atomic_write_json
    from .search import load_tombstones

    st = read_stats(src_dir)
    tomb = load_tombstones(src_dir)
    num_parts = int(st["num_parts"])
    out = IndexBuilder(out_dir, mode=st["mode"], num_parts=num_parts,
                       bucket_shift=st["bucket_shift"],
                       compression=st.get("compression", "lz4"),
                       positions=bool(st.get("positions", False)))
    writer = SegmentWriter(out.segments_dir, out.bucket_shift,
                           block_size=st.get("block_size"),
                           compression=out.compression)
    purge_dir = os.path.join(out_dir, "purge")
    os.makedirs(purge_dir, exist_ok=True)
    has_pos = os.path.isdir(os.path.join(src_dir, "positions"))
    if has_pos:
        os.makedirs(os.path.join(out_dir, "positions"), exist_ok=True)

    def purge_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        parts_o, dropped_o = [], []
        tomb_pa = pa.array(tomb, pa.uint64())
        for p in batch["p"].to_pylist():
            p = int(p)
            f = os.path.join(src_dir, "segments", f"part={p:05d}.parquet")
            t, d, tf, dl = decode_segment_table(
                pq.read_table(f, use_threads=False))
            if len(tomb) and len(d):
                pos = np.minimum(np.searchsorted(tomb, d), len(tomb) - 1)
                dead = tomb[pos] == d
            else:
                dead = np.zeros(len(d), bool)
            live = ~dead
            writer.encode_part(p, pa.table({
                "term_id": pa.array(t[live], pa.uint64()),
                "doc_id": pa.array(d[live], pa.uint64()),
                "tf": pa.array(tf[live].astype(np.uint32), pa.uint32()),
                "dl": pa.array(dl[live].astype(np.uint32), pa.uint32()),
            }))
            if has_pos:
                pf = os.path.join(src_dir, "positions",
                                  f"part={p:05d}.parquet")
                if os.path.exists(pf):
                    pt = pq.read_table(pf, use_threads=False)
                    if len(tomb):
                        pt = pt.filter(pc.invert(pc.is_in(
                            pt["doc_id"], value_set=tomb_pa)))
                    po = os.path.join(out_dir, "positions",
                                      f"part={p:05d}.parquet")
                    pq.write_table(pt, po + ".tmp")
                    os.replace(po + ".tmp", po)
            dd = np.unique(d[dead]).tolist()
            _atomic_write_json(
                os.path.join(purge_dir, f"part={p:05d}.json"),
                {"part": p, "deleted_docs": dd})
            parts_o.append(p)
            dropped_o.append(len(dd))
        return pa.table({"part": pa.array(parts_o, pa.int32()),
                         "n_docs_dropped": pa.array(dropped_o,
                                                    pa.int64())})

    def _done() -> set[int]:
        done = set()
        for name in os.listdir(purge_dir):
            if name.startswith("part=") and name.endswith(".json"):
                done.add(int(name[len("part="):-len(".json")]))
        return done

    todo = [p for p in range(num_parts) if p not in _done()]
    if todo:
        parts_ds = ray.data.from_items([{"p": p} for p in todo],
                                       override_num_blocks=len(todo))
        parts_ds.map_batches(purge_batch, batch_format="pyarrow",
                             batch_size=1).materialize()
    deleted: set[int] = set()
    for p in sorted(_done()):
        with open(os.path.join(purge_dir, f"part={p:05d}.json")) as fh:
            deleted.update(json.load(fh)["deleted_docs"])
    n_docs = int(st["n_docs"]) - len(deleted)
    _atomic_write_json(os.path.join(out.waves_dir, "wave=0000.json"),
                       {"wave": 0, "files": [f"purge:{src_dir}"],
                        "n_docs": n_docs})
    stats = out.finalize()
    stats["purged_docs"] = len(deleted)
    stats["tombstones_requested"] = int(len(tomb))
    return stats


# --- federated scoring workers (run as Ray tasks, one per source) --------

def _fed_source_dfs(src_dir: str, q: str, engine=None) -> dict[int, int]:
    """Per-source round 1: df of every query term in this source. As a
    Ray task ``engine`` is None (fresh single-threaded-IO engine); the
    in-process path passes the RESIDENT engine so its caches survive."""
    from .search import SearchEngine
    e = engine if engine is not None else SearchEngine(src_dir,
                                                       io_threads=False)
    tids = sorted(set(e.query_term_ids(q)))
    loaded = e.load_terms(tids)
    return {t: loaded[t].df for t in tids}


def _fed_score_source(src_dir: str, tids: list[int], gdf: dict[int, int],
                      ndocs: int, avgdl: float, k: int, engine=None):
    """Per-source task, round 2: exact BM25 of this source's docs under
    GLOBAL statistics (N, avgdl, df), local top-k. Sources are
    doc-disjoint, so each doc's full posting set lives in one source and
    the ascending-term fp64 accumulation here performs exactly the same
    additions as the merged index's exact path — the global top-k over
    the union of local top-ks is fp64-identical to the merged engine."""
    import math

    from . import BM25_B, BM25_K1
    from .search import SearchEngine
    e = engine if engine is not None else SearchEngine(src_dir,
                                                       io_threads=False)
    loaded = e.load_terms(list(tids))
    if len(e.tombstones):  # per-source deletes filter here too
        ps = [(t, e._live_postings(loaded[t])) for t in tids]
    else:
        ps = [(t, loaded[t].decode()) for t in tids]
    ps = [(t, p) for t, p in ps if len(p.docs)]
    empty = (np.empty(0, np.uint64), np.empty(0, np.float64))
    if not ps:
        return empty
    if len(ps) == 1:
        docs_all = ps[0][1].docs
    else:
        docs_all = np.unique(np.concatenate([p.docs for _, p in ps]))
    scores = np.zeros(len(docs_all), np.float64)
    for t, p in ps:  # ascending term_id — same order as _bm25_exact
        df = int(gdf[t])
        idf = math.log(1.0 + (ndocs - df + 0.5) / (df + 0.5))
        tf = p.tfs.astype(np.float64)
        dl = p.dls.astype(np.float64)
        tfn = tf * (BM25_K1 + 1.0) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        scores[np.searchsorted(docs_all, p.docs)] += idf * tfn
    return SearchEngine._topk(docs_all, scores, k)


def _fed_match_source(src_dir: str, q: str, engine=None) -> np.ndarray:
    from .search import SearchEngine
    e = engine if engine is not None else SearchEngine(src_dir,
                                                       io_threads=False)
    return e.match(q)


from .remote import remote_1cpu as _remote


class FederatedEngine:
    """Query across several doc-disjoint segment indexes as if they were
    one, with opportunistic merge-on-search (reference
    search_cond.go:828-837 MergeOnSearch: queries over unmerged index
    files trigger merging). Two compaction modes:

    - default: budgeted rounds run INLINE at the start of each
      match()/bm25() call — a query during compaction pays for one
      ``merge_budget``-partition round before it is answered (committed
      partitions persist, so the cost is bounded and one-time).
    - ``background_merge=True``: compaction rounds run in a daemon
      thread (the reference's fully-background merge,
      column.go:512-518 MergeIdxToIdx goroutine) — queries keep
      answering through the federated path and atomically swap to the
      merged index when the last partition commits. Partition commits
      are tmp+rename, so a crash mid-compaction loses nothing.

    Scoring uses GLOBAL statistics (N = Σ n_docs, avgdl from summed token
    counts, df = Σ per-source df), and per-term postings are the sorted
    union of the sources' — so BM25 results are fp64-identical to
    querying the fully merged index (tests assert it).

    ``merge_budget`` > 0 merges that many partitions into ``out_dir``
    per query (budgeted compaction rounds, the MergeDuration analog);
    once all partitions are committed the engine transparently swaps to
    the merged index.
    """

    def __init__(self, src_dirs: list[str], out_dir: str | None = None,
                 merge_budget: int = 0, background_merge: bool = False):
        from .search import SearchEngine
        self.src_dirs = list(src_dirs)
        self.engines = [SearchEngine(s) for s in src_dirs]
        stats = [e.stats for e in self.engines]
        self.mode = stats[0]["mode"]
        self.ndocs = sum(s["n_docs"] for s in stats)
        total_tokens = sum(s["total_tokens"] for s in stats)
        self.avgdl = (total_tokens / self.ndocs) if self.ndocs else 1.0
        self.out_dir = out_dir
        self.merge_budget = merge_budget
        self.merged = None  # becomes a SearchEngine when compaction ends
        self._bg_thread = None
        self._bg_err: BaseException | None = None
        if background_merge:
            self.start_background_compaction()

    # ----- background compaction (reference MergeIdxToIdx goroutine) -----
    def start_background_compaction(self) -> None:
        """Run budgeted merge rounds in a daemon thread until every
        partition is committed, then swap ``self.merged`` in (atomic
        attribute store — readers see either the federated path or the
        finished merged engine, never a partial one)."""
        if self._bg_thread is not None or self.merged is not None:
            return
        if not self.out_dir or self.merge_budget <= 0:
            raise ValueError("background compaction needs out_dir and "
                             "merge_budget > 0")
        import threading
        self._bg_thread = threading.Thread(
            target=self._bg_loop, name="fed-compaction", daemon=True)
        self._bg_thread.start()

    def _bg_loop(self) -> None:
        try:
            while True:
                report = merge_indexes(self.src_dirs, self.out_dir,
                                       max_parts=self.merge_budget)
                if report.get("status") != "partial":
                    break
            from .search import SearchEngine
            self.merged = SearchEngine(self.out_dir)
        except BaseException as e:  # surfaced by wait_compaction()
            self._bg_err = e

    def wait_compaction(self, timeout: float | None = None) -> bool:
        """Join the background thread; re-raise any compaction error.
        Returns True once the merged engine is live."""
        if self._bg_thread is not None:
            self._bg_thread.join(timeout)
        if self._bg_err is not None:
            raise self._bg_err
        return self.merged is not None

    def _maybe_merge(self) -> None:
        if self._bg_thread is not None:
            return  # background thread owns compaction; queries never wait
        if self.merged is not None or not self.out_dir or \
                self.merge_budget <= 0:
            return
        report = merge_indexes(self.src_dirs, self.out_dir,
                               max_parts=self.merge_budget)
        if report.get("status") != "partial":
            from .search import SearchEngine
            self.merged = SearchEngine(self.out_dir)

    def clean_sources(self) -> dict:
        """Reclaim the constituent source indexes once compaction has
        finished and the engine serves from the merged index (reference
        EnableCleanAfterMerge). Explicit — never automatic — because a
        query already in flight on the federated path must not have its
        files deleted under it: the caller invokes this at a quiesce
        point after ``wait_compaction()``. After cleaning, the federated
        fallback path is gone; ``self.merged`` answers everything."""
        if self.merged is None:
            raise ValueError("clean_sources before compaction finished; "
                             "call wait_compaction() first")
        report = clean_merged_sources(self.out_dir, self.src_dirs)
        self.engines = []  # source readers are now invalid
        return report

    def df(self, q: str) -> dict[str, int]:
        if self.merged is not None:
            return self.merged.df(q)
        out: dict[str, int] = {}
        for e in self.engines:
            for tok, d in e.df(q).items():
                out[tok] = out.get(tok, 0) + d
        return out

    def _use_ray(self, distributed: bool | None) -> bool:
        if distributed is not None:
            return distributed
        import ray
        return ray.is_initialized() and len(self.src_dirs) > 1

    def match(self, q: str, distributed: bool | None = None) -> np.ndarray:
        self._maybe_merge()
        if self.merged is not None:
            return self.merged.match(q)
        if self._use_ray(distributed):
            import ray
            parts = ray.get([_remote(_fed_match_source).remote(s, q)
                             for s in self.src_dirs])
        else:
            parts = [_fed_match_source(s, q, engine=e)
                     for s, e in zip(self.src_dirs, self.engines)]
        return np.sort(np.concatenate(parts))

    def bm25(self, q: str, k: int = 10,
             distributed: bool | None = None):
        """Exact global BM25 over the union of sources (fp64-identical
        to the merged index's exact path — tests assert it).

        Scoring is fanned out as one Ray task per source (two rounds:
        per-source dfs → global (N, avgdl, df) broadcast → per-source
        exact scoring + local top-k; the driver only merges ≤ k rows per
        source). ``distributed=None`` auto-selects: Ray tasks when Ray is
        up and there is more than one source, else the in-process loop
        (same code path per source either way). This replaces the
        round-2 driver-side term×source loop — the reference's
        merge-on-search serving story (search_cond.go:828-837) kept
        off-driver."""
        from .search import SearchEngine
        self._maybe_merge()
        if self.merged is not None:
            return self.merged.bm25(q, k)
        empty = (np.empty(0, np.uint64), np.empty(0, np.float64))
        if not self.ndocs:
            return empty
        use_ray = self._use_ray(distributed)
        if use_ray:
            import ray
            df_maps = ray.get([_remote(_fed_source_dfs).remote(s, q)
                               for s in self.src_dirs])
        else:
            df_maps = [_fed_source_dfs(s, q, engine=e)
                       for s, e in zip(self.src_dirs, self.engines)]
        gdf: dict[int, int] = {}
        for m in df_maps:
            for t, d in m.items():
                gdf[t] = gdf.get(t, 0) + d
        tids = sorted(t for t, d in gdf.items() if d > 0)
        if not tids:
            return empty
        if use_ray:
            import ray
            tops = ray.get([_remote(_fed_score_source).remote(
                s, tids, gdf, self.ndocs, self.avgdl, k)
                for s in self.src_dirs])
        else:
            tops = [_fed_score_source(s, tids, gdf, self.ndocs,
                                      self.avgdl, k, engine=e)
                    for s, e in zip(self.src_dirs, self.engines)]
        tops = [t for t in tops if len(t[0])]
        if not tops:
            return empty
        docs = np.concatenate([d for d, _ in tops])
        scores = np.concatenate([s for _, s in tops])
        return SearchEngine._topk(docs, scores, k)


def repartition_index(src_dir: str, out_dir: str, new_num_parts: int) -> dict:
    """Split/Merge analog: rewrite an index with a different partition
    count (term_id % new_P). Decode per old part, tag new part, shuffle by
    the new key via the same disk-partition layout the build uses."""
    st = read_stats(src_dir)
    out = IndexBuilder(out_dir, mode=st["mode"], num_parts=new_num_parts,
                       bucket_shift=st["bucket_shift"],
                       compression=st.get("compression", "lz4"))
    writer = SegmentWriter(out.segments_dir, out.bucket_shift,
                           compression=out.compression)
    old_parts = st["num_parts"]

    def rewrite_batch(batch: pa.Table) -> pa.Table:
        # one task per NEW part: gather matching terms from every old part
        outs = []
        for np_ in batch["p"].to_pylist():
            terms_l, docs_l, tfs_l, dls_l = [], [], [], []
            for op in range(old_parts):
                f = os.path.join(src_dir, "segments",
                                 f"part={op:05d}.parquet")
                if not os.path.exists(f):
                    continue
                tbl = pq.read_table(f)
                t, d, tf, dl = decode_segment_table(tbl)
                m = (t % np.uint64(new_num_parts)) == np.uint64(np_)
                if m.any():
                    terms_l.append(t[m])
                    docs_l.append(d[m])
                    tfs_l.append(tf[m])
                    dls_l.append(dl[m])
            if terms_l:
                postings = pa.table({
                    "term_id": pa.array(np.concatenate(terms_l), pa.uint64()),
                    "doc_id": pa.array(np.concatenate(docs_l), pa.uint64()),
                    "tf": pa.array(np.concatenate(tfs_l).astype(np.uint32),
                                   pa.uint32()),
                    "dl": pa.array(np.concatenate(dls_l).astype(np.uint32),
                                   pa.uint32()),
                })
            else:
                postings = pa.table({
                    "term_id": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.uint64()),
                    "tf": pa.array([], pa.uint32()),
                    "dl": pa.array([], pa.uint32())})
            outs.append(writer.encode_part(int(np_), postings))
        return pa.concat_tables(outs)

    todo = [p for p in range(new_num_parts) if p not in out._done_parts()]
    if todo:
        ray.data.from_items([{"p": p} for p in todo],
                            override_num_blocks=len(todo)
                            ).map_batches(rewrite_batch,
                                          batch_format="pyarrow",
                                          batch_size=1).take_all()
    from .build import _atomic_write_json
    _atomic_write_json(os.path.join(out.waves_dir, "wave=0000.json"),
                       {"wave": 0, "files": [f"repartition:{src_dir}"],
                        "n_docs": int(st["n_docs"])})
    return out.finalize()


def upsert_docs(index_dir: str, new_files: list[str], out_dir: str, *,
                id_col: str = "doc_id", old_files: list[str] | None = None,
                work_dir: str | None = None,
                keep_work: bool = False, **builder_kw) -> dict:
    """Re-crawl snapshot absorption: every doc id present in
    ``new_files`` REPLACES its previous version in ``index_dir``;
    unseen ids are plain inserts.  The result at ``out_dir`` is
    statistically identical to a fresh build over the latest-snapshot
    corpus (live df / n_docs / avgdl — not Lucene's stale-stats
    delete), because the composition is the one the module docstring
    prescribes:

    1. tombstone the incoming ids in the old index (idempotent,
       content-addressed commit — ``SearchEngine.delete_docs``),
    2. ``purge_tombstones`` → a clean old-minus-replaced index,
    3. build the new snapshot as its own index (same mode/num_parts/
       bucket_shift/compression, read from the old index's stats),
    4. ``merge_indexes`` of the now doc-disjoint pair.

    Every step is independently resumable (sidecar/rename protocol);
    re-running a crashed upsert converges.  Scale note: a purge
    rewrites every partition once per call, so batch re-crawl waves
    and upsert them together — per-document calls would be quadratic.

    ``old_files`` (the previous snapshot's parquet, id column only is
    read): with it, ``n_docs`` is exact even when a replaced doc had
    ZERO tokens — such docs have no postings, so the purge cannot see
    them and would leave them counted.  Without it, ``n_docs`` may
    overcount by the number of tokenless replaced docs (df, tf and
    total_tokens are exact either way).
    Reference parity: vfs-index has no update story at all (its docs
    are immutable (fileID, offset) records); this is the cluster
    engine's equivalent of a segment-merging upsert (Lucene
    updateDocument semantics, but with exact live statistics).
    """
    import shutil

    from .search import SearchEngine

    if os.path.exists(os.path.join(out_dir, "stats.json")):
        return read_stats(out_dir)
    st = read_stats(index_dir)
    ids_t = [pq.read_table(f, columns=[id_col], use_threads=False)
             for f in new_files]
    ids = pa.concat_tables(ids_t)[id_col].to_numpy(
        zero_copy_only=False).astype(np.uint64)
    SearchEngine(index_dir).delete_docs(ids)

    work = work_dir or (out_dir.rstrip("/") + "-work")
    purged = os.path.join(work, "purged")
    newidx = os.path.join(work, "new")
    if not os.path.exists(os.path.join(purged, "stats.json")):
        purge_tombstones(index_dir, purged)
    if not os.path.exists(os.path.join(newidx, "stats.json")):
        IndexBuilder(newidx, mode=st["mode"],
                     num_parts=int(st["num_parts"]),
                     bucket_shift=st["bucket_shift"],
                     compression=st.get("compression", "lz4"),
                     positions=bool(st.get("positions", False)),
                     id_col=id_col, **builder_kw).build(new_files)
    n_override = None
    if old_files is not None:
        old_t = [pq.read_table(f, columns=[id_col], use_threads=False)
                 for f in old_files]
        old_ids = np.unique(pa.concat_tables(old_t)[id_col].to_numpy(
            zero_copy_only=False).astype(np.uint64))
        uniq_new = np.unique(ids)
        pos = np.searchsorted(old_ids, uniq_new)
        pos = np.minimum(pos, max(len(old_ids) - 1, 0))
        n_exist = int((old_ids[pos] == uniq_new).sum()) if len(old_ids) \
            else 0
        n_new_rows = sum(len(t) for t in ids_t)
        n_override = int(st["n_docs"]) - n_exist + n_new_rows
    merged = merge_indexes([purged, newidx], out_dir,
                           n_docs_override=n_override)
    if not keep_work:
        shutil.rmtree(work, ignore_errors=True)
    return merged
