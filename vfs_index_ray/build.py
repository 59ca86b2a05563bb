"""Index build pipeline: pages parquet → posting-list segments + manifest.

Ray-Data-native re-expression of the reference's build lifecycle
(indexer.go Regist → column.go Update/WriteDirties → baseMergeIndex,
SURVEY §3.1):

  phase 1 (postings): read_parquet(pages, columns pruned — html never read)
      → map_batches(TokenizeStage actor pool, zero-copy Arrow)
      → write postings parquet per *wave* of input files, committed
        atomically (tmp dir + rename + sidecar JSON) — the analog of the
        reference's per-record write-files with atomic SafeRename publish
        (record.go:194-248, filelist.go:224-231), at a sane granularity.

  phase 2 (segments): read postings → part = term_id % P
      → groupby(part).map_groups(SegmentWriter) — THE build shuffle, the
        analog of the in-RAM merge groupby (column.go:449-545) except Ray's
        sort-based shuffle spills instead of holding it all in memory.
        Each group writes its own segment file atomically + sidecar
        manifest row, so a rerun skips committed partitions (resume — the
        reference's IsExist anti-join, record.go:46-82).

  finalize: stats.json (N, total tokens, avgdl) + manifest.parquet
        (per-partition lineage + metrics) assembled from sidecars.

Scale notes (100 TB / 10^12 docs): num_parts sizes the shuffle so one
partition's postings fit a worker (tens of thousands of parts at full
scale); bucket_shift chunks head-term posting lists into doc-range-disjoint
sub-lists (skew handling); the only driver-side materializations are
per-part manifest rows and scalar aggregates.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa

import pyarrow.parquet as pq
import ray.data

from . import BM25_B, BM25_K1, __version__
from .codec import encode_partition
from .stages.tokenize import AddPartColumn, TokenizeStage, tokenize_postings


def _atomic_write_json(path: str, obj: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


_MANIFEST_SCHEMA = pa.schema([
    ("part", pa.int32()), ("n_chunks", pa.int64()), ("n_terms", pa.int64()),
    ("n_postings", pa.int64()), ("n_tokens", pa.int64()),
    ("term_min", pa.uint64()), ("term_max", pa.uint64()),
    ("file", pa.string()), ("status", pa.string()),
    ("inputs", pa.list_(pa.string())), ("encode_seconds", pa.float64()),
    ("output_bytes", pa.int64()),
])


def _manifest_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=_MANIFEST_SCHEMA)


def _dedup_sorted_postings(terms, docs, tfs, dls):
    """Collapse duplicate (term, doc) rows (tf summed, dl maxed).

    Inputs sorted by (term, doc). Duplicates only occur if the same doc_id
    appears in multiple input batches/waves (e.g. re-crawled url) — the
    build is tolerant; true dedup is a separate operator (functions.dedup).
    """
    n = len(terms)
    if n == 0:
        return terms, docs, tfs, dls
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (terms[1:] != terms[:-1]) | (docs[1:] != docs[:-1])
    if new.all():
        return terms, docs, tfs, dls
    starts = np.flatnonzero(new)
    tfs2 = np.add.reduceat(tfs, starts)
    dls2 = np.maximum.reduceat(dls, starts)
    return terms[starts], docs[starts], tfs2, dls2


class SegmentWriter:
    """Encodes one hash partition of postings → one segment file.

    Idempotent: deterministic content (lexsort + dedup), atomic publish
    (tmp + rename), sidecar JSON row marks the partition committed.
    Used as a per-part task over the disk-partitioned postings (phase 2);
    ``__call__`` also accepts an in-memory group table (merge path, tests).
    """

    # ~1 MB of chunk-row payload per parquet row group: a term point
    # lookup decompresses one group, so the group byte size — not a
    # fixed row count — bounds read amplification. Fat rows (unbucketed
    # head terms, ~150 KB/chunk) get few rows per group; skinny bucketed
    # chunks keep the 4096 cap. Measured on a 1.6M-doc index: head-term
    # pushdown read 88→31 ms together with lz4 (below).
    ROW_GROUP_TARGET_BYTES = 1 << 20

    def __init__(self, segments_dir: str, bucket_shift: int,
                 lineage: list[str] | None = None,
                 block_size: int | None = None,
                 compression: str = "lz4"):
        from .codec import BLOCK
        self.segments_dir = segments_dir
        self.bucket_shift = bucket_shift
        self.lineage = lineage or []
        self.block_size = int(block_size or BLOCK)
        # lz4 over zstd: the varint payload is already entropy-dense, so
        # zstd buys only ~12% size but costs ~2x on every query-path
        # read (measured, BASELINE.md round-3 late)
        self.compression = compression

    def encode_part(self, part: int, postings: pa.Table) -> pa.Table:
        import time
        t_start = time.perf_counter()
        terms = postings["term_id"].to_numpy(zero_copy_only=False
                                             ).astype(np.uint64)
        docs = postings["doc_id"].to_numpy(zero_copy_only=False
                                           ).astype(np.uint64)
        tfs = postings["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dls = postings["dl"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((docs, terms))
        terms, docs, tfs, dls = (terms[order], docs[order],
                                 tfs[order], dls[order])
        terms, docs, tfs, dls = _dedup_sorted_postings(terms, docs, tfs, dls)
        seg = encode_partition(terms, docs, tfs, dls, self.bucket_shift,
                               block_size=self.block_size)

        final = os.path.join(self.segments_dir, f"part={part:05d}.parquet")
        tmp = os.path.join(self.segments_dir, f".tmp.part={part:05d}.parquet")
        # byte-targeted row groups (see ROW_GROUP_TARGET_BYTES)
        avg_row = max(seg.nbytes / max(seg.num_rows, 1), 1.0)
        rg = int(min(4096, max(16, self.ROW_GROUP_TARGET_BYTES // avg_row)))
        pq.write_table(seg, tmp, compression=self.compression,
                       row_group_size=rg)
        # term bloom filter beside the segment: absent-term lookups skip
        # the parquet read entirely (segment-level negative cache).
        # Published BEFORE the segment: a concurrent reader pairing the
        # new bloom with the old segment only over-approximates (extra
        # parquet read); the reverse order could pair a stale bloom with
        # the new segment and silently answer df=0 for a present term.
        from .codec import bloom_build
        bloom_tmp = os.path.join(self.segments_dir,
                                 f".tmp.part={part:05d}.bloom")
        with open(bloom_tmp, "wb") as f:
            f.write(bloom_build(terms, assume_sorted=True))
        os.replace(bloom_tmp, os.path.join(self.segments_dir,
                                           f"part={part:05d}.bloom"))
        os.replace(tmp, final)
        row = {
            "part": part,
            "n_chunks": seg.num_rows,
            # terms are sorted here: distinct count = boundary count
            # (np.unique would re-sort 10^6 values per part, which the
            # 32-way-concurrent encode amplifies via memory bandwidth)
            "n_terms": int(1 + np.count_nonzero(terms[1:] != terms[:-1])
                           if len(terms) else 0),
            "n_postings": int(len(terms)),
            "n_tokens": int(tfs.sum()),
            "term_min": int(terms.min()) if len(terms) else 0,
            "term_max": int(terms.max()) if len(terms) else 0,
            "file": final,
            "status": "committed",
            # per-partition lineage + metrics (north_rule)
            "inputs": list(self.lineage),
            "encode_seconds": round(time.perf_counter() - t_start, 4),
            "output_bytes": os.path.getsize(final),
        }
        _atomic_write_json(os.path.join(self.segments_dir,
                                        f"part={part:05d}.json"), row)
        return _manifest_table([row])

    def __call__(self, group: pa.Table) -> pa.Table:
        """Group-table form (merge path / tests): part from the column."""
        part = int(group["part"][0].as_py())
        return self.encode_part(part, group)


class IndexBuilder:
    def __init__(self, index_dir: str, *, mode: str = "word",
                 num_parts: int = 16, bucket_shift: int = 64,
                 text_col: str = "text", id_col: str | None = "doc_id",
                 html_col: str | None = None,
                 url_col: str = "url", tokenize_concurrency=None,
                 tokenize_batch_size: int | None = 4096,
                 tokenize_actors: bool = False,
                 scratch_dir: str | None = None,
                 positions: bool = False,
                 block_size: int | None = None,
                 compression: str = "lz4"):
        self.index_dir = index_dir
        self.compression = compression
        self.mode = mode
        self.num_parts = num_parts
        self.bucket_shift = bucket_shift
        self.text_col = text_col
        self.id_col = id_col
        # html_col: build straight from crawled pages — a vectorized
        # extraction stage (functions/extract.py) derives text_col from
        # the raw html before tokenization, so the pre-extracted text
        # column need not exist in the input at all.
        self.html_col = html_col
        self.url_col = url_col
        self.tokenize_concurrency = tokenize_concurrency
        self.tokenize_batch_size = tokenize_batch_size
        self.tokenize_actors = tokenize_actors
        from .codec import BLOCK
        # skip-block granularity: smaller blocks → tighter block-max
        # bounds (better blockmax pruning) at more skip entries/bytes
        self.block_size = int(block_size or BLOCK)
        # positions=True (word mode): token ordinals ride through the
        # shuffle as a delta+varint binary column and land in parallel
        # positions/part=N.parquet files — token-adjacency phrase queries
        # then need no corpus access. Segment codec is untouched.
        self.positions = positions
        # Shuffle spill (postings) is the build's scratch — the
        # Spark-local-dirs analog. Single node: a local path (default
        # under index_dir; /dev/shm for speed). Multi-node cluster:
        # EVERY node must read each part's postings, so scratch_dir
        # must be shared storage — pass an ``s3://…``/``file://…`` URI
        # or a ``(pyarrow_fs, path)`` tuple (spillfs.resolve_location;
        # no unique subdir — waves are RESUMABLE state reused across
        # runs, commit is the wave sidecar). Losing scratch only costs
        # recomputing uncommitted waves (sidecars are validated
        # against the postings dir).
        from .spillfs import resolve_location
        import pyarrow.fs as pafs
        self.scratch_fs, scratch_root = resolve_location(
            scratch_dir, default_path=index_dir)
        self.scratch_local = isinstance(self.scratch_fs,
                                        pafs.LocalFileSystem)
        self.postings_dir = scratch_root.rstrip("/") + "/postings"
        self.segments_dir = os.path.join(index_dir, "segments")
        self.waves_dir = os.path.join(index_dir, "waves")
        self.scratch_fs.create_dir(self.postings_dir, recursive=True)
        for d in (self.segments_dir, self.waves_dir):
            os.makedirs(d, exist_ok=True)

    # ----- scratch-fs helpers (postings may live on any pyarrow fs) ----
    def _scratch_isdir(self, path: str) -> bool:
        import pyarrow.fs as pafs
        return self.scratch_fs.get_file_info(path).type == \
            pafs.FileType.Directory

    def _scratch_subdirs(self, path: str, prefix: str) -> list[str]:
        import pyarrow.fs as pafs
        sel = pafs.FileSelector(path, allow_not_found=True)
        return sorted(fi.path for fi in self.scratch_fs.get_file_info(sel)
                      if fi.type == pafs.FileType.Directory
                      and fi.base_name.startswith(prefix))

    # ----- phase 1: tokenize → postings (per wave, resumable) ------------
    def _wave_done(self, wave: int) -> bool:
        # committed = sidecar exists AND the postings it points at survive
        # (scratch may be ephemeral)
        return (os.path.exists(os.path.join(self.waves_dir,
                                            f"wave={wave:04d}.json"))
                and self._scratch_isdir(
                    f"{self.postings_dir}/wave={wave:04d}"))

    def build_postings_wave(self, wave: int, files: list[str]) -> dict:
        if self._wave_done(wave):
            with open(os.path.join(self.waves_dir, f"wave={wave:04d}.json")) as f:
                return json.load(f)
        is_parquet = all(f.endswith(".parquet") for f in files)
        if is_parquet:
            schema_names = pq.read_schema(files[0]).names
        else:
            from .sinks import read_corpus
            schema_names = read_corpus([files[0]]).schema().names
        cols = [self.html_col] if self.html_col else [self.text_col]
        if self.id_col and self.id_col in schema_names:
            cols.append(self.id_col)
        else:
            cols.append(self.url_col)
        # block count = cluster CPUs (not Ray's default ~200): each write
        # task emits one file per part it sees, so fewer/larger blocks keep
        # the per-part file count (and phase-2 open() overhead) bounded
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nblocks = max(len(files), ncpu)
        if is_parquet:
            ds = ray.data.read_parquet(files, columns=cols,
                                       override_num_blocks=nblocks)
            n_docs = sum(pq.read_metadata(f).num_rows for f in files)
        else:
            # json/csv ingestion (reference S1-S5 decoder registry
            # analog). Materialize once: count() and the tokenize pass
            # would otherwise EACH execute the decode read (a 2x read of
            # the raw corpus); cached blocks spill via the object store
            from .sinks import read_corpus
            ds = read_corpus(files, columns=cols).materialize()
            n_docs = ds.count()
        if self.html_col:
            from .functions.extract import extract_text_batch
            ds = ds.map_batches(extract_text_batch, batch_format="pyarrow",
                                zero_copy_batch=True,
                                fn_kwargs=dict(html_col=self.html_col,
                                               text_col=self.text_col))
        fn_kwargs = dict(mode=self.mode, text_col=self.text_col,
                         id_col=self.id_col, url_col=self.url_col,
                         positions=self.positions)
        if self.tokenize_actors:
            # actor pool: for stateful tokenizer configs (dict shard etc.)
            conc = self.tokenize_concurrency
            if conc is None:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                conc = (1, max(2, (ncpu * 3) // 4))
            post = ds.map_batches(TokenizeStage,
                                  batch_format="pyarrow",
                                  batch_size=self.tokenize_batch_size,
                                  fn_constructor_kwargs=fn_kwargs,
                                  zero_copy_batch=True, concurrency=conc)
        else:
            # stateless tasks: no actor startup, elastic across the cluster
            post = ds.map_batches(tokenize_postings,
                                  batch_format="pyarrow",
                                  batch_size=self.tokenize_batch_size,
                                  fn_kwargs=fn_kwargs,
                                  zero_copy_batch=True)
        post = post.map_batches(AddPartColumn(self.num_parts),
                                batch_format="pyarrow", zero_copy_batch=True)

        # THE shuffle, as a hive-partitioned write: each write task splits
        # its blocks by part (hash of term), so phase 2 reads each part's
        # postings directly — no sort-based all-to-all exchange. (Measured:
        # Ray's groupby sort+map_groups on the same data ran the per-group
        # encode with almost no parallelism; this layout also makes the
        # shuffle itself restartable — it lives on disk, per wave.)
        final = f"{self.postings_dir}/wave={wave:04d}"
        if self.scratch_local:
            # local fs: tmp + atomic rename
            tmp = f"{self.postings_dir}/.tmp.wave={wave:04d}"
            if os.path.exists(tmp):
                import shutil
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)  # empty input: no files
            post.write_parquet(tmp, partition_cols=["part"])
            os.replace(tmp, final)
        else:
            # object stores have no atomic dir rename: the wave sidecar
            # (written below, after the data) is the commit marker —
            # _wave_done requires BOTH — so clear any uncommitted
            # leftover and write to the final path directly
            try:
                self.scratch_fs.delete_dir(final)
            except (FileNotFoundError, OSError):
                pass
            self.scratch_fs.create_dir(final, recursive=True)
            post.write_parquet(final, filesystem=self.scratch_fs,
                               partition_cols=["part"])
        # n_tokens is NOT computed here: sum(tf) falls out of the segment
        # phase for free (tf_sum per chunk → part sidecars → finalize)
        meta = {"wave": wave, "files": list(files), "n_docs": int(n_docs)}
        _atomic_write_json(os.path.join(self.waves_dir, f"wave={wave:04d}.json"),
                           meta)
        return meta

    # ----- phase 2: shuffle → segments (per part, resumable) -------------
    def _done_parts(self) -> set[int]:
        out = set()
        for name in os.listdir(self.segments_dir):
            if name.startswith("part=") and name.endswith(".json"):
                out.add(int(name[len("part="):-len(".json")]))
        return out

    def build_segments(self) -> list[dict]:
        # every committed wave sidecar must still have its postings on
        # scratch — otherwise the segments would silently drop those
        # waves' docs while finalize() still counts their sidecars
        missing = [name for name in sorted(os.listdir(self.waves_dir))
                   if name.startswith("wave=") and name.endswith(".json")
                   and not self._wave_done(
                       int(name[len("wave="):-len(".json")]))]
        if missing:
            raise RuntimeError(
                f"wave postings lost from scratch for {missing}; re-run "
                "build()/absorb() (they re-tokenize lost waves) or point "
                "scratch_dir at durable storage")
        wave_dirs = self._scratch_subdirs(self.postings_dir, "wave=")
        if not wave_dirs:
            raise RuntimeError("no committed postings waves")
        done = self._done_parts()
        todo = [p for p in range(self.num_parts) if p not in done]
        if not todo:
            return [self._read_part_manifest(p) for p in sorted(done)]

        writer = SegmentWriter(self.segments_dir, self.bucket_shift,
                               lineage=[os.path.basename(w)
                                        for w in wave_dirs],
                               block_size=self.block_size,
                               compression=self.compression)

        want_pos = self.positions
        pos_dir = os.path.join(self.index_dir, "positions")
        pos_codec = self.compression  # plain local: keep the Ray
        if want_pos:                  # closure free of `self`
            os.makedirs(pos_dir, exist_ok=True)

        sfs = self.scratch_fs  # picklable: captured by the encode tasks

        def encode_one(batch: pa.Table) -> pa.Table:
            # one task per part: gather this part's postings from every
            # wave (hive layout wave=*/part=p/), encode, publish.
            # use_threads=False: each task owns ONE cpu — 64 concurrent
            # tasks each spinning up Arrow's full thread pool thrash the
            # node (threads = tasks × cores without it)
            import pyarrow.fs as pafs
            cols = ["term_id", "doc_id", "tf", "dl"] + \
                (["pos"] if want_pos else [])
            outs = []
            for p in batch["p"].to_pylist():
                tables = []
                for wd in wave_dirs:
                    pdir = f"{wd}/part={p}"
                    if sfs.get_file_info(pdir).type == \
                            pafs.FileType.Directory:
                        tables.append(pq.read_table(
                            pdir, columns=cols, filesystem=sfs,
                            use_threads=False))
                merged = (pa.concat_tables(tables) if tables
                          else pa.table({
                              "term_id": pa.array([], pa.uint64()),
                              "doc_id": pa.array([], pa.uint64()),
                              "tf": pa.array([], pa.uint32()),
                              "dl": pa.array([], pa.uint32())}))
                if want_pos and "pos" in merged.column_names:
                    # positions land in a parallel per-part file, sorted
                    # by (term, doc) for pushdown reads; the segment
                    # codec never sees them
                    t = merged["term_id"].to_numpy(zero_copy_only=False)
                    d = merged["doc_id"].to_numpy(zero_copy_only=False)
                    order = np.lexsort((d, t))
                    ptab = merged.select(["term_id", "doc_id", "pos"]
                                         ).take(order)
                    tmp_p = os.path.join(pos_dir,
                                         f".tmp.part={int(p):05d}.parquet")
                    # small row groups: (term, doc)-sorted rows + doc_id
                    # statistics make candidate-scoped positional reads
                    # prune sharply (a head term's list spans many
                    # groups, and a phrase with few candidates reads
                    # only the groups containing them)
                    # same codec as the segments (lz4 default: 18%
                    # faster term-scoped reads for 22% more bytes —
                    # the serving index prefers read speed)
                    pq.write_table(ptab, tmp_p,
                                   compression=pos_codec,
                                   row_group_size=32768)
                    os.replace(tmp_p, os.path.join(
                        pos_dir, f"part={int(p):05d}.parquet"))
                    merged = merged.drop(["pos"])
                outs.append(writer.encode_part(int(p), merged))
            return pa.concat_tables(outs)

        # LPT order: launch the biggest partitions first so the Zipf-head
        # part (every doc contains the head terms) doesn't become the tail
        # straggler of the whole phase
        def _part_bytes(p: int) -> int:
            import pyarrow.fs as pafs
            total = 0
            for wd in wave_dirs:
                sel = pafs.FileSelector(f"{wd}/part={p}",
                                        allow_not_found=True)
                total += sum(fi.size or 0
                             for fi in sfs.get_file_info(sel)
                             if fi.type == pafs.FileType.File)
            return total

        todo.sort(key=_part_bytes, reverse=True)
        parts_ds = ray.data.from_items([{"p": p} for p in todo],
                                       override_num_blocks=len(todo))
        rows = parts_ds.map_batches(encode_one, batch_format="pyarrow",
                                    batch_size=1).take_all()
        if done:
            rows = rows + [self._read_part_manifest(p) for p in sorted(done)]
        return rows

    def _read_part_manifest(self, part: int) -> dict:
        with open(os.path.join(self.segments_dir, f"part={part:05d}.json")) as f:
            return json.load(f)

    # ----- finalize: stats + manifest ------------------------------------
    def finalize(self) -> dict:
        n_docs = n_tokens = 0
        waves = []
        for name in sorted(os.listdir(self.waves_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.waves_dir, name)) as f:
                    w = json.load(f)
                waves.append(w)
                n_docs += w["n_docs"]
        part_rows = [self._read_part_manifest(p)
                     for p in sorted(self._done_parts())]
        n_tokens = sum(r.get("n_tokens", 0) for r in part_rows)
        stats = {
            "version": __version__, "mode": self.mode,
            "num_parts": self.num_parts, "bucket_shift": self.bucket_shift,
            "n_docs": n_docs, "total_tokens": n_tokens,
            "block_size": self.block_size,
            "compression": self.compression,
            "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
            "k1": BM25_K1, "b": BM25_B, "positions": self.positions,
            "waves": [w["wave"] for w in waves],
        }
        _atomic_write_json(os.path.join(self.index_dir, "stats.json"), stats)
        rows = part_rows
        if rows:
            manifest = _manifest_table(rows)
            pq.write_table(manifest,
                           os.path.join(self.index_dir, "manifest.parquet"))
        return stats

    # ----- incremental absorb --------------------------------------------
    def absorb(self, new_files: list[str] | str) -> dict:
        """Incremental maintenance (the reference's Regist-picks-up-new-
        files story, indexer.go:77-93): tokenize ONLY the new files as a
        fresh wave, then re-encode segments from all waves. Existing
        waves' postings are reused (no re-tokenize); segment re-encode is
        the merge step, resumable per partition like any build."""
        if isinstance(new_files, str):
            new_files = [new_files]
        # scratch_dir may be ephemeral (/dev/shm): any committed wave whose
        # postings dir is gone must be re-tokenized BEFORE segments are
        # rebuilt, or the new segments silently drop those waves' docs
        # while finalize() still counts their sidecars (corrupting n_docs/
        # avgdl and every BM25 score)
        next_wave = 0
        done_files: set[str] = set()
        for name in sorted(os.listdir(self.waves_dir)):
            if name.startswith("wave=") and name.endswith(".json"):
                w = int(name[len("wave="):-len(".json")])
                next_wave = max(next_wave, w + 1)
                with open(os.path.join(self.waves_dir, name)) as f:
                    meta = json.load(f)
                if self._wave_done(w):
                    done_files.update(meta["files"])
                else:
                    os.remove(os.path.join(self.waves_dir, name))
                    self.build_postings_wave(w, meta["files"])
                    done_files.update(meta["files"])
        # crash-idempotence (file-level dirty filter, the reference's
        # Regist-skips-known-files behavior): a file whose wave sidecar
        # already committed must NOT be re-ingested when an interrupted
        # absorb is re-run — without this, the retry double-counts its
        # docs (found by tests/test_chaos.py mid-absorb kill). File
        # identity is the path string as recorded in the sidecar.
        new_files = [f for f in new_files if f not in done_files]
        if new_files:
            self.build_postings_wave(next_wave, new_files)
            # invalidate committed partitions: their inputs changed
            for name in os.listdir(self.segments_dir):
                path = os.path.join(self.segments_dir, name)
                os.remove(path)
        # (re-)encode whatever is missing: after a mid-absorb crash the
        # wave may already be committed with only some segments rebuilt
        self.build_segments()
        return self.finalize()

    # ----- one-call build -------------------------------------------------
    def build(self, input_files: list[str] | str, waves: int = 1) -> dict:
        if isinstance(input_files, str):
            input_files = [input_files]
        if len(self._done_parts()) == self.num_parts:
            return self.finalize()  # fully committed; scratch may be gone
        chunks = np.array_split(np.array(input_files, dtype=object),
                                min(waves, len(input_files)))
        for i, chunk in enumerate(chunks):
            self.build_postings_wave(i, [str(f) for f in chunk])
        self.build_segments()
        return self.finalize()


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def verify_index(index_dir: str) -> dict:
    """Integrity audit for a committed index (the ops tool a 100 TB
    deployment runs after copy/restore): every partition's segment file
    must exist with the byte size its sidecar recorded, every part in
    [0, num_parts) must be committed, wave sidecars must sum to
    stats.n_docs, and part sidecars to stats.total_tokens. Returns
    {"ok": bool, "errors": [...], "parts": N, "n_docs": N}."""
    errors: list[str] = []
    stats = read_stats(index_dir)
    seg_dir = os.path.join(index_dir, "segments")
    for part in range(stats["num_parts"]):
        side = os.path.join(seg_dir, f"part={part:05d}.json")
        if not os.path.exists(side):
            errors.append(f"missing sidecar part={part}")
            continue
        with open(side) as f:
            row = json.load(f)
        f_path = os.path.join(seg_dir, f"part={part:05d}.parquet")
        if not os.path.exists(f_path):
            errors.append(f"missing segment file part={part}")
        elif os.path.getsize(f_path) != row.get("output_bytes"):
            errors.append(
                f"size mismatch part={part}: "
                f"{os.path.getsize(f_path)} != {row.get('output_bytes')}")
    waves_dir = os.path.join(index_dir, "waves")
    n_docs = sum(json.load(open(os.path.join(waves_dir, n)))["n_docs"]
                 for n in sorted(os.listdir(waves_dir))
                 if n.endswith(".json")) if os.path.isdir(waves_dir) else 0
    if n_docs != stats["n_docs"]:
        errors.append(f"wave n_docs {n_docs} != stats {stats['n_docs']}")
    tok = 0
    for part in range(stats["num_parts"]):
        side = os.path.join(seg_dir, f"part={part:05d}.json")
        if os.path.exists(side):
            with open(side) as f:
                tok += json.load(f).get("n_tokens", 0)
    if tok != stats["total_tokens"]:
        errors.append(
            f"token sum {tok} != stats {stats['total_tokens']}")
    return {"ok": not errors, "errors": errors,
            "parts": stats["num_parts"], "n_docs": stats["n_docs"]}
