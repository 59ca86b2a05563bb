"""Distributed relational equi-joins (SURVEY §2.5 extension).

Reference parity: vfs-index's joins are index-mediated point / semi
joins (info_reader.go record fetch; search.go query-to-record lookup) —
re-expressed here as ``fetch_rows`` / ``search_and_fetch``
(search.py). A *general* two-table equi-join over large inputs is part
of the beyond-reference relational surface the brief asks for. Two
physical shapes, chosen by the size of the build side:

- ``broadcast_join``: the small side is materialized once, shipped via
  ``ray.put`` (one copy per node, never per batch), and probed with
  one Arrow/Acero hash-join kernel call per probe batch. No shuffle at
  all — the 100-TB shape whenever one side fits in a worker heap.

- ``hash_join``: both sides big — co-partition the two datasets by
  ``hash(key) % P`` via the hive-partitioned parquet spill (the
  build.py postings-shuffle pattern; Ray Data's pull-based sort
  shuffle is measured in-repo to anti-scale at high core counts),
  then run ONE single-threaded Acero hash join per partition as
  independent Ray tasks.  An optional ``post`` kernel runs on each
  joined partition before results leave the task — when the
  downstream grouping key is the join key, co-partitioning makes a
  per-partition aggregate exact with no further shuffle (used by the
  TPC-H Q3-shape pipeline in pipelines/queries.py).

Hashing is only ever the partition key — equality is decided by the
join kernel on the raw values, so hash collisions cannot fabricate
matches.  Null keys are supported with ANSI-SQL semantics (decided by
Acero, differential-tested vs DuckDB in tests/test_joins.py): a null
key matches nothing — inner/semi drop the row, left outer emits it
null-extended, anti keeps it.  For partitioning, nulls hash like a
sentinel (0 / empty string) so all null-key rows co-locate; since
equality is decided on raw values, the sentinel collision cannot
fabricate matches.

Multi-node note (same assumption as the build.py postings shuffle,
README "cluster layout"): the spill directory defaults to /tmp for
single-node runs; on a real cluster pass ``spill_dir`` on storage
every node can read (NFS / object store via pyarrow fs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _key_hash64(arr) -> np.ndarray:
    """uint64 key hashes for an int or string key array: splitmix64
    finalizer for integers, FNV-1a for strings — both sides of a join
    must (and do) use the identical function.  Nulls hash like a
    sentinel (0 / empty string); callers that care mask them via the
    array's validity."""
    from ..hashing import fnv1a64_tokens

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        if arr.null_count:
            # null -> sentinel (to_numpy would yield float64 + NaN,
            # and NaN->uint64 is undefined); equality is decided by
            # the join kernel, so a sentinel collision cannot
            # fabricate matches
            arr = arr.fill_null(0)
        h = arr.cast(pa.int64()).to_numpy(zero_copy_only=False
                                          ).astype(np.uint64)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))
    return fnv1a64_tokens(arr)


def _part_codes(arr, num_parts: int) -> np.ndarray:
    """int32 partition codes from ``_key_hash64`` (null-key rows
    co-locate on the sentinel partition)."""
    return (_key_hash64(arr) % np.uint64(num_parts)).astype(np.int32)


def _norm_keys(on) -> list[str]:
    """Normalize a join-key spec (str or list of str) to a list."""
    return [on] if isinstance(on, str) else list(on)


def _keys_hash64(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Combined uint64 hash over one or more key columns: per-column
    ``_key_hash64`` folded FNV-style (order-sensitive, so both sides
    must list their key columns in corresponding order — they do, by
    the pairwise ``left_on``/``right_on`` contract)."""
    h = _key_hash64(t[cols[0]])
    for c in cols[1:]:
        h = (h * np.uint64(0x100000001B3)) ^ _key_hash64(t[c])
    return h


def _part_codes_multi(t: pa.Table, cols: list[str],
                      num_parts: int) -> np.ndarray:
    return (_keys_hash64(t, cols) % np.uint64(num_parts)
            ).astype(np.int32)


# per-partition spill byte target (parquet-encoded): one co-partition
# (left + right slice) is loaded whole by a single 1-CPU task, so the
# partition COUNT must grow with the data, not stay pinned to the CPU
# count — at 100x input a CPU-count partitioning is an OOM cliff.
# Parallelism still has a CPU-count floor for small inputs.
PART_TARGET_BYTES = 64 * 1024 * 1024


def _size_based_parts(dss, *, target_bytes: int = PART_TARGET_BYTES,
                      ) -> int:
    """Partition count from the datasets' metadata size estimates:
    max(cluster-CPU floor, ceil(total_bytes / target_bytes))."""
    import ray

    total = 0
    for d in dss:
        try:
            total += d.size_bytes() or 0
        except Exception:  # noqa: BLE001
            pass
    floor = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return max(floor, -(-total // target_bytes))


def _join(lt: pa.Table, rt: pa.Table, left_on, right_on, how: str,
          left_suffix, right_suffix) -> pa.Table:
    """One single-threaded Acero hash join (runs inside concurrent Ray
    tasks — a thread pool per task would oversubscribe the host)."""
    return lt.join(rt, keys=left_on, right_keys=right_on, join_type=how,
                   left_suffix=left_suffix, right_suffix=right_suffix,
                   use_threads=False)


def broadcast_join(left_ds, right: pa.Table, *, left_on, right_on=None,
                   how: str = "inner", left_suffix=None,
                   right_suffix="_r"):
    """Join a Dataset against a SMALL in-memory Arrow table: the table
    ships once via ``ray.put``; each probe batch runs one Acero hash
    join. Returns a Dataset (streaming — no materialization).
    "full outer" is rejected: a per-batch probe would re-emit the
    right side's unmatched rows once per batch (use hash_join)."""
    import ray

    if how == "full outer":
        raise ValueError("broadcast_join cannot run a full outer join"
                         " (right-unmatched rows would duplicate per"
                         " probe batch); use hash_join")
    right_on = right_on or left_on
    right = right.combine_chunks()
    ref = ray.put(right)

    def probe(batch: pa.Table) -> pa.Table:
        return _join(batch, ray.get(ref), left_on, right_on, how,
                     left_suffix, right_suffix)

    return left_ds.map_batches(probe, batch_format="pyarrow",
                               zero_copy_batch=True)


# ---- Bloom-filter join prefilter -----------------------------------
#
# The 100-TB shuffle reducer for selective inner/semi joins: build a
# bit-array sketch of the BUILD side's keys (one streaming pass, tiny
# mergeable partials), broadcast it once, and drop probe rows that
# provably cannot match BEFORE they are spilled/shuffled.  False
# positives pass through to the exact Acero join, so results are
# bit-identical with the filter on or off — only the spilled probe
# volume changes.  Default m=2^23 bits (1 MiB): ~2% FPR at 1M distinct
# build keys with k=4 probes; size m to ~8-10 bits per expected
# distinct key.

_BLOOM_SEED = np.uint64(0x9E3779B97F4A7C15)


def _bloom_h2(h1: np.ndarray) -> np.ndarray:
    """Second, odd-valued hash stream for double hashing."""
    h = (h1 ^ _BLOOM_SEED) * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(29))
    return h | np.uint64(1)


def build_key_bloom(ds, on, *, m_bits: int = 1 << 23,
                    k: int = 4) -> dict:
    """One streaming pass over the key column(s) -> a Bloom filter
    dict ``{"words": uint64[m/64], "m_bits", "k"}``.  ``on`` is a
    column name or list (multi-column keys hash with the join's
    ``_keys_hash64`` fold).  Each batch sets bits in a local word
    array shipped back as one binary blob; the driver OR-merges
    (order-free).  Rows with ANY null key column are skipped: a null
    never equals anything, so inner/semi probes may drop them too."""
    import ray

    cols = _norm_keys(on)
    m = int(m_bits)
    if m % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        valid = pc.is_valid(t[cols[0]])
        for c in cols[1:]:
            valid = pc.and_(valid, pc.is_valid(t[c]))
        t = t.filter(valid)
        words = np.zeros(m // 64, np.uint64)
        if t.num_rows:
            h1 = _keys_hash64(t, cols)
            h2 = _bloom_h2(h1)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(
                    words, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           pa.large_binary())})

    out = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    words = np.zeros(m // 64, np.uint64)
    for t in ray.get(out.to_arrow_refs()):
        for blob in t["bloom"].to_pylist():
            words |= np.frombuffer(blob, np.uint64)
    return {"words": words, "m_bits": m, "k": k}


def bloom_filter_keys(ds, bloom: dict, on, *, invert: bool = False):
    """Filter ``ds`` to rows whose key(s) MAY be in the bloom (plus
    no null key column): the inner/semi-join prefilter.  The bloom
    words ship once via ``ray.put``; each batch is k vectorized
    bit-gathers.  ``invert=True`` keeps the complement — rows that
    PROVABLY have no match (bloom miss or a null key column): the
    anti-join bypass set."""
    import ray

    cols = _norm_keys(on)
    m = np.uint64(bloom["m_bits"])
    k = bloom["k"]
    ref = ray.put(bloom["words"])

    def probe(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        words = ray.get(ref)
        h1 = _keys_hash64(t, cols)
        h2 = _bloom_h2(h1)
        valid = pc.is_valid(t[cols[0]])
        for c in cols[1:]:
            valid = pc.and_(valid, pc.is_valid(t[c]))
        ok = valid.combine_chunks().to_numpy(zero_copy_only=False
                                             ).astype(bool)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % m
            bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            ok &= bit.astype(bool)
        if invert:
            ok = ~ok
        return t.filter(pa.array(ok))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def co_partition_apply(left_ds, right_ds, *, left_on, right_on=None,
                       kernel=None, num_parts: int | None = None,
                       skip_missing_right: bool = False,
                       include_missing_left: bool = False,
                       salt: int = 1, salt_keys=None,
                       spill_dir: str | None = None,
                       part_target_bytes: int = PART_TARGET_BYTES):
    """Co-partition two Datasets by ``hash(key) % P`` via the
    hive-partitioned parquet spill (partition column consumed by the
    layout), then run ``kernel(left_part, right_part) -> Table`` once
    per partition as independent Ray tasks; results come back as
    object-store Arrow refs (``ray.data.from_arrow_refs``) and never
    pass through the driver.  A partition missing on the right side
    passes an empty right table (or is skipped entirely with
    ``skip_missing_right=True`` — the inner-join case).  This is the
    two-sided generalization of the build.py postings-shuffle pattern;
    ``hash_join`` instantiates it with an Acero join kernel, and
    corpus-rewrite ops (functions/linededup.py) with a rebuild kernel.
    ``include_missing_left=True`` (the full-outer case) additionally
    runs the kernel on right partitions the left side never touched,
    passing an empty LEFT table — incompatible with ``salt`` > 1
    (hot right rows replicate across subparts and their unmatched
    null-extended copies would duplicate).

    ``spill_dir`` is any spec ``spillfs.open_spill`` accepts (None,
    local path, ``s3://…``/``file://…`` URI, or ``(pyarrow_fs, path)``)
    — a unique run-scoped subdirectory is always created inside it, so
    a reused cluster spill root never mixes a prior run's stale
    partition files into this run's results.

    ``salt`` > 1 with ``salt_keys`` (the known hot probe keys) is the
    skew mitigation: rows whose key is in ``salt_keys`` spread
    round-robin across ``salt`` subparts on the LEFT and replicate
    into every subpart on the RIGHT; all other rows stay in subpart
    0, which also receives one copy of the hot rows — so every left
    row still sees its key's full right partition and join-type
    kernels stay exact.  Replication cost is |hot right rows| ×
    salt, not the whole build side (measured: whole-side replication
    costs more than the straggler it saves, tools/perf_joins.py).
    Without ``salt_keys``, ``salt`` > 1 spreads EVERY left row and
    replicates the whole right side — only for A/B measurement.
    Kernels that AGGREGATE by key see partial groups per subpart, so
    a salted ``post`` must be merge-aware (or merge downstream).
    """
    import ray
    import ray.data

    right_on = right_on or left_on
    lcols, rcols = _norm_keys(left_on), _norm_keys(right_on)
    if len(lcols) != len(rcols):
        raise ValueError("left_on/right_on must pair up")
    if kernel is None:
        raise ValueError("co_partition_apply requires a kernel")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and len(lcols) > 1:
        raise ValueError("salting supports single-column keys only")
    if salt > 1 and include_missing_left:
        raise ValueError("salt > 1 replicates hot right rows across "
                         "subparts — incompatible with "
                         "include_missing_left (full outer)")
    if num_parts is None:
        # size-aware: ceil(bytes / part_target_bytes) with a CPU floor,
        # so per-task peak memory stays bounded as inputs grow
        num_parts = _size_based_parts((left_ds, right_ds),
                                      target_bytes=part_target_bytes)

    hot = None
    if salt > 1 and salt_keys is not None:
        hot = pa.array(list(salt_keys))

    def add_part(cols, side):
        def inner(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            base = _part_codes_multi(batch, cols, num_parts)
            if salt == 1:
                return batch.append_column(
                    "_jp", pa.array(base, pa.int32()))
            if hot is not None:
                m = pc.is_in(batch[cols[0]], value_set=hot).to_numpy(
                    zero_copy_only=False).astype(bool)
            else:
                m = np.ones(batch.num_rows, bool)
            if side == "left":
                sl = np.where(
                    m, np.arange(batch.num_rows, dtype=np.int64) % salt,
                    0)
                return batch.append_column(
                    "_jp", pa.array((base * salt + sl).astype(np.int32),
                                    pa.int32()))
            # right: cold rows -> subpart 0 only; hot rows replicate
            # into every subpart of their key partition
            cold = batch.filter(pa.array(~m)).append_column(
                "_jp", pa.array((base[~m] * salt).astype(np.int32),
                                pa.int32()))
            reps = [cold] if cold.num_rows else []
            hotb = batch.filter(pa.array(m))
            hbase = base[m]
            for k in range(salt):
                if hotb.num_rows:
                    reps.append(hotb.append_column(
                        "_jp", pa.array(
                            (hbase * salt + k).astype(np.int32),
                            pa.int32())))
            if not reps:
                return batch.slice(0, 0).append_column(
                    "_jp", pa.array([], pa.int32()))
            return pa.concat_tables(reps)
        return inner

    from ..spillfs import open_spill

    sp = open_spill(spill_dir, prefix="join_")
    try:
        sp.write_parquet(
            left_ds.map_batches(add_part(lcols, "left"),
                                batch_format="pyarrow",
                                zero_copy_batch=True),
            "L", partition_cols=["_jp"])
        sp.write_parquet(
            right_ds.map_batches(add_part(rcols, "right"),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True),
            "R", partition_cols=["_jp"])

        lparts = sp.list_parts("_jp", "L")
        rparts = sp.list_parts("_jp", "R")
        if not lparts and not (include_missing_left and rparts):
            return None  # empty probe side: empty result either way

        # right partitions the probe side misses entirely need the
        # right schema for the empty-table stand-in (unless skipped);
        # symmetrically for left partitions under include_missing_left
        rschema = sp.schema_of(rparts)
        if rschema is None and not skip_missing_right:
            try:
                rschema = right_ds.schema().base_schema
            except Exception:
                rschema = pa.schema([])
        lschema = None
        if include_missing_left:
            lschema = sp.schema_of(lparts)
            if lschema is None:
                try:
                    lschema = left_ds.schema().base_schema
                except Exception:
                    lschema = pa.schema([])

        fs = sp.fs  # picklable; tasks read from any spill backend

        @ray.remote(num_cpus=1)
        def one_part(lp: str | None, rp: str | None,
                     lsch: pa.Schema | None,
                     rsch: pa.Schema | None) -> pa.Table:
            import pyarrow.parquet as pq
            if lp is None:
                lt = lsch.empty_table()
            else:
                lt = pq.read_table(lp, filesystem=fs,
                                   use_threads=False)
            if rp is None:
                rt = rsch.empty_table()
            else:
                rt = pq.read_table(rp, filesystem=fs,
                                   use_threads=False)
            return kernel(lt, rt)

        refs = []
        for pid, lp in sorted(lparts.items()):
            rp = rparts.get(pid)
            if rp is None and skip_missing_right:
                continue
            refs.append(one_part.remote(lp, rp, lschema, rschema))
        if include_missing_left:
            for pid, rp in sorted(rparts.items()):
                if pid not in lparts:
                    refs.append(one_part.remote(None, rp,
                                                lschema, rschema))
        if not refs:
            return None
        ray.wait(refs, num_returns=len(refs))  # done before cleanup
        return ray.data.from_arrow_refs(refs)
    finally:
        sp.cleanup()


def hash_join(left_ds, right_ds, *, left_on, right_on=None,
              how: str = "inner", num_parts: int | None = None,
              post=None, left_suffix=None, right_suffix="_r",
              salt: int = 1, salt_keys=None,
              spill_dir: str | None = None,
              part_target_bytes: int = PART_TARGET_BYTES,
              bloom_prefilter: bool = False,
              bloom_m_bits: int = 1 << 23):
    """Co-partitioned disk-shuffle hash join of two Datasets: one
    single-threaded Acero hash join per partition pair, with an
    optional ``post(tbl) -> tbl`` kernel run inside each task on the
    joined partition (local aggregates / top-k when grouping by the
    join key).  ``left_on``/``right_on`` are a column name or a list
    of names (multi-column equi-keys co-partition on a combined hash;
    ANSI semantics — any null key column matches nothing).  ``how``
    is "inner", "left outer", "left semi", "left anti" or
    "full outer" (right partitions the left never touched run the
    kernel against an empty left table, so right-unmatched rows
    null-extend exactly once; full outer rejects salting and the
    bloom prefilter).  ``salt`` >
    1 with ``salt_keys`` (the known hot probe keys, single-column
    keys only) mitigates skew (see ``co_partition_apply``); a salted
    ``post`` that aggregates by the join key sees partial groups per
    subpart — merge downstream.

    ``bloom_prefilter=True`` first streams the RIGHT side's key
    column(s) into a Bloom filter.  For inner/semi it drops left rows
    that provably cannot match before they are spilled; for "left
    anti" it ROUTES instead: bloom-miss / null-key rows are definite
    non-matches and bypass the shuffle straight into the result,
    only maybe-match rows go through the exact anti join (``post``
    is unsupported there — the bypass rows never see a partition).
    "left outer" must null-extend non-matching rows inside the join
    and is not eligible.  Identical results either way (false
    positives reach the exact join); what changes is the spilled
    probe volume.  Costs one extra pass over the right side's key
    column — worth it when the probe side is much larger than its
    matching (or for anti: non-matching) subset."""
    right_on2 = right_on or left_on
    if how not in ("inner", "left outer", "left semi", "left anti",
                   "full outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    if bloom_prefilter:
        if how in ("left outer", "full outer"):
            raise ValueError(
                "bloom_prefilter does not apply to outer joins")
        bloom = build_key_bloom(right_ds, right_on2,
                                m_bits=bloom_m_bits)
        if how == "left anti":
            if post is not None:
                raise ValueError("post is unsupported with the "
                                 "anti-join bloom bypass")
            definite = bloom_filter_keys(left_ds, bloom, left_on,
                                         invert=True)
            maybe = bloom_filter_keys(left_ds, bloom, left_on)
            checked = hash_join(
                maybe, right_ds, left_on=left_on, right_on=right_on2,
                how="left anti", num_parts=num_parts,
                left_suffix=left_suffix, right_suffix=right_suffix,
                salt=salt, salt_keys=salt_keys, spill_dir=spill_dir,
                part_target_bytes=part_target_bytes)
            if checked is None:
                return definite
            return checked.union(definite)
        left_ds = bloom_filter_keys(left_ds, bloom, left_on)

    def kernel(lt: pa.Table, rt: pa.Table) -> pa.Table:
        j = _join(lt, rt, left_on, right_on2, how,
                  left_suffix, right_suffix)
        return post(j) if post is not None else j

    # a left partition with NO right partition: inner/semi emit
    # nothing; left-outer/anti pass every left row through the kernel
    # against an empty right table
    return co_partition_apply(left_ds, right_ds, left_on=left_on,
                              right_on=right_on2, kernel=kernel,
                              num_parts=num_parts,
                              skip_missing_right=(
                                  how in ("inner", "left semi")),
                              include_missing_left=(
                                  how == "full outer"),
                              salt=salt, salt_keys=salt_keys,
                              spill_dir=spill_dir,
                              part_target_bytes=part_target_bytes)


def detect_hot_keys(ds, col, *, threshold_frac: float = 0.05,
                    sample_rows: int = 250_000,
                    sample_frac: float | None = None) -> list:
    """Sample-based hot-key detection for ``salt_keys``: keys covering
    more than ``threshold_frac`` of a random sample of ``ds``.
    Executes ``ds`` AT MOST once: the row count used to size the
    sample comes from dataset metadata only (free for parquet reads;
    unavailable for derived/mapped datasets, which instead either use
    the caller's ``sample_frac`` or take the single full aggregation
    pass — never a count() pre-pass that re-executes the pipeline).
    The result is advisory (a missed hot key only costs balance,
    never correctness)."""
    from .boilerplate import partial_aggregate

    sample = ds
    if sample_frac is not None:
        sample = ds.random_sample(sample_frac, seed=7)
    else:
        try:
            n = ds._meta_count()  # metadata-only; None when unknown
        except Exception:  # noqa: BLE001
            n = None
        if n and n > sample_rows:
            sample = ds.random_sample(sample_rows / n, seed=7)
    agg = partial_aggregate(sample, [col], [(col, "count")])
    if agg is None or agg.num_rows == 0:
        return []
    cnt = agg[f"{col}_count"].to_numpy(zero_copy_only=False)
    total = int(cnt.sum())
    if total == 0:
        return []
    hot = cnt > threshold_frac * total
    keys = agg[col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return keys.filter(pa.array(hot)).to_pylist()


# size below which join_auto broadcasts the build side instead of
# co-partitioning both inputs (the measured crossover on this host is
# between 50k- and 2.5M-row build sides; see BASELINE.md)
AUTO_BROADCAST_BYTES = 64 * 1024 * 1024


def join_auto(left_ds, right_ds, *, left_on, right_on=None,
              how: str = "inner", num_parts: int | None = None,
              post=None, left_suffix=None, right_suffix="_r",
              broadcast_bytes: int = AUTO_BROADCAST_BYTES,
              broadcast_decoded_bytes: int | None = None):
    """Equi-join with physical-shape dispatch: if the right side's
    metadata-based size estimate is under ``broadcast_bytes`` it is
    materialized once and broadcast (per-batch Acero probes, no
    shuffle); otherwise both sides co-partition through the disk
    spill.  An UNKNOWN size (None) takes the scalable hash-join path.
    Because the metadata estimate is parquet-ENCODED bytes, the
    decoded size is re-checked during materialization: if it
    overshoots ``broadcast_decoded_bytes`` (default 4x the broadcast
    budget — a highly compressed right side), the already-materialized
    object-store blocks are handed to the hash join instead (no
    recompute).  ``post`` only applies to the co-partitioned path
    (the broadcast path has no join-key partitioning for a local
    aggregate to exploit); apply batch transforms downstream
    instead."""
    try:
        sz = right_ds.size_bytes()
    except Exception:  # noqa: BLE001
        sz = None
    if sz is None:
        sz = broadcast_bytes + 1  # unknown: take the scalable path
    if sz <= broadcast_bytes and post is None and how != "full outer":
        import ray
        import ray.data
        cap = (broadcast_decoded_bytes if broadcast_decoded_bytes
               is not None else 4 * broadcast_bytes)
        refs = right_ds.to_arrow_refs()
        tbls, acc = [], 0
        for r in refs:
            t = ray.get(r)
            tbls.append(t)
            acc += t.nbytes
            if acc > cap:
                return hash_join(
                    left_ds, ray.data.from_arrow_refs(refs),
                    left_on=left_on, right_on=right_on, how=how,
                    num_parts=num_parts, post=post,
                    left_suffix=left_suffix, right_suffix=right_suffix)
        right = pa.concat_tables(tbls) if tbls else pa.table({})
        return broadcast_join(left_ds, right, left_on=left_on,
                              right_on=right_on, how=how,
                              left_suffix=left_suffix,
                              right_suffix=right_suffix)
    return hash_join(left_ds, right_ds, left_on=left_on,
                     right_on=right_on, how=how, num_parts=num_parts,
                     post=post, left_suffix=left_suffix,
                     right_suffix=right_suffix)
