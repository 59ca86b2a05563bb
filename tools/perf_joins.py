"""Scale timings for the distributed equi-joins (functions/joins.py)
on a synthetic orders/lineitem-shaped pair.

    python tools/perf_joins.py [--rows 10000000] [--keys 2500000] \
        [--cpus 32] [--ops hash broadcast agg bloom]

- hash:      lineitem(rows) ⋈ orders(keys) on the co-partitioned disk
             shuffle, with the revenue aggregate inside each join task
- broadcast: same probe side against the keys table shipped via
             ray.put (the small-side path)
- agg:       hash_aggregate over the probe side (high-cardinality
             grouped sum, one row per key)

Prints one JSON line with per-op wall seconds; deterministic input
(Philox), generated as a partitioned parquet under /tmp and reused
across runs with the same --rows/--keys.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _corpus(rows: int, keys: int, hot_frac: float = 0.0,
            spread: int = 1) -> tuple[str, str]:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = f"_hot{int(hot_frac * 100)}" if hot_frac else ""
    if spread != 1:
        tag += f"_sp{spread}"
    base = f"/tmp/vfsray_bench/join_{rows}_{keys}{tag}"
    ldir, rdir = os.path.join(base, "lineitem"), os.path.join(base, "orders")
    done = os.path.join(base, "_done")
    if os.path.exists(done):
        return ldir, rdir
    os.makedirs(ldir, exist_ok=True)
    os.makedirs(rdir, exist_ok=True)
    g = np.random.Generator(np.random.Philox(key=[17, 0]))
    chunk = 2_000_000
    for i, lo in enumerate(range(0, rows, chunk)):
        n = min(chunk, rows - lo)
        ks = g.integers(0, keys * spread, n)
        if hot_frac:
            ks = np.where(g.random(n) < hot_frac, 0, ks)
        t = pa.table({
            "l_orderkey": pa.array(ks.astype(np.int64), pa.int64()),
            "rev": pa.array(g.integers(1, 10_000, n), pa.int64()),
        })
        pq.write_table(t, os.path.join(ldir, f"part-{i:04d}.parquet"))
    for i, lo in enumerate(range(0, keys, chunk)):
        n = min(chunk, keys - lo)
        t = pa.table({
            "o_orderkey": pa.array(
                np.arange(lo, lo + n, dtype=np.int64), pa.int64()),
            "o_flag": pa.array(g.integers(0, 5, n), pa.int64()),
        })
        pq.write_table(t, os.path.join(rdir, f"part-{i:04d}.parquet"))
    open(done, "w").close()
    return ldir, rdir


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=2_500_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ops", nargs="*",
                    default=["hash", "broadcast", "agg"])
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from vfs_index_ray.functions.boilerplate import (_group_counts,
                                                     hash_aggregate)
    from vfs_index_ray.functions.joins import broadcast_join, hash_join

    ldir, rdir = _corpus(args.rows, args.keys)
    times: dict[str, float] = {}
    extra: dict[str, int] = {}

    def post(j: pa.Table) -> pa.Table:
        return _group_counts(j, ["o_flag"], [("rev", "sum")])

    if "hash" in args.ops:
        t0 = time.perf_counter()
        out = hash_join(ray.data.read_parquet(ldir),
                        ray.data.read_parquet(rdir),
                        left_on="l_orderkey", right_on="o_orderkey",
                        post=post)
        parts = pa.concat_tables(ray.get(out.to_arrow_refs()))
        m = _group_counts(parts, ["o_flag"], [("rev_sum", "sum")])
        times["hash"] = round(time.perf_counter() - t0, 3)
        extra["hash_groups"] = m.num_rows

    if "broadcast" in args.ops:
        import pyarrow.parquet as pq
        t0 = time.perf_counter()
        right = pq.read_table(rdir)
        out = broadcast_join(ray.data.read_parquet(ldir), right,
                             left_on="l_orderkey",
                             right_on="o_orderkey")
        parts = pa.concat_tables(ray.get(
            out.map_batches(post, batch_format="pyarrow")
               .to_arrow_refs()))
        m = _group_counts(parts, ["o_flag"], [("rev_sum", "sum")])
        times["broadcast"] = round(time.perf_counter() - t0, 3)
        extra["broadcast_groups"] = m.num_rows

    if "skew" in args.ops:
        # 60% of probe rows on ONE key: salt=1 serializes that key's
        # partition into a single task; salt=8 splits it
        sldir, srdir = _corpus(args.rows, args.keys, hot_frac=0.6)
        for s in (1, 8):
            t0 = time.perf_counter()
            out = hash_join(ray.data.read_parquet(sldir),
                            ray.data.read_parquet(srdir),
                            left_on="l_orderkey",
                            right_on="o_orderkey", salt=s,
                            salt_keys=[0] if s > 1 else None)
            parts = pa.concat_tables(ray.get(out.to_arrow_refs()))
            m = _group_counts(parts, ["o_flag"], [("rev", "sum")])
            times[f"skew_salt{s}"] = round(time.perf_counter() - t0, 3)
            extra[f"skew_salt{s}_rows"] = parts.num_rows

    if "bloom" in args.ops:
        # selective inner join (~1/20 of probe rows have a matching
        # build key): the bloom prefilter drops non-matching probe
        # rows before the spill — same output, less shuffled volume
        bldir, brdir = _corpus(args.rows, args.keys, spread=20)
        for flag in (False, True):
            t0 = time.perf_counter()
            out = hash_join(ray.data.read_parquet(bldir),
                            ray.data.read_parquet(brdir),
                            left_on="l_orderkey",
                            right_on="o_orderkey", post=post,
                            bloom_prefilter=flag)
            parts = pa.concat_tables(ray.get(out.to_arrow_refs()))
            m = _group_counts(parts, ["o_flag"], [("rev_sum", "sum")])
            name = "bloom_on" if flag else "bloom_off"
            times[name] = round(time.perf_counter() - t0, 3)
            extra[f"{name}_groups"] = m.num_rows

    if "agg" in args.ops:
        t0 = time.perf_counter()
        out = hash_aggregate(ray.data.read_parquet(ldir),
                             ["l_orderkey"],
                             [("rev", "count"), ("rev", "sum")])
        total = sum(t.num_rows for t in ray.get(out.to_arrow_refs()))
        times["agg"] = round(time.perf_counter() - t0, 3)
        extra["agg_groups"] = total

    print(json.dumps({"rows": args.rows, "keys": args.keys,
                      "cpus": args.cpus, "sec": times, **extra}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
