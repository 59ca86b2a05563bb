"""Near-dup LSH shuffle A/B harness over the synthetic bench corpus.

    python tools/perf_lsh.py [--docs 1200000] [--cpus 32] [--which simhash]

Derives (doc_id, text) from the deterministic bench pages (doc_id =
url-hash, the engine's standard identity) and times one near-dup pass.
Run interleaved from two git worktrees (old groupby-sort-shuffle code vs
new hive-partitioned banded_bucket_apply) for the A/B; prints one JSON
line with the wall time and pair count so both sides are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--which", default="simhash",
                    choices=["simhash", "minhash"])
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash verify threshold; 0 keeps the banding "
                         "+ shuffle + verify work identical while the "
                         "OUTPUT stays tiny (A/B the shuffle, not the "
                         "pair materialization)")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 runtime_env={"env_vars": {"PYTHONPATH": _REPO}})
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data

    from bench import _bench_corpus

    bdir = _bench_corpus(args.docs)
    ds = ray.data.read_parquet(bdir, columns=["url", "text"])

    def add_id(t: pa.Table) -> pa.Table:
        from vfs_index_ray.hashing import doc_ids_from_urls
        col = t["url"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = doc_ids_from_urls(col).astype("int64")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": t["text"]})

    ds = ds.map_batches(add_id, batch_format="pyarrow")
    t0 = time.perf_counter()
    if args.which == "simhash":
        from vfs_index_ray.functions.dedup import simhash_near_dups
        out = simhash_near_dups(ds, max_hamming=args.max_hamming)
        n = out.num_rows
    else:
        from vfs_index_ray.functions.dedup import minhash_candidates
        out = minhash_candidates(ds, num_perm=64, num_bands=16)
        n = out.num_rows
    sec = time.perf_counter() - t0
    print(json.dumps({"which": args.which, "docs": args.docs,
                      "max_hamming": args.max_hamming,
                      "cpus": args.cpus, "pairs": int(n),
                      "sec": round(sec, 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
