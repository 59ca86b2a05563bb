"""Brute-force ANN actor-pool sizing A/B.

    python tools/perf_ann.py [--vecs 1200000] [--dim 64] [--cpus 32]

Generates a deterministic embeddings table (Philox, cached under
/tmp/vfsray_bench) and times ann_cosine_topk with the old fixed
concurrency=2 pool vs the new auto (1, CPUs) pool, interleaved within
one process. Prints one JSON line."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _vec_file(n: int, dim: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"/tmp/vfsray_bench/vecs_{n}x{dim}"
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        step = 150_000
        for s in range(0, n, step):
            e = min(s + step, n)
            rng = np.random.Generator(np.random.Philox(key=[9, s]))
            mat = rng.normal(size=(e - s, dim)).astype(np.float32)
            tbl = pa.table({
                "vec_id": pa.array(np.arange(s, e, dtype=np.int64)),
                "embedding": pa.array(list(mat),
                                      pa.list_(pa.float32())),
            })
            pq.write_table(tbl, os.path.join(d, f"part-{s:09d}.parquet"))
        open(marker, "w").close()
    return d


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vecs", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 runtime_env={"env_vars": {"PYTHONPATH": _REPO}})
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from vfs_index_ray.functions.similarity import ann_cosine_topk

    d = _vec_file(args.vecs, args.dim)
    times = {"fixed2": [], "auto": []}
    results = {}
    for _ in range(args.rounds):
        for mode, conc in (("fixed2", 2), ("auto", None)):
            ds = ray.data.read_parquet(d)
            t0 = time.perf_counter()
            out = ann_cosine_topk(ds, [0, 1, 2], k=5, concurrency=conc)
            times[mode].append(round(time.perf_counter() - t0, 2))
            results[mode] = out.to_pydict()
    assert results["fixed2"] == results["auto"], "A/B results differ"
    print(json.dumps({"vecs": args.vecs, "cpus": args.cpus,
                      "fixed2_sec": times["fixed2"],
                      "auto_sec": times["auto"]}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
