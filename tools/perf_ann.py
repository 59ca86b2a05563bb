"""Brute-force ANN actor-pool sizing A/B + filtered-IVF scan audit.

    python tools/perf_ann.py [--vecs 1200000] [--dim 64] [--cpus 32]
    python tools/perf_ann.py --filtered   # brute filter scan vs
                                          # filtered-IVF probe

Generates a deterministic embeddings table (Philox, cached under
/tmp/vfsray_bench) and times ann_cosine_topk with the old fixed
concurrency=2 pool vs the new auto (1, CPUs) pool, interleaved within
one process.  ``--filtered`` instead builds an IVF index with the
label column in the buckets and reports rows_scanned + latency of
``search_filtered`` (predicate pushed into probed buckets, doubling
escalation) against the brute full-corpus filtered scan — the
sublinear-scan evidence for the 100-TB filtered-search path.  Prints
one JSON line."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _vec_file(n: int, dim: int, labels: bool = False) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"/tmp/vfsray_bench/vecs_{n}x{dim}" + ("_l" if labels else "")
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        step = 150_000
        for s in range(0, n, step):
            e = min(s + step, n)
            rng = np.random.Generator(np.random.Philox(key=[9, s]))
            mat = rng.normal(size=(e - s, dim)).astype(np.float32)
            cols = {
                "vec_id": pa.array(np.arange(s, e, dtype=np.int64)),
                "embedding": pa.array(list(mat),
                                      pa.list_(pa.float32())),
            }
            if labels:
                cols["label"] = pa.array(
                    (rng.random(e - s) < 0.1).astype(np.int64),
                    pa.int64())  # ~10% selectivity
            tbl = pa.table(cols)
            pq.write_table(tbl, os.path.join(d, f"part-{s:09d}.parquet"))
        open(marker, "w").close()
    return d


def run_filtered(args) -> int:
    """Brute filtered scan vs filtered-IVF probe on the same corpus."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from vfs_index_ray.functions.similarity import (IVFIndex,
                                                    ann_cosine_topk)

    d = _vec_file(args.vecs, args.dim, labels=True)
    ivf_dir = d + f"_ivf{args.centroids}"
    if not os.path.exists(os.path.join(ivf_dir, "centroids.npy")):
        t0 = time.perf_counter()
        IVFIndex.build(ray.data.read_parquet(d), ivf_dir,
                       num_centroids=args.centroids,
                       seed_centroids=True, keep_cols=["label"])
        print(f"ivf build {round(time.perf_counter() - t0, 2)} s",
              file=sys.stderr)
    ivf = IVFIndex(ivf_dir)
    qt = pq.read_table(d, filters=[("vec_id", "in", [0, 1, 2])])
    qvecs = {i: np.asarray(v, np.float64) for i, v in
             zip(qt["vec_id"].to_pylist(), qt["embedding"].to_pylist())}

    import pyarrow.compute as pc

    def only1(t):
        return t.filter(pc.equal(t["label"], 1))

    brute, probe = [], []
    scanned, widths, overlaps = [], [], []
    for _ in range(args.rounds):
        # brute: full-corpus filtered scan (the q_ann_filtered shape)
        ds = ray.data.read_parquet(d).map_batches(
            only1, batch_format="pyarrow", zero_copy_batch=True)
        t0 = time.perf_counter()
        bt = ann_cosine_topk(ds, [0, 1, 2], k=5,
                             query_ds=ray.data.read_parquet(d))
        brute.append(round(time.perf_counter() - t0, 2))
        bmap = {}
        for r in bt.to_pylist():
            bmap.setdefault(r["query_id"], []).append(r["vec_id"])
        # filtered IVF: pruned probe, driver-side (serving shape)
        t0 = time.perf_counter()
        hits = {}
        tot_sc, tot_np = 0, []
        for qid, qv in qvecs.items():
            st = {}
            ids, _ = ivf.search_filtered(
                qv, k=5, filters=[("label", "==", 1)],
                nprobe=args.nprobe, exclude_id=qid, stats=st)
            hits[qid] = ids.tolist()
            tot_sc += st["rows_scanned"]
            tot_np.append(st["nprobe_used"])
        probe.append(round(time.perf_counter() - t0, 2))
        scanned.append(tot_sc)
        widths.append(tot_np)
        overlaps.append([len(set(hits[q]) & set(bmap.get(q, [])))
                         for q in sorted(hits)])
    n_label1 = sum(
        pq.read_metadata(os.path.join(d, f)).num_rows
        for f in os.listdir(d) if f.endswith(".parquet")) // 10
    print(json.dumps({
        "mode": "filtered", "vecs": args.vecs,
        "centroids": args.centroids, "nprobe": args.nprobe,
        "brute_sec": brute, "ivf_probe_sec": probe,
        "ivf_rows_scanned_3q": scanned,
        "approx_label1_rows": n_label1,
        "scan_fraction_per_q": round(
            scanned[-1] / 3 / max(args.vecs, 1), 5),
        "nprobe_used": widths, "top5_overlap_of_5": overlaps}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vecs", type=int, default=1_200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--filtered", action="store_true")
    ap.add_argument("--matrix", action="store_true",
                    help="time gram_matrix / kmeans_iteration / "
                         "pq_encode at --vecs scale")
    ap.add_argument("--pq", action="store_true",
                    help="PQSearcher ADC recall + latency vs brute "
                         "force at --vecs scale")
    ap.add_argument("--centroids", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 runtime_env={"env_vars": {"PYTHONPATH": _REPO}})
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    if args.filtered:
        return run_filtered(args)
    if args.pq:
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data

        from vfs_index_ray.functions.similarity import PQSearcher

        d = _vec_file(args.vecs, args.dim)
        t0 = time.perf_counter()
        s = PQSearcher(ray.data.read_parquet(d), subs=16, k=256,
                       dim=args.dim)
        build_s = round(time.perf_counter() - t0, 2)
        t = pq.read_table(d, columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        mat = np.asarray(t["embedding"].to_pylist(), np.float64)
        grid = np.floor(mat * 10000 + 0.5).astype(np.int64)
        pos = {int(i): j for j, i in enumerate(ids)}

        def lookup(want):
            return mat[[pos[int(w)] for w in want]]

        qids = [0, 101, 9999, 123456, 777777]
        hits, lat = 0, []
        for qi in qids:
            qvec = mat[pos[qi]]
            t0 = time.perf_counter()
            got, _ = s.search(qvec, k=5, rerank=1024,
                              exact_lookup=lookup, exclude_ids=[qi])
            lat.append(round((time.perf_counter() - t0) * 1000, 1))
            qg = grid[pos[qi]]
            d2 = ((grid - qg[None, :]) ** 2).sum(axis=1)
            m = ids != qi
            want = set(ids[m][np.lexsort((ids[m], d2[m]))[:5]]
                       .tolist())
            hits += len(want & set(got.tolist()))
        print(json.dumps({
            "vecs": args.vecs, "cpus": args.cpus,
            "pq_build_sec": build_s,
            "codes_mb": round(s.codes.nbytes / 1e6, 1),
            "adc_query_ms": lat,
            "recall_at_5": hits / (5 * len(qids))}))
        ray.shutdown()
        return 0
    if args.matrix:
        import ray.data

        from vfs_index_ray.functions.similarity import (
            gram_matrix, kmeans_iteration, pq_encode)

        d = _vec_file(args.vecs, args.dim)
        times = {}
        t0 = time.perf_counter()
        g = gram_matrix(ray.data.read_parquet(
            d, columns=["embedding"]), dim=args.dim)
        times["gram"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        km = kmeans_iteration(ray.data.read_parquet(d), k=8,
                              dim=args.dim)
        times["kmeans_step"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_codes = pq_encode(ray.data.read_parquet(d), subs=8, k=16,
                            dim=args.dim).count()
        times["pq_encode"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({"vecs": args.vecs, "dim": args.dim,
                          "cpus": args.cpus, "sec": times,
                          "gram_rows": g.num_rows if g else 0,
                          "pq_rows": n_codes}))
        ray.shutdown()
        return 0

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
