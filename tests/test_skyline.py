"""Pareto skyline (functions/skyline.py): kernel vs brute force,
duplicate survival, and partition invariance of the distributed op."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _brute(x, y):
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                keep[i] = False
                break
    return keep


def test_pareto_keep_matches_bruteforce():
    from vfs_index_ray.functions.skyline import pareto_keep

    rng = np.random.default_rng(41)
    for trial in range(20):
        n = int(rng.integers(1, 120))
        # small value range => plenty of ties and exact duplicates
        x = rng.integers(0, 12, n).astype(np.int64)
        y = rng.integers(0, 12, n).astype(np.int64)
        got = pareto_keep(x, y)
        want = _brute(x, y)
        assert np.array_equal(got, want), (trial, x, y)


def test_pareto_keep_duplicates_survive():
    from vfs_index_ray.functions.skyline import pareto_keep

    x = np.array([5, 5, 3, 1], dtype=np.int64)
    y = np.array([7, 7, 9, 1], dtype=np.int64)
    assert pareto_keep(x, y).tolist() == [True, True, True, False]


def test_skyline_partition_invariant(ray_session):
    import ray.data

    from vfs_index_ray.functions.skyline import skyline

    rng = np.random.default_rng(43)
    n = 5000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        "y": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })

    def ids(ds):
        out = skyline(ds, x_col="x", y_col="y")
        return sorted(out["id"].to_pylist())

    a = ids(ray.data.from_arrow(t))
    b = ids(ray.data.from_arrow(t).repartition(17))
    assert a == b
    xs = t["x"].to_numpy()
    ys = t["y"].to_numpy()
    from vfs_index_ray.functions.skyline import pareto_keep
    want = sorted(np.flatnonzero(pareto_keep(
        xs.astype(np.int64), ys.astype(np.int64))).tolist())
    assert a == want
