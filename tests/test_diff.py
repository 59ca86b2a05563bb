"""Snapshot diff (functions/diff.py): kernel edge cases + distributed
co-partitioned path vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vfs_index_ray.functions.diff import _diff_kernel, snapshot_diff


def test_kernel_classes_and_null_safety():
    L = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": ["a", "b", "c", None]})
    R = pa.table({"k": pa.array([2, 3, 4, 5], pa.int64()),
                  "v": ["b", "X", None, "e"]})
    out = _diff_kernel(L, R, "k", ["v"])
    got = dict(zip(out["key"].to_pylist(), out["change"].to_pylist()))
    # k=2 equal, k=4 NULL==NULL (IS NOT DISTINCT FROM) → both omitted
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_kernel_one_sided():
    L = pa.table({"k": pa.array([7], pa.int64()), "v": ["x"]})
    empty = L.slice(0, 0)
    assert _diff_kernel(L, empty, "k", ["v"])["change"].to_pylist() == [
        "removed"]
    assert _diff_kernel(empty, L, "k", ["v"])["change"].to_pylist() == [
        "added"]
    assert _diff_kernel(empty, empty, "k", ["v"]).num_rows == 0


def test_snapshot_diff_distributed_matches_brute(ray_session):
    import ray
    import ray.data

    rng = np.random.default_rng(23)
    n = 4000
    keys = np.arange(n, dtype=np.int64)
    v1 = rng.integers(0, 100, n)
    old = pa.table({"k": keys, "v": v1, "w": rng.random(n)})
    # new: drop k%13==0, change v where k%13==1, add keys n..n+99
    keep = keys % 13 != 0
    v2 = np.where(keys % 13 == 1, v1 + 1000, v1)
    new = pa.table({"k": np.r_[keys[keep], np.arange(n, n + 100)],
                    "v": np.r_[v2[keep], np.zeros(100, np.int64)],
                    "w": np.r_[old["w"].to_numpy()[keep],
                               np.zeros(100)]})
    out = snapshot_diff(ray.data.from_arrow(old).repartition(6),
                        ray.data.from_arrow(new).repartition(4),
                        key="k", num_parts=8)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = dict(zip(*(pa.concat_tables(tbls)[c].to_pylist()
                     for c in ("key", "change"))))
    expect = {}
    for k in keys:
        if k % 13 == 0:
            expect[int(k)] = "removed"
        elif k % 13 == 1:
            expect[int(k)] = "changed"
    for k in range(n, n + 100):
        expect[k] = "added"
    assert got == expect
