"""Exact kNN join + SemDeDup (functions/knn.py): brute-force
equality, block-count invariance, semdedup drop semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _vecs(n=200, dim=16, seed=5, dup_every=None):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    if dup_every:
        # plant near-duplicates: row i ≈ row i-1 for i % dup_every == 0
        for i in range(dup_every, n, dup_every):
            X[i] = X[i - 1] + rng.normal(scale=1e-3, size=dim)
    ids = np.arange(n, dtype=np.int64) * 7  # non-contiguous ids
    off = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    emb = pa.ListArray.from_arrays(
        pa.array(off), pa.array(X.ravel().astype(np.float32)))
    return pa.table({"vec_id": ids, "embedding": emb}), X, ids


def _brute_knn(X, ids, k):
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    S = Xn @ Xn.T
    out = {}
    for i, vid in enumerate(ids):
        order = np.lexsort((ids, -S[i]))
        nb = [j for j in order if ids[j] != vid][:k]
        out[int(vid)] = [(r + 1, int(ids[j]),
                          int(np.floor(S[i, j] * 1e4 + 0.5)))
                         for r, j in enumerate(nb)]
    return out


def _collect(out):
    import ray
    return pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows])


def test_knn_join_matches_brute_any_blockcount(ray_session):
    import ray.data

    from vfs_index_ray.functions.knn import knn_join

    t, X, ids = _vecs()
    # fp32 storage round-trip: brute force must see the same values
    Xs = np.array(t["embedding"].to_pylist(), np.float64)
    expect = _brute_knn(Xs, ids, 4)
    for nblocks in (1, 3, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        got_t = _collect(knn_join(ds, k=4))
        got = {}
        for v, nb, r, s in zip(*(got_t[c].to_pylist() for c in
                                 ("vec_id", "nbr_id", "rank",
                                  "sim_x1e4"))):
            got.setdefault(v, []).append((r, nb, s))
        assert {k: sorted(v) for k, v in got.items()} == expect, nblocks


def test_semdedup_drops_planted_dups(ray_session):
    import ray.data

    from vfs_index_ray.functions.knn import semdedup

    t, X, ids = _vecs(n=120, dup_every=10)
    ds = ray.data.from_arrow(t).repartition(3)
    out = _collect(semdedup(ds, num_clusters=4, tau_x1e4=9900))
    keep = dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))
    assert len(keep) == 120
    # every planted dup (i % 10 == 0, i > 0) follows its source by id
    # and lands in the same cluster (sim ≈ 1) → dropped
    for i in range(10, 120, 10):
        assert keep[int(ids[i])] is False, i
    # sources survive (no earlier near-identical row)
    for i in range(9, 120, 10):
        assert keep[int(ids[i])] is True, i


def test_semdedup_brute_equality(ray_session):
    import ray.data

    from vfs_index_ray.functions.knn import _seed_matrix, semdedup

    t, _, ids = _vecs(n=150, seed=9)
    ds = ray.data.from_arrow(t).repartition(4)
    tau = 2000  # low: synthetic randoms have no high-sim pairs
    out = _collect(semdedup(ds, num_clusters=4, tau_x1e4=tau))
    got = dict(zip(out["vec_id"].to_pylist(), out["keep"].to_pylist()))

    X = np.array(t["embedding"].to_pylist(), np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    seeds = _seed_matrix(ds, 4, "embedding", "vec_id")
    asg = np.argmax(Xn @ seeds.T, axis=1)
    order = np.argsort(ids)
    expect = {}
    for c in range(4):
        sub = [i for i in order if asg[i] == c]
        for pos, i in enumerate(sub):
            px = np.floor(Xn[i] @ Xn[sub[:pos]].T * 1e4 + 0.5) \
                if pos else np.empty(0)
            expect[int(ids[i])] = not bool((px >= tau).any())
    assert got == expect
