"""IVF incremental absorb: wave-committed vector ingest reads back
identically to a same-centroid assignment over the union corpus, is
content-addressed idempotent, and compaction preserves results."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


def _vectors(n=600, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim))


@pytest.fixture(scope="module")
def ivf_env(ray_session, tmp_path_factory):
    import ray.data
    from vfs_index_ray.functions.similarity import IVFIndex

    d = tmp_path_factory.mktemp("ivfabs")
    mat = _vectors()
    n = mat.shape[0]
    ids = np.arange(n, dtype=np.int64)
    labels = (ids % 3).astype(np.int32)
    base_m = ids % 5 != 0

    def tbl(m):
        return pa.table({
            "vec_id": pa.array(ids[m], pa.int64()),
            "embedding": pa.array(list(mat[m]),
                                  pa.list_(pa.float64())),
            "label": pa.array(labels[m], pa.int32())})

    base_ds = ray.data.from_arrow(tbl(base_m))
    new_ds = ray.data.from_arrow(tbl(~base_m))
    path = str(d / "ivf")
    ivf = IVFIndex.build(base_ds, path, num_centroids=6,
                         seed_centroids=True, keep_cols=["label"])
    wave = ivf.absorb(new_ds, keep_cols=["label"])
    return {"ivf": ivf, "path": path, "mat": mat, "ids": ids,
            "labels": labels, "new_ds": new_ds, "wave": wave}


def _expected(mat, ids, cent, q_idx, nprobe, k=5, label_mask=None):
    """Pure-numpy reference: assign ALL vectors to the given centroids,
    probe the nprobe nearest, exact cosine within, top-k."""
    norm = mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    assign = np.argmax(norm @ cent.T, axis=1)
    q = norm[q_idx]
    order = np.argsort(-(cent @ q), kind="stable")[:nprobe]
    cand = np.isin(assign, order) & (ids != ids[q_idx])
    if label_mask is not None:
        cand &= label_mask
    cid = ids[cand]
    sims = norm[cand] @ q
    pick = np.lexsort((cid, -sims))[:k]
    return cid[pick], sims[pick]


def test_absorb_search_equals_union_assignment(ivf_env):
    ivf = ivf_env["ivf"]
    mat, ids = ivf_env["mat"], ivf_env["ids"]
    for q_idx in (0, 5, 123):
        vids, sims = ivf.search(mat[q_idx], k=5, nprobe=3,
                                exclude_id=int(ids[q_idx]))
        evids, esims = _expected(mat, ids, ivf.centroids, q_idx, 3)
        assert vids.tolist() == evids.tolist()
        assert np.allclose(sims, esims, rtol=0, atol=0)


def test_absorbed_rows_are_findable(ivf_env):
    """A query AT an absorbed vector must retrieve ids."""
    ivf, mat, ids = ivf_env["ivf"], ivf_env["mat"], ivf_env["ids"]
    q_idx = 10  # vec_id 10 (%5==0) came in via absorb
    vids, _ = ivf.search(mat[q_idx], k=8, nprobe=6)
    assert int(ids[q_idx]) in vids.tolist(), \
        "self-hit proves the wave is probed"


def test_absorb_filtered_and_cached_paths(ivf_env):
    from vfs_index_ray.functions.similarity import IVFIndex
    ivf, mat, ids = ivf_env["ivf"], ivf_env["mat"], ivf_env["ids"]
    lbl = ivf_env["labels"]
    vids, sims = ivf.search_filtered(
        mat[7], k=5, filters=[("label", "==", 1)], nprobe=2,
        exclude_id=7)
    evids, esims = _expected(mat, ids, ivf.centroids, 7, 2,
                             label_mask=(lbl == 1))
    if len(evids) >= 5:  # escalation may widen probes otherwise
        assert vids.tolist() == evids.tolist()
    cached = IVFIndex(ivf_env["path"], cache_bytes=64 << 20)
    cvids, csims = cached.search_filtered(
        mat[7], k=5, filters=[("label", "==", 1)], nprobe=2,
        exclude_id=7)
    assert cvids.tolist() == vids.tolist()
    assert (csims == sims).all()


def test_absorb_is_content_addressed_idempotent(ivf_env):
    ivf = ivf_env["ivf"]
    before = list(ivf._waves)
    wave2 = ivf.absorb(ivf_env["new_ds"], keep_cols=["label"])
    assert wave2 == ivf_env["wave"]
    assert ivf._waves == before, "same snapshot must not add a wave"


def test_compact_preserves_results_and_drops_waves(ivf_env):
    from vfs_index_ray.functions.similarity import IVFIndex
    ivf, mat, ids = ivf_env["ivf"], ivf_env["mat"], ivf_env["ids"]
    ref = {q: ivf.search(mat[q], k=5, nprobe=3, exclude_id=int(ids[q]))
           for q in (0, 5, 123)}
    rep = ivf.compact()
    assert rep["waves_folded"] == 1
    assert not os.path.isdir(os.path.join(ivf_env["path"], "waves"))
    fresh = IVFIndex(ivf_env["path"])
    for q, (evids, esims) in ref.items():
        vids, sims = fresh.search(mat[q], k=5, nprobe=3,
                                  exclude_id=int(ids[q]))
        assert vids.tolist() == evids.tolist()
        assert (sims == esims).all()
