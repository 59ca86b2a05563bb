"""Filtered IVF vector search (functions/similarity.py
search_filtered): predicate pushdown into probed buckets, doubling-
nprobe escalation until k survivors, sublinear scanned rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mk_vectors(n=400, dim=16, seed=3):
    g = np.random.Generator(np.random.Philox(key=[seed, 0]))
    m = g.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _build(tmp_path, labels, mats, ray_session):
    import ray.data

    from vfs_index_ray.functions.similarity import IVFIndex

    n, dim = mats.shape
    offs = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(mats.ravel(), pa.float64())),
        "label": pa.array(labels, pa.int64()),
    })
    return IVFIndex.build(ray.data.from_arrow(tbl),
                          str(tmp_path / "ivf"), num_centroids=8,
                          seed_centroids=True, keep_cols=["label"])


def _expected_filtered_topk(mats, labels, qid, k):
    q = mats[qid]
    sims = mats @ q
    mask = (labels == 1) & (np.arange(len(mats)) != qid)
    ids = np.flatnonzero(mask)
    order = np.lexsort((ids, -sims[ids]))[:k]
    return ids[order], sims[ids][order]


def test_escalation_reaches_far_buckets(ray_session, tmp_path):
    """label=1 vectors live ONLY in buckets outside the initial probe
    width -> zero survivors at nprobe=4, escalation widens to all 8
    and returns exactly the filtered brute-force top-k."""
    mats = _mk_vectors()
    qid = 0
    # seeded centroids: normalized vectors of vec_ids 0..7
    cents = mats[:8]
    assign = np.argmax(mats @ cents.T, axis=1)
    probe_order = np.argsort(-(cents @ mats[qid]), kind="stable")
    far = set(probe_order[4:].tolist())
    far_ids = np.flatnonzero(np.isin(assign, list(far)))
    assert len(far_ids) >= 6, "fixture needs vectors in far buckets"
    labels = np.zeros(len(mats), np.int64)
    labels[far_ids[:6]] = 1

    ivf = _build(tmp_path, labels, mats, ray_session)
    stats = {}
    ids, sims = ivf.search_filtered(
        mats[qid], k=5, filters=[("label", "==", 1)], nprobe=4,
        exclude_id=qid, stats=stats)
    assert stats["nprobe_used"] == 8  # escalated past the first width
    want_ids, want_sims = _expected_filtered_topk(mats, labels, qid, 5)
    assert ids.tolist() == want_ids.tolist()
    np.testing.assert_allclose(sims, want_sims, rtol=0, atol=1e-12)


def test_no_escalation_and_sublinear_scan(ray_session, tmp_path):
    """Densely labeled corpus: the first probe width suffices
    (nprobe_used == 4) and rows_scanned is a strict subset of the
    label-1 rows — never a corpus scan."""
    mats = _mk_vectors(seed=7)
    labels = np.ones(len(mats), np.int64)
    labels[::3] = 0  # 2/3 labeled
    ivf = _build(tmp_path, labels, mats, ray_session)
    stats = {}
    ids, sims = ivf.search_filtered(
        mats[1], k=5, filters=[("label", "==", 1)], nprobe=4,
        exclude_id=1, stats=stats)
    assert len(ids) == 5
    assert stats["nprobe_used"] == 4
    n_label1 = int((labels == 1).sum())
    assert 0 < stats["rows_scanned"] < n_label1  # pruned probe
    # survivors are genuinely label-1 and scores match brute force
    want_ids, _ = _expected_filtered_topk(mats, labels, 1, 400)
    assert set(ids.tolist()) <= set(want_ids.tolist())


def test_filters_never_fabricate(ray_session, tmp_path):
    """No label-1 rows at all -> empty result after full escalation."""
    mats = _mk_vectors(seed=11)
    labels = np.zeros(len(mats), np.int64)
    ivf = _build(tmp_path, labels, mats, ray_session)
    stats = {}
    ids, sims = ivf.search_filtered(
        mats[2], k=5, filters=[("label", "==", 1)], nprobe=4,
        exclude_id=2, stats=stats)
    assert len(ids) == 0 and stats["nprobe_used"] == 8
