"""Resident bucket LRU in IVFIndex (similarity.py): cached probes are
bit-identical to the disk path (plain + filtered + escalation), the
cache honours its byte cap, and the QueryService serving path uses it
transparently."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mk_vectors(n=400, dim=16, seed=5):
    g = np.random.Generator(np.random.Philox(key=[seed, 0]))
    m = g.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _build(tmp_path, labels, mats, name="ivf"):
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
    IVFIndex.build(ray.data.from_arrow(tbl), str(tmp_path / name),
                   num_centroids=8, seed_centroids=True,
                   keep_cols=["label"])
    return str(tmp_path / name)


def test_cached_equals_disk_plain_and_filtered(ray_session, tmp_path):
    from vfs_index_ray.functions.similarity import IVFIndex

    mats = _mk_vectors()
    labels = (np.arange(len(mats)) % 3 == 0).astype(np.int64)
    path = _build(tmp_path, labels, mats)
    cold = IVFIndex(path)                      # disk every probe
    warm = IVFIndex(path, cache_bytes=64 << 20)

    for qid in (0, 7, 123, 399):
        for _ in range(2):  # second pass hits the cache
            i1, s1 = cold.search(mats[qid], k=5, nprobe=4,
                                 exclude_id=qid)
            i2, s2 = warm.search(mats[qid], k=5, nprobe=4,
                                 exclude_id=qid)
            assert i1.tolist() == i2.tolist()
            np.testing.assert_array_equal(s1, s2)  # fp64-identical

            st1, st2 = {}, {}
            f = [("label", "==", 1)]
            i1, s1 = cold.search_filtered(mats[qid], k=5, filters=f,
                                          nprobe=2, exclude_id=qid,
                                          stats=st1)
            i2, s2 = warm.search_filtered(mats[qid], k=5, filters=f,
                                          nprobe=2, exclude_id=qid,
                                          stats=st2)
            assert i1.tolist() == i2.tolist()
            np.testing.assert_array_equal(s1, s2)
            # the closed-form escalation rule must be unchanged
            assert st1 == st2


def test_cached_escalation_reaches_far_buckets(ray_session, tmp_path):
    """Filtered survivors only in buckets outside the initial probe
    width: the cached path must escalate exactly like the disk path."""
    from vfs_index_ray.functions.similarity import IVFIndex

    mats = _mk_vectors(seed=3)
    qid = 0
    cents = mats[:8]
    assign = np.argmax(mats @ cents.T, axis=1)
    probe_order = np.argsort(-(cents @ mats[qid]), kind="stable")
    far = set(probe_order[4:].tolist())
    far_ids = np.flatnonzero(np.isin(assign, list(far)))
    labels = np.zeros(len(mats), np.int64)
    labels[far_ids[:6]] = 1
    path = _build(tmp_path, labels, mats)

    cold = IVFIndex(path)
    warm = IVFIndex(path, cache_bytes=64 << 20)
    st1, st2 = {}, {}
    f = [("label", "==", 1)]
    i1, s1 = cold.search_filtered(mats[qid], k=5, filters=f, nprobe=4,
                                  exclude_id=qid, stats=st1)
    i2, s2 = warm.search_filtered(mats[qid], k=5, filters=f, nprobe=4,
                                  exclude_id=qid, stats=st2)
    assert st2["nprobe_used"] == 8
    assert st1 == st2
    assert i1.tolist() == i2.tolist()
    np.testing.assert_array_equal(s1, s2)


def test_cache_byte_cap_evicts(ray_session, tmp_path):
    from vfs_index_ray.functions.similarity import IVFIndex

    mats = _mk_vectors(n=600)
    labels = np.zeros(len(mats), np.int64)
    path = _build(tmp_path, labels, mats, name="ivf_small")
    # one decoded bucket is ~600/8 rows * 16 dims * 8B ≈ 10 KB; cap at
    # ~2 buckets so probing all 8 must evict
    tiny = IVFIndex(path, cache_bytes=24 << 10)
    full = IVFIndex(path)
    for qid in range(10):
        i1, s1 = full.search(mats[qid], k=3, nprobe=8)
        i2, s2 = tiny.search(mats[qid], k=3, nprobe=8)
        assert i1.tolist() == i2.tolist()
        np.testing.assert_array_equal(s1, s2)
    assert tiny._cache_used <= 2 * (24 << 10)  # cap + one entry slack
    assert len(tiny._cache) < 8


def test_service_uses_resident_cache(ray_session, tmp_path):
    """ann_batch through QueryService replicas (cache on by default)
    matches a cold direct IVFIndex, and repeat batches still match."""
    import pyarrow.parquet as pq

    from vfs_index_ray import corpus
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.functions.similarity import IVFIndex
    from vfs_index_ray.service import QueryService

    pages = corpus.generate_pages(100)
    ids = pa.array(np.arange(100, dtype=np.int64), pa.int64())
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pages.append_column("doc_id", ids), src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="word", num_parts=4,
                 id_col="doc_id").build([src])

    mats = _mk_vectors(n=300)
    labels = (np.arange(300) % 2).astype(np.int64)
    ivf_dir = _build(tmp_path, labels, mats, name="ivf_svc")
    cold = IVFIndex(ivf_dir)

    svc = QueryService(idx, replicas=2, ann_dir=ivf_dir)
    try:
        vecs = [mats[i] for i in range(6)]
        for _ in range(2):
            got = svc.ann_batch(vecs, k=4, nprobe=3)
            for i, (gi, gs) in enumerate(got):
                wi, ws = cold.search(mats[i], k=4, nprobe=3)
                assert gi.tolist() == wi.tolist()
                np.testing.assert_array_equal(gs, ws)
            gotf = svc.ann_batch(vecs, k=4, nprobe=2,
                                 filters=[("label", "==", 1)])
            for i, (gi, gs) in enumerate(gotf):
                wi, ws = cold.search_filtered(
                    mats[i], k=4, filters=[("label", "==", 1)],
                    nprobe=2)
                assert gi.tolist() == wi.tolist()
                np.testing.assert_array_equal(gs, ws)
    finally:
        svc.shutdown()
