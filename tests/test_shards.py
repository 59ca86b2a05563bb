"""Epoch-shuffle shard writer: determinism, resume, reseeding."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _mk_ds(n):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)]),
    })).repartition(5)


def test_shards_cover_corpus_and_are_ordered(ray_session, tmp_path):
    from vfs_index_ray.functions.shards import (read_shard,
                                                write_shuffled_shards)
    from vfs_index_ray.hashing import mix32
    out = str(tmp_path / "ep0")
    stats = write_shuffled_shards(_mk_ds(300), out, num_shards=6, seed=1)
    assert stats["rows"] == 300
    seen = []
    for k in range(6):
        t = read_shard(out, k)
        prio = t["prio"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        assert np.all(mix32(ids ^ np.int64(1)) == prio)
        assert np.all(prio % 6 == k)
        # ordered by (prio, id); pos is the dense rank
        order = np.lexsort((ids, prio))
        assert np.array_equal(order, np.arange(len(ids)))
        assert t["pos"].to_pylist() == list(range(len(ids)))
        # payload columns ride along
        assert t["text"][0].as_py().startswith("doc ")
        seen.extend(ids.tolist())
    assert sorted(seen) == list(range(300))


def test_shards_resume_skips_committed(ray_session, tmp_path):
    from vfs_index_ray.functions.shards import (read_shard,
                                                write_shuffled_shards)
    out = str(tmp_path / "ep")
    write_shuffled_shards(_mk_ds(120), out, num_shards=4, seed=7)
    before = read_shard(out, 2)
    mt0 = os.path.getmtime(os.path.join(out, "shard_00002.parquet"))
    # delete one shard: the rerun rebuilds ONLY it
    os.remove(os.path.join(out, "shard_00001.parquet"))
    stats = write_shuffled_shards(_mk_ds(120), out, num_shards=4, seed=7)
    assert stats["rows"] == 120
    assert os.path.getmtime(os.path.join(out, "shard_00002.parquet")) == mt0
    assert read_shard(out, 2).equals(before)


def test_shards_reseed_changes_permutation(ray_session, tmp_path):
    from vfs_index_ray.functions.shards import (read_shard,
                                                write_shuffled_shards)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_shuffled_shards(_mk_ds(200), a, num_shards=4, seed=0)
    write_shuffled_shards(_mk_ds(200), b, num_shards=4, seed=1)
    ga = [read_shard(a, k)["doc_id"].to_pylist() for k in range(4)]
    gb = [read_shard(b, k)["doc_id"].to_pylist() for k in range(4)]
    assert ga != gb                       # epochs differ
    assert sorted(sum(ga, [])) == sorted(sum(gb, []))  # same corpus
