"""Bloom-filter join prefilter (functions/joins.py): zero false
negatives, useful selectivity, and hash_join results bit-identical
with the prefilter on or off (inner + semi, int + string + null
keys)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _sorted(t: pa.Table) -> list:
    import pyarrow.compute as pc
    cols = sorted(t.column_names)
    t = t.select(cols)
    return t.take(pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in cols])).to_pylist()


def test_no_false_negatives_and_selective(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import (bloom_filter_keys,
                                               build_key_bloom)

    keys = pa.table({"k": pa.array(np.arange(0, 5000, 5), pa.int64())})
    bloom = build_key_bloom(ray.data.from_arrow(keys), "k")
    probe = pa.table({"k": pa.array(np.arange(20000), pa.int64())})
    kept = bloom_filter_keys(ray.data.from_arrow(probe), bloom, "k")
    got = set()
    import ray
    for t in ray.get(kept.to_arrow_refs()):
        got.update(t["k"].to_pylist())
    want = set(range(0, 5000, 5))
    assert want <= got            # every true key survives
    # false-positive rate well under 50% of the non-members
    assert len(got - want) < 0.5 * (20000 - len(want))


@pytest.mark.parametrize("how", ["inner", "left semi"])
def test_bloom_join_identical(ray_session, how):
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    g = np.random.Generator(np.random.Philox(key=[31, 0]))
    lk = g.integers(0, 3000, size=20000)
    left = pa.table({
        "k": pa.array([None if i % 97 == 0 else int(v)
                       for i, v in enumerate(lk)], pa.int64()),
        "lv": pa.array(np.arange(20000), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([None, 1, 5, 7] + list(range(0, 3000, 3)),
                      pa.int64()),
        "rv": pa.array(np.arange(4 + 1000), pa.int64()),
    })
    a = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how=how, num_parts=8)
    b = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how=how, num_parts=8,
                  bloom_prefilter=True)
    import ray
    ta = pa.concat_tables(ray.get(a.to_arrow_refs()))
    tb = pa.concat_tables(ray.get(b.to_arrow_refs()))
    assert _sorted(ta) == _sorted(tb)
    assert ta.num_rows > 0


def test_bloom_join_string_keys(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    left = pa.table({
        "k": pa.array([f"u{i % 50}" for i in range(2000)]
                      + [None] * 3),
        "lv": pa.array(np.arange(2003), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([f"u{i}" for i in range(0, 50, 2)]),
        "rv": pa.array(np.arange(25), pa.int64()),
    })
    a = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how="inner", num_parts=4)
    b = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how="inner", num_parts=4,
                  bloom_prefilter=True)
    import ray
    ta = pa.concat_tables(ray.get(a.to_arrow_refs()))
    tb = pa.concat_tables(ray.get(b.to_arrow_refs()))
    assert _sorted(ta) == _sorted(tb)


def test_bloom_anti_bypass_identical(ray_session):
    """Anti join with the bloom bypass: definite non-matches (bloom
    miss or null key) skip the shuffle; output equals the plain anti
    join exactly."""
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    g = np.random.Generator(np.random.Philox(key=[37, 0]))
    lk = g.integers(0, 50000, size=30000)
    left = pa.table({
        "k": pa.array([None if i % 89 == 0 else int(v)
                       for i, v in enumerate(lk)], pa.int64()),
        "lv": pa.array(np.arange(30000), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(list(range(0, 2000, 2)) + [None], pa.int64()),
        "rv": pa.array(np.arange(1001), pa.int64()),
    })
    a = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how="left anti", num_parts=8)
    b = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_on="k", how="left anti", num_parts=8,
                  bloom_prefilter=True)
    ta = pa.concat_tables(ray.get(a.to_arrow_refs()))
    tb = pa.concat_tables(
        t.select(sorted(t.column_names))
        for t in ray.get(b.to_arrow_refs()))
    assert _sorted(ta) == _sorted(tb)
    assert ta.num_rows > 0


def test_bloom_rejected_for_outer_and_anti_post(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError):
        hash_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                  left_on="k", how="left outer", bloom_prefilter=True)
    with pytest.raises(ValueError):
        hash_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                  left_on="k", how="left anti", bloom_prefilter=True,
                  post=lambda x: x)
