"""Multi-column equi-join keys (functions/joins.py): co-partitioned
hash_join with list keys is DuckDB-differential-identical across join
types, handles nulls in any key column (ANSI), mixed int/string keys,
and composes with the bloom prefilter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk_pair(seed=41):
    g = np.random.Generator(np.random.Philox(key=[seed, 0]))
    n = 8000
    a = g.integers(0, 40, n)
    b = g.integers(0, 25, n)
    left = pa.table({
        "ka": pa.array([None if i % 53 == 0 else int(v)
                        for i, v in enumerate(a)], pa.int64()),
        "kb": pa.array([f"s{v}" if i % 71 else None
                        for i, v in enumerate(b)], pa.string()),
        "lv": pa.array(np.arange(n), pa.int64()),
    })
    m = 300
    ra = g.integers(0, 40, m)
    rb = g.integers(0, 25, m)
    right = pa.table({
        "ka": pa.array([None if i % 29 == 0 else int(v)
                        for i, v in enumerate(ra)], pa.int64()),
        "kb": pa.array([f"s{v}" for v in rb], pa.string()),
        "rv": pa.array(np.arange(m), pa.int64()),
    })
    return left, right


def _duck(left, right, how):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    sql = {
        "inner": """SELECT l.ka, l.kb, l.lv, r.rv FROM l
                    JOIN r ON l.ka = r.ka AND l.kb = r.kb""",
        "left semi": """SELECT l.ka, l.kb, l.lv FROM l
                        WHERE EXISTS (SELECT 1 FROM r
                          WHERE l.ka = r.ka AND l.kb = r.kb)""",
        "left anti": """SELECT l.ka, l.kb, l.lv FROM l
                        WHERE NOT EXISTS (SELECT 1 FROM r
                          WHERE l.ka = r.ka AND l.kb = r.kb)""",
        "left outer": """SELECT l.ka, l.kb, l.lv, r.rv FROM l
                         LEFT JOIN r
                         ON l.ka = r.ka AND l.kb = r.kb""",
    }[how]
    return con.sql(sql).arrow()


def _norm(t: pa.Table) -> list:
    import pyarrow.compute as pc
    cols = sorted(t.column_names)
    t = t.select(cols)
    order = pc.sort_indices(t, sort_keys=[(c, "ascending")
                                          for c in cols])
    return t.take(order).to_pylist()


@pytest.mark.parametrize("how",
                         ["inner", "left semi", "left anti",
                          "left outer"])
def test_multikey_matches_duckdb(ray_session, how):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    left, right = _mk_pair()
    out = hash_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right),
                    left_on=["ka", "kb"], how=how, num_parts=8)
    got = pa.concat_tables(
        t.select(sorted(t.column_names))
        for t in ray.get(out.to_arrow_refs()))
    want = _duck(left, right, how)
    assert _norm(got) == _norm(want)


def test_multikey_bloom_identical(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    left, right = _mk_pair(seed=43)
    a = hash_join(ray.data.from_arrow(left),
                  ray.data.from_arrow(right),
                  left_on=["ka", "kb"], how="inner", num_parts=8)
    b = hash_join(ray.data.from_arrow(left),
                  ray.data.from_arrow(right),
                  left_on=["ka", "kb"], how="inner", num_parts=8,
                  bloom_prefilter=True)
    ta = pa.concat_tables(ray.get(a.to_arrow_refs()))
    tb = pa.concat_tables(ray.get(b.to_arrow_refs()))
    assert _norm(ta) == _norm(tb)
    assert ta.num_rows > 0


def test_multikey_different_right_names(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    left = pa.table({"a": pa.array([1, 1, 2, 3], pa.int64()),
                     "b": pa.array(["x", "y", "x", "z"], pa.string()),
                     "lv": pa.array([0, 1, 2, 3], pa.int64())})
    right = pa.table({"ra": pa.array([1, 2], pa.int64()),
                      "rb": pa.array(["y", "x"], pa.string()),
                      "rv": pa.array([10, 20], pa.int64())})
    out = hash_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right),
                    left_on=["a", "b"], right_on=["ra", "rb"],
                    how="inner", num_parts=4)
    got = pa.concat_tables(ray.get(out.to_arrow_refs()))
    rows = {(r["a"], r["b"], r["rv"]) for r in got.to_pylist()}
    assert rows == {(1, "y", 10), (2, "x", 20)}


def test_salt_rejected_for_multikey(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    t = pa.table({"a": pa.array([1], pa.int64()),
                  "b": pa.array([2], pa.int64())})
    with pytest.raises(ValueError):
        hash_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                  left_on=["a", "b"], salt=4, salt_keys=[(1, 2)])
