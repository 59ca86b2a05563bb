"""Distributed equi-join tests (functions/joins.py): broadcast vs
co-partitioned hash join, inner + left outer, int + string keys,
per-partition post kernel, and a DuckDB cross-check."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _left_table(n=2000, seed=7):
    rng = np.random.Philox(key=[seed, 0])
    g = np.random.Generator(rng)
    return pa.table({
        "k": pa.array(g.integers(0, 300, n), pa.int64()),
        "v": pa.array(g.integers(0, 1000, n), pa.int64()),
    })


def _right_table():
    # keys 0..249: left keys 250..299 are unmatched on purpose
    return pa.table({
        "k2": pa.array(np.arange(250), pa.int64()),
        "w": pa.array(np.arange(250) * 10, pa.int64()),
    })


def _sorted(t: pa.Table) -> pa.Table:
    cols = sorted(t.column_names)
    t = t.select(cols)
    return t.take(pc.sort_indices(t, sort_keys=[(c, "ascending")
                                                for c in cols]))


def _duck(lt, rt, how):
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    return con.execute(
        f"SELECT l.k, l.v, r.w FROM l {jt} r ON l.k = r.k2").arrow()


@pytest.mark.parametrize("how", ["inner", "left outer"])
def test_hash_join_matches_duckdb(ray_session, how):
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    lt, rt = _left_table(), _right_table()
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_on="k", right_on="k2", how=how, num_parts=5)
    got = _sorted(pa.concat_tables(ray.get(out.to_arrow_refs()))
                  .combine_chunks())
    want = _sorted(_duck(lt, rt, how))
    assert got.equals(want.cast(got.schema))


def test_broadcast_join_matches_hash_join(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import broadcast_join, hash_join

    lt, rt = _left_table(seed=11), _right_table()
    b = broadcast_join(ray.data.from_arrow(lt), rt, left_on="k",
                       right_on="k2", how="inner")
    h = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                  left_on="k", right_on="k2", how="inner", num_parts=7)
    import ray
    bt = _sorted(pa.concat_tables(ray.get(b.to_arrow_refs()))
                 .combine_chunks())
    ht = _sorted(pa.concat_tables(ray.get(h.to_arrow_refs()))
                 .combine_chunks())
    assert bt.equals(ht.cast(bt.schema))


def test_hash_join_string_keys_and_post(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    lt = pa.table({"s": pa.array(["a", "b", "a", "c", "b", "a"]),
                   "n": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    rt = pa.table({"s": pa.array(["a", "b", "d"]),
                   "m": pa.array([10, 20, 40], pa.int64())})

    def post(j: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(j, ["s"], use_threads=False).aggregate(
            [("n", "sum")])
        return g

    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_on="s", how="inner", num_parts=3, post=post)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    got = dict(zip(t["s"].to_pylist(), t["n_sum"].to_pylist()))
    assert got == {"a": 10, "b": 7}  # c unmatched, d never probed


def test_hash_join_empty_right(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    lt = _left_table(n=50)
    rt = pa.table({"k2": pa.array([], pa.int64()),
                   "w": pa.array([], pa.int64())})
    inner = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                      left_on="k", right_on="k2", how="inner",
                      num_parts=3)
    assert inner is None or sum(
        t.num_rows for t in ray.get(inner.to_arrow_refs())) == 0
    louter = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                       left_on="k", right_on="k2", how="left outer",
                       num_parts=3)
    t = pa.concat_tables(ray.get(louter.to_arrow_refs())).combine_chunks()
    assert t.num_rows == 50 and t["w"].null_count == 50


@pytest.mark.parametrize("how,sql", [
    ("left semi", "SELECT l.k, l.v FROM l SEMI JOIN r ON l.k = r.k2"),
    ("left anti", "SELECT l.k, l.v FROM l ANTI JOIN r ON l.k = r.k2"),
])
def test_hash_join_semi_anti(ray_session, how, sql):
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join

    lt, rt = _left_table(seed=21), _right_table()
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_on="k", right_on="k2", how=how, num_parts=5)
    got = _sorted(pa.concat_tables(ray.get(out.to_arrow_refs()))
                  .combine_chunks())
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    want = _sorted(con.execute(sql).arrow())
    assert got.equals(want.cast(got.schema))


def test_join_auto_dispatch(ray_session):
    """Small right side -> broadcast; both give identical results."""
    import ray
    import ray.data

    from vfs_index_ray.functions.joins import hash_join, join_auto

    lt, rt = _left_table(seed=31), _right_table()
    a = join_auto(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                  left_on="k", right_on="k2", how="inner")
    h = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                  left_on="k", right_on="k2", how="inner", num_parts=4)
    at = _sorted(pa.concat_tables(ray.get(a.to_arrow_refs()))
                 .combine_chunks())
    ht = _sorted(pa.concat_tables(ray.get(h.to_arrow_refs()))
                 .combine_chunks())
    assert at.cast(ht.schema).equals(ht)


@pytest.mark.parametrize("how", ["inner", "left outer", "left semi",
                                 "left anti"])
def test_hash_join_salted_matches_unsalted(ray_session, how):
    """Hot-key mitigation: 70% of probe rows share one key; salt=4
    must give identical results to salt=1 for every join type."""
    import ray
    import ray.data

    g = np.random.Generator(np.random.Philox(key=[41, 0]))
    n = 3000
    keys = np.where(g.random(n) < 0.7, 7,
                    g.integers(0, 300, n)).astype(np.int64)
    lt = pa.table({"k": pa.array(keys, pa.int64()),
                   "v": pa.array(np.arange(n), pa.int64())})
    rt = _right_table()

    from vfs_index_ray.functions.joins import hash_join

    def run(salt):
        out = hash_join(ray.data.from_arrow(lt),
                        ray.data.from_arrow(rt), left_on="k",
                        right_on="k2", how=how, num_parts=5, salt=salt,
                        salt_keys=[7] if salt > 1 else None)
        return _sorted(pa.concat_tables(ray.get(out.to_arrow_refs()))
                       .combine_chunks())

    a, b = run(1), run(4)
    assert a.equals(b.cast(a.schema))


def test_detect_hot_keys(ray_session):
    import ray.data

    from vfs_index_ray.functions.joins import detect_hot_keys

    g = np.random.Generator(np.random.Philox(key=[51, 0]))
    n = 20_000
    keys = np.where(g.random(n) < 0.4, 7,
                    g.integers(0, 5000, n)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    hot = detect_hot_keys(ds, "k", threshold_frac=0.05)
    assert hot == [7]
