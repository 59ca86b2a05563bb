"""HyperLogLog approximate count-distinct (functions/sketches.py):
partition-invariant, null-safe, SQL-oracle-identical, and within the
expected error band for m=64 (~13% typical, test allows 3 sigma)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _run(tbl, **kw):
    import ray.data

    from vfs_index_ray.functions.sketches import approx_distinct
    return approx_distinct(ray.data.from_arrow(tbl),
                           key_col="user_id", group_col="event_type",
                           **kw)


def _mk(groups, rng_seed=1):
    """groups: dict name -> n_distinct; each key appears 1-3 times."""
    g = np.random.Generator(np.random.Philox(key=[rng_seed, 0]))
    names, ids = [], []
    base = 0
    for name, n in groups.items():
        ks = np.arange(base, base + n, dtype=np.int64)
        base += n
        reps = g.integers(1, 4, size=n)
        names.extend([name] * int(reps.sum()))
        ids.extend(np.repeat(ks, reps).tolist())
    return pa.table({"event_type": pa.array(names, pa.string()),
                     "user_id": pa.array(ids, pa.int64())})


def test_accuracy_band(ray_session):
    groups = {"a": 100, "b": 1000, "c": 10000}
    t = _run(_mk(groups))
    got = dict(zip(t["event_type"].to_pylist(),
                   t["approx_distinct"].to_pylist()))
    for name, n in groups.items():
        # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
        assert abs(got[name] - n) <= max(3, 0.39 * n), (name, got[name])


def test_partition_invariant(ray_session):
    """Same rows, different block layouts -> identical sketch output
    (max-merge is order- and partition-free)."""
    import ray.data
    tbl = _mk({"a": 500, "b": 50})
    idx = np.arange(tbl.num_rows)
    perm = np.random.Generator(np.random.Philox(key=[9, 0])
                               ).permutation(idx)
    shuffled = tbl.take(pa.array(perm))
    a = _run(tbl)
    from vfs_index_ray.functions.sketches import approx_distinct
    b = approx_distinct(
        ray.data.from_arrow(shuffled).repartition(7),
        key_col="user_id", group_col="event_type")
    assert a.to_pydict() == b.to_pydict()


def test_nulls_ignored(ray_session):
    tbl = _mk({"a": 200})
    with_nulls = pa.table({
        "event_type": pa.concat_arrays(
            [tbl["event_type"].combine_chunks(),
             pa.array(["a", None], pa.string())]),
        "user_id": pa.concat_arrays(
            [tbl["user_id"].combine_chunks(),
             pa.array([None, 5], pa.int64())]),
    })
    assert _run(tbl).to_pydict() == _run(with_nulls).to_pydict()


def test_small_groups_linear_counting_near_exact(ray_session):
    """Tiny cardinalities ride the linear-counting path: near-exact
    (collisions among 64 registers cost at most a few)."""
    groups = {"x": 1, "y": 7, "z": 30}
    t = _run(_mk(groups))
    got = dict(zip(t["event_type"].to_pylist(),
                   t["approx_distinct"].to_pylist()))
    for name, n in groups.items():
        assert abs(got[name] - n) <= max(1, 0.1 * n), (name, got[name], n)


def test_matches_sql_oracle(ray_session, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    import pyarrow.parquet as pq

    from vfs_index_ray.functions.sketches import hll_oracle_sql

    tbl = _mk({"a": 3, "b": 400, "c": 12000}, rng_seed=4)
    src = str(tmp_path / "ev.parquet")
    pq.write_table(tbl, src)
    import ray.data
    from vfs_index_ray.functions.sketches import approx_distinct
    eng = approx_distinct(ray.data.read_parquet(src),
                          key_col="user_id", group_col="event_type")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{src}')")
    got = con.sql(hll_oracle_sql("events", "user_id",
                                 "event_type")).arrow()
    assert eng.to_pydict() == got.to_pydict()
