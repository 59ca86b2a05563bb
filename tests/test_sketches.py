"""Mergeable sketches (functions/sketches.py): HyperLogLog approximate
count-distinct — partition-invariant, null-safe, SQL-oracle-identical,
within the expected error band for m=64 (~13% typical, 3 sigma) — and
Count-Min-Sketch approximate frequency (upper-bound, additive-merge,
SQL-oracle-identical)."""

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


def _cms_tbl(rng_seed=2, n_keys=300, n_rows=20000):
    g = np.random.Generator(np.random.Philox(key=[rng_seed, 0]))
    ids = g.integers(0, n_keys, size=n_rows).astype(np.int64)
    return pa.table({"user_id": pa.array(ids, pa.int64())})


def test_cms_upper_bound_and_tightness(ray_session):
    """CMS estimates never undercount, and at 4x1024 over 300 keys
    the inflation is bounded by the epsilon*N guarantee."""
    import ray.data

    from vfs_index_ray.functions.sketches import cms_counts
    tbl = _cms_tbl()
    keys = list(range(0, 300, 7)) + [10**9]
    t = cms_counts(ray.data.from_arrow(tbl),
                   key_col="user_id", query_keys=keys)
    vals, counts = np.unique(tbl["user_id"].to_numpy(),
                             return_counts=True)
    exact = dict(zip(vals.tolist(), counts.tolist()))
    n_total = tbl.num_rows
    for k, e in zip(t["user_id"].to_pylist(),
                    t["approx_count"].to_pylist()):
        x = exact.get(k, 0)
        assert e >= x, (k, e, x)
        # epsilon = e/w per row; min over 4 rows is far tighter, use
        # the single-row Markov bound x + 2*e*N/w as a loose ceiling
        assert e <= x + 2 * 2.718281828 * n_total / 1024, (k, e, x)


def test_cms_partition_invariant_and_null_safe(ray_session):
    import ray.data

    from vfs_index_ray.functions.sketches import cms_counts
    tbl = _cms_tbl(rng_seed=5, n_keys=50, n_rows=5000)
    keys = [0, 1, 2, 49]
    a = cms_counts(ray.data.from_arrow(tbl),
                   key_col="user_id", query_keys=keys)
    perm = np.random.Generator(np.random.Philox(key=[7, 0])
                               ).permutation(tbl.num_rows)
    with_nulls = pa.table({"user_id": pa.concat_arrays(
        [tbl.take(pa.array(perm))["user_id"].combine_chunks(),
         pa.array([None, None], pa.int64())])})
    b = cms_counts(ray.data.from_arrow(with_nulls).repartition(9),
                   key_col="user_id", query_keys=keys)
    assert a.to_pydict() == b.to_pydict()


def test_cms_matches_sql_oracle(ray_session, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    import pyarrow.parquet as pq
    import ray.data

    from vfs_index_ray.functions.sketches import (cms_counts,
                                                  cms_oracle_sql)
    tbl = _cms_tbl(rng_seed=11)
    src = str(tmp_path / "ev.parquet")
    pq.write_table(tbl, src)
    keys = [0, 3, 17, 299, 12345]
    eng = cms_counts(ray.data.read_parquet(src),
                     key_col="user_id", query_keys=keys)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{src}')")
    got = con.sql(cms_oracle_sql("events", "user_id", keys)).arrow()
    assert eng.to_pydict() == got.to_pydict()
