"""Round-5 analytics additions: cube/grouping-sets aggregate and the
per-key rank kernel — differential-tested against DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _rand_events(n=4000, users=37, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(
            rng.integers(0, users, n).astype(np.int64)),
        "grp": pa.array(
            rng.integers(0, 3, n).astype(np.int64)),
        # duplicate values so dense_rank != rank
        "value": pa.array(
            np.round(rng.uniform(0, 50, n), 1)),
    })


def test_rank_kernel_matches_duckdb():
    from vfs_index_ray.functions.windows import _rank_kernel

    t = _rand_events()
    out = _rank_kernel(t, "user_id", "value", "event_id")
    got = out.select(
        ["event_id", "rnk", "drnk", "pct_rank_x1e6"]).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("e", t)
    want = con.sql("""
      WITH r AS (
        SELECT event_id,
               rank() OVER w AS rnk,
               dense_rank() OVER (PARTITION BY user_id
                                  ORDER BY value DESC) AS drnk,
               percent_rank() OVER w AS pr
        FROM e
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY value DESC, event_id ASC)
      )
      SELECT event_id, rnk::BIGINT AS rnk, drnk::BIGINT AS drnk,
             CAST(floor(pr * 1000000 + 0.5) AS BIGINT)
               AS pct_rank_x1e6
      FROM r ORDER BY event_id
    """).df()
    assert (got["rnk"].to_numpy() == want["rnk"].to_numpy()).all()
    assert (got["drnk"].to_numpy() == want["drnk"].to_numpy()).all()
    assert (got["pct_rank_x1e6"].to_numpy()
            == want["pct_rank_x1e6"].to_numpy()).all()


def test_rank_per_key_partition_invariant(ray_session):
    """Hash-partitioned rank == whole-table kernel (partitioning is
    by key, so no key straddles partitions)."""
    import ray.data

    from vfs_index_ray.functions.windows import (_rank_kernel,
                                                 rank_per_key)

    t = _rand_events(n=2500, users=19, seed=11)
    ds = ray.data.from_arrow(t).repartition(6)
    out = pa.concat_tables(
        [b for b in ray.get(
            rank_per_key(ds, key_col="user_id", val_col="value",
                         id_col="event_id").to_arrow_refs())
         if b.num_rows])
    one = _rank_kernel(t, "user_id", "value", "event_id")
    o = out.select(["event_id", "rnk", "drnk", "pct_rank_x1e6"])
    w = one.select(["event_id", "rnk", "drnk", "pct_rank_x1e6"])
    import pyarrow.compute as pc
    o = o.take(pc.sort_indices(o, sort_keys=[("event_id",
                                              "ascending")]))
    w = w.take(pc.sort_indices(w, sort_keys=[("event_id",
                                              "ascending")]))
    assert o.equals(w)


def test_cube_aggregate_matches_duckdb(ray_session):
    import ray.data

    from vfs_index_ray.functions.boilerplate import cube_aggregate

    t = _rand_events(n=3000, users=23, seed=3)
    vx = np.floor(t["value"].to_numpy() * 10 + 0.5).astype(np.int64)
    src = pa.table({"user_id": t["user_id"], "grp": t["grp"],
                    "v": pa.array(vx, pa.int64())})
    ds = ray.data.from_arrow(src).repartition(5)
    got = cube_aggregate(ds, ["user_id", "grp"],
                         [("v", "count"), ("v", "sum")],
                         sentinels={"user_id": -1, "grp": -1})
    got = got.to_pandas().sort_values(
        ["user_id", "grp"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("s", src)
    want = con.sql("""
      SELECT COALESCE(user_id, -1)::BIGINT AS user_id,
             COALESCE(grp, -1)::BIGINT AS grp,
             count(v)::BIGINT AS v_count, sum(v)::BIGINT AS v_sum
      FROM s GROUP BY CUBE(user_id, grp) ORDER BY user_id, grp
    """).df()
    assert (got["user_id"].to_numpy()
            == want["user_id"].to_numpy()).all()
    assert (got["grp"].to_numpy() == want["grp"].to_numpy()).all()
    assert (got["v_count"].to_numpy()
            == want["v_count"].to_numpy()).all()
    assert (got["v_sum"].to_numpy() == want["v_sum"].to_numpy()).all()


def test_grouping_sets_rejects_non_subset(ray_session):
    import ray.data

    from vfs_index_ray.functions.boilerplate import (
        grouping_sets_aggregate)

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "v": pa.array([3, 4], pa.int64())}))
    with pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["a"], [("v", "sum")],
                                sets=[["a"], ["bogus"]])


@pytest.mark.parametrize("k,users,n", [(4, 37, 4000), (5, 3, 7),
                                       (3, 2, 2)])
def test_ntile_matches_duckdb(k, users, n):
    from vfs_index_ray.functions.windows import _rank_kernel

    t = _rand_events(n=n, users=users)
    out = _rank_kernel(t, "user_id", "value", "event_id", ntile=k)
    con = duckdb.connect()
    con.register("e", t)
    exp = con.execute(f"""
        SELECT event_id, ntile({k}) OVER (PARTITION BY user_id
            ORDER BY value DESC, event_id)::BIGINT AS nt
        FROM e ORDER BY event_id""").arrow()
    got = dict(zip(out["event_id"].to_pylist(),
                   out["ntile"].to_pylist()))
    want = dict(zip(exp["event_id"].to_pylist(),
                    exp["nt"].to_pylist()))
    assert got == want
