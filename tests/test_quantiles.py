"""Exact grouped discrete quantiles on the fixed-point grid."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _mk_ds(keys, vals):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(keys),
        "value": pa.array(vals, pa.float64()),
    }))


def _brute(keys, vals, pcts, scale=10_000):
    by = {}
    for k, v in zip(keys, vals):
        if v is not None and not math.isnan(v):
            by.setdefault(k, []).append(math.floor(v * scale + 0.5))
    out = {}
    for k, vs in by.items():
        vs.sort()
        n = len(vs)
        for p in pcts:
            rank = -(-(p * n) // 100)
            out[(k, p)] = vs[rank - 1]
    return out


def _run(ds, pcts=(50, 90, 99)):
    from vfs_index_ray.functions.quantiles import grouped_quantiles
    t = grouped_quantiles(ds, pcts=pcts)
    return {(k, p): v for k, p, v in zip(t["event_type"].to_pylist(),
                                         t["pct"].to_pylist(),
                                         t["value_x1e4"].to_pylist())}


def test_quantiles_match_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(3)
    keys = [["a", "b", "c"][i] for i in rng.integers(0, 3, 500)]
    vals = (rng.random(500) * 100 - 50).tolist()
    assert _run(_mk_ds(keys, vals)) == _brute(keys, vals, (50, 90, 99))


def test_quantiles_match_duckdb_exactly(ray_session):
    """Direct cross-check against quantile_disc, including the n=400 /
    p99 decimal-arithmetic boundary (float ceil would be off by one)."""
    import duckdb
    rng = np.random.default_rng(5)
    keys = ["k"] * 400
    vals = (np.arange(1, 401, dtype=np.float64) / 7.0)
    perm = rng.permutation(400)
    vals = vals[perm].tolist()
    got = _run(_mk_ds(keys, vals))
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(
        {"event_type": keys, "value": vals}))
    for p, q in [(50, "0.50"), (90, "0.90"), (99, "0.99")]:
        exp = con.execute(
            "SELECT quantile_disc(CAST(floor(value*10000+0.5) AS BIGINT)"
            f", {q}) FROM t").fetchone()[0]
        assert got[("k", p)] == exp


def test_quantiles_ties_and_duplicates(ray_session):
    keys = ["x"] * 10
    vals = [1.0] * 9 + [2.0]
    got = _run(_mk_ds(keys, vals), pcts=(50, 90, 99))
    assert got[("x", 50)] == 10_000
    assert got[("x", 90)] == 10_000      # rank 9 -> still the 1.0 run
    assert got[("x", 99)] == 20_000      # rank 10 -> the single 2.0


def test_quantiles_null_values_excluded(ray_session):
    keys = ["x"] * 4
    vals = [None, 1.0, None, 3.0]
    got = _run(_mk_ds(keys, vals), pcts=(50,))
    assert got == {("x", 50): 10_000}


def test_grouped_quantiles_interpolated_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from vfs_index_ray.functions.quantiles import grouped_quantiles

    rng = np.random.default_rng(5)
    n = 4001
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    vals = rng.random(n) * 50.0
    t = pa.table({"event_type": pa.array(keys),
                  "value": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(6)
    got = grouped_quantiles(ds, pcts=(50, 90, 99), interpolated=True)

    # serial integer reference: lo*(100-frac) + hi*frac on the grid
    vq = np.floor(vals * 10_000 + 0.5).astype(np.int64)
    want = {}
    for k in "abc":
        s = np.sort(vq[keys == k])
        for pct in (50, 90, 99):
            idx, frac = divmod(pct * (len(s) - 1), 100)
            hi = min(idx + 1, len(s) - 1)
            want[(k, pct)] = int(s[idx]) * (100 - frac) \
                + int(s[hi]) * frac
    assert got.num_rows == 9
    for i in range(9):
        k = got["event_type"][i].as_py()
        pct = got["pct"][i].as_py()
        assert got["value_x1e6"][i].as_py() == want[(k, pct)]
