"""Single-pass table profiling (functions/profile.py) vs DuckDB,
including nulls, an all-null column, and exact distinct counts."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _table(n=1000, seed=11):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(-50, 50, n).astype(np.int64)
    vmask = rng.random(n) < 0.1  # 10% nulls
    langs = np.array(["de", "en", "fr", "ja"])[rng.integers(0, 4, n)]
    lmask = rng.random(n) < 0.05
    return pa.table({
        "id": pa.array(ids),
        "val": pa.array([None if m else int(v)
                         for v, m in zip(vals, vmask)], pa.int64()),
        "lang": pa.array([None if m else s
                          for s, m in zip(langs, lmask)], pa.string()),
        "empty": pa.array([None] * n, pa.string()),
    })


def test_table_profile_matches_duckdb(ray_session):
    import ray.data

    from vfs_index_ray.functions.profile import table_profile

    t = _table()
    got = table_profile(
        ray.data.from_arrow(t).repartition(7),
        num_cols=["id", "val"], str_cols=["lang", "empty"],
        distinct_cols=["lang", "empty"])
    rows = {r["col"]: r for r in got.to_pylist()}
    con = duckdb.connect()
    con.register("t", t)
    for c, numeric, dist in [("id", True, False), ("val", True, False),
                             ("lang", False, True),
                             ("empty", False, True)]:
        exp = con.execute(f"""
            SELECT count(*)::BIGINT,
                   sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT,
                   count(DISTINCT {c})::BIGINT,
                   CAST(min({c}) AS VARCHAR),
                   CAST(max({c}) AS VARCHAR)
            FROM t""").fetchone()
        r = rows[c]
        assert r["n_rows"] == exp[0]
        assert r["n_nulls"] == exp[1]
        if dist:
            assert r["n_distinct"] == exp[2]
        else:
            assert r["n_distinct"] is None
        assert r["min_val"] == exp[3]
        assert r["max_val"] == exp[4]


def test_table_profile_guards(ray_session):
    import ray.data

    from vfs_index_ray.functions.profile import table_profile

    t = _table(16)
    with pytest.raises(ValueError):
        table_profile(ray.data.from_arrow(t), num_cols=["id"],
                      str_cols=["lang"], distinct_cols=["nope"])


def test_table_profile_empty_input(ray_session):
    import ray.data

    from vfs_index_ray.functions.profile import table_profile

    t = _table(4).slice(0, 0)
    out = table_profile(ray.data.from_arrow(t), num_cols=["id"],
                        str_cols=["lang"])
    # partials with n=0 rows still merge to zero-count rows (or the
    # empty schema when no partials survive) — either way no crash
    assert set(out.column_names) == {"col", "n_rows", "n_nulls",
                                     "n_distinct", "min_val",
                                     "max_val"}
    for r in out.to_pylist():
        assert r["n_rows"] == 0
        assert r["min_val"] is None
