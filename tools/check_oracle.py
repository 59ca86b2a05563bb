"""Local simulation of the driver's correctness gate:
run queries() vs oracle_sql() via DuckDB at a given sf, compare
row-count + schema + order-insensitive value hash. Usage:
    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                got = res.to_pandas()
            else:
                got = res
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(got)} rows)")
            continue
        want = con.execute(sqls[name]).fetchdf()
        g, w = normalize(got.copy()), normalize(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        # order-insensitive value compare
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                same = (a.astype(str).values == b.astype(str).values).all()
            except Exception:  # noqa: BLE001
                same = False
            if not same:
                eq = False
                bad = (a.astype(str).values != b.astype(str).values)
                i = bad.argmax()
                print(f"FAIL {name}: col {c} differs at row {i}: "
                      f"{a.iloc[i]!r} vs {b.iloc[i]!r}")
                break
        if eq:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
