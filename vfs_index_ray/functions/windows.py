"""Event-time windowing over a stream-shaped table (SURVEY §2.10).

Ray Data is a (streaming-)batch engine with no watermarks; windows are
expressed as groupbys over an ordered, partitioned log: partition by key
(user), order by event time within the partition, window inside
``map_groups`` (ray_guide.md pattern). Ordering assumption: per-key
event order is fully determined by (ts, event_id) — both carried in the
table — so results are deterministic under any shuffle.

- ``sessionize``: gap-based session windows per user (session breaks when
  the gap to the previous event exceeds ``gap``). SQL-oracle-equivalent
  via lag()/cumulative sum window functions.
- tumbling windows live in pipelines/queries.py (``events_hourly``) as a
  plain two-key groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(events_ds, *, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id"):
    """events → one row per (user, session): session_id (0-based per
    user, in time order), session_start, session_end, n_events."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        breaks = g[ts_col].diff() > gap
        sess = breaks.cumsum().astype(np.int64)
        out = g.groupby(sess).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(id_col, "count"),
        ).reset_index(names="session_id")
        out.insert(0, user_col, g[user_col].iloc[0])
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return events_ds.groupby(user_col).map_groups(per_user,
                                                  batch_format="pandas")


def sessionize_table(events_ds, **kw) -> pa.Table:
    """Driver-side convenience: run sessionize and return a pyarrow
    Table with a stable column order/types."""
    rows = sessionize(events_ds, **kw).take_all()
    tbl = pa.Table.from_pylist(rows)
    return tbl.select(["user_id", "session_id", "session_start",
                       "session_end", "n_events"]).cast(pa.schema([
                           ("user_id", pa.int64()),
                           ("session_id", pa.int64()),
                           ("session_start", pa.timestamp("us")),
                           ("session_end", pa.timestamp("us")),
                           ("n_events", pa.int64()),
                       ]))
