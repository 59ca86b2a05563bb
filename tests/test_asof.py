"""As-of join (latest strictly-prior right-type event per key)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mk_events(rows):
    """rows: (event_id, user_id, ts_us, event_type)."""
    import ray.data
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], dtype=np.int64
                                ).astype("datetime64[us]")),
        "event_type": pa.array([r[3] for r in rows]),
    }))


def _brute(rows, left, right):
    out = {}
    for eid, uid, ts, typ in rows:
        if typ != left:
            continue
        cands = [(r[2], r[0]) for r in rows
                 if r[3] == right and r[1] == uid
                 and (r[2], r[0]) < (ts, eid)]
        if cands:
            mts, mid = max(cands)
            out[eid] = (mid, ts - mts)
        else:
            out[eid] = (-1, -1)
    return out


def _run(ds, **kw):
    from vfs_index_ray.functions.windows import asof_prior
    rows = asof_prior(ds, **kw).take_all()
    return {r["event_id"]: (r["match_event_id"], r["lag_us"])
            for r in rows}


def test_asof_matches_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(7)
    rows = []
    for eid in range(400):
        rows.append((eid, int(rng.integers(0, 12)),
                     int(rng.integers(0, 10_000)) * 1_000_000,
                     ["click", "purchase", "view"][int(rng.integers(3))]))
    got = _run(_mk_events(rows), left_type="purchase", right_type="click")
    assert got == _brute(rows, "purchase", "click")


def test_asof_no_prior_match_is_sentinel(ray_session):
    rows = [(1, 5, 100, "purchase"), (2, 5, 200, "click"),
            (3, 5, 300, "purchase")]
    got = _run(_mk_events(rows), left_type="purchase", right_type="click")
    assert got[1] == (-1, -1)
    assert got[3] == (2, 100)


def test_asof_user_runs_do_not_leak(ray_session):
    """A click by another user must never match, even when adjacent in
    the global sort order."""
    rows = [(1, 1, 100, "click"), (2, 2, 200, "purchase")]
    got = _run(_mk_events(rows), left_type="purchase", right_type="click")
    assert got[2] == (-1, -1)


def test_asof_ts_tie_breaks_by_event_id(ray_session):
    """Same timestamp: a click with smaller event_id precedes the
    purchase; with larger event_id it does not."""
    rows = [(10, 1, 500, "click"), (11, 1, 500, "purchase"),
            (20, 2, 500, "purchase"), (21, 2, 500, "click")]
    got = _run(_mk_events(rows), left_type="purchase", right_type="click")
    assert got[11] == (10, 0)
    assert got[20] == (-1, -1)


def test_asof_self_type(ray_session):
    """left_type == right_type: previous event of the same type."""
    rows = [(1, 1, 100, "click"), (2, 1, 250, "click"),
            (3, 1, 400, "click")]
    got = _run(_mk_events(rows), left_type="click", right_type="click")
    assert got == {1: (-1, -1), 2: (1, 150), 3: (2, 150)}


def _brute_window(rows, left, right, window_us):
    out = {}
    for eid, uid, ts, typ in rows:
        if typ != left:
            continue
        out[eid] = sum(1 for r in rows
                       if r[3] == right and r[1] == uid
                       and r[2] > ts - window_us
                       and (r[2], r[0]) < (ts, eid))
    return out


def _run_window(ds, **kw):
    from vfs_index_ray.functions.windows import window_count_prior
    rows = window_count_prior(ds, **kw).take_all()
    return {r["event_id"]: r["n_window"] for r in rows}


def test_window_count_matches_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(11)
    rows = []
    for eid in range(400):
        rows.append((eid, int(rng.integers(0, 10)),
                     int(rng.integers(0, 200)) * 60_000_000,
                     ["click", "purchase", "view"][int(rng.integers(3))]))
    got = _run_window(_mk_events(rows), left_type="purchase",
                      right_type="click", window_minutes=60)
    assert got == _brute_window(rows, "purchase", "click", 3_600_000_000)


def test_window_count_bounds_are_half_open(ray_session):
    """Click exactly AT ts - window is excluded; click strictly inside
    counts; click at the purchase ts with smaller id counts."""
    W = 3_600_000_000
    rows = [(1, 1, 0, "click"),           # at low end -> excluded
            (2, 1, 1, "click"),           # inside
            (3, 1, W, "purchase"),
            (2000, 2, 500, "click"),      # same ts, smaller id -> counts
            (2001, 2, 500, "purchase"),
            (2002, 2, 500, "click")]      # same ts, larger id -> excluded
    got = _run_window(_mk_events(rows), left_type="purchase",
                      right_type="click", window_minutes=60)
    assert got == {3: 1, 2001: 1}


def test_window_count_self_type_excludes_self(ray_session):
    rows = [(1, 1, 0, "click"), (2, 1, 1_000_000, "click"),
            (3, 1, 2_000_000, "click")]
    got = _run_window(_mk_events(rows), left_type="click",
                      right_type="click", window_minutes=60)
    assert got == {1: 0, 2: 1, 3: 2}


def test_window_count_partition_invariance(ray_session):
    rows = [(eid, eid % 5, (eid * 97) % 500 * 60_000_000,
             ["click", "purchase"][eid % 2]) for eid in range(120)]
    a = _run_window(_mk_events(rows), left_type="purchase",
                    right_type="click", num_partitions=1)
    b = _run_window(_mk_events(rows), left_type="purchase",
                    right_type="click", num_partitions=8)
    assert a == b


def test_asof_partition_count_invariance(ray_session):
    rows = [(eid, eid % 7, (eid * 37) % 1000 * 1_000_000,
             ["click", "purchase"][eid % 2]) for eid in range(100)]
    a = _run(_mk_events(rows), left_type="purchase", right_type="click",
             num_partitions=1)
    b = _run(_mk_events(rows), left_type="purchase", right_type="click",
             num_partitions=8)
    assert a == b
