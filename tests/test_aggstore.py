"""Incremental windowed-aggregate store (aggstore.py): exactly-once
absorb, crash-idempotency, order-independence, brute-force equality."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _event_files(tmpdir, nfiles=4, n=3000, seed=3):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(nfiles):
        t = pa.table({
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]),
            "ts": pa.array((rng.integers(0, 5 * 86_400, n)
                            * 1_000_000).astype("datetime64[us]")),
            "value": pa.array(rng.random(n) * 50.0, pa.float64()),
        })
        p = os.path.join(tmpdir, f"ev-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def _brute(paths, win_us=3_600_000_000):
    agg = {}
    for p in paths:
        t = pq.read_table(p)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 10000.0 + 0.5).astype(np.int64)
        ty = t["event_type"].to_pylist()
        for k, u, x in zip(ty, us, v):
            w = (int(u) // win_us) * win_us
            c, s = agg.get((k, w), (0, 0))
            agg[(k, w)] = (c + 1, s + int(x))
    return agg


def _as_dict(tbl):
    return {(e, w): (n, s) for e, w, n, s in zip(
        tbl["event_type"].to_pylist(), tbl["window_us"].to_pylist(),
        tbl["n"].to_pylist(), tbl["sum_x1e4"].to_pylist())}


def test_absorb_incremental_equals_full_and_brute(ray_session,
                                                  tmp_path):
    from vfs_index_ray.aggstore import AggStore

    paths = _event_files(str(tmp_path))
    s1 = AggStore(str(tmp_path / "s1"))
    st = s1.absorb(paths[:2])
    assert st == {"absorbed": 2, "skipped": 0, "rows": 6000}
    s1.absorb(paths[2:])
    s2 = AggStore(str(tmp_path / "s2"))
    s2.absorb(list(reversed(paths)))  # any order
    q1, q2 = _as_dict(s1.query()), _as_dict(s2.query())
    assert q1 == q2 == _brute(paths)


def test_reabsorb_is_noop(ray_session, tmp_path):
    from vfs_index_ray.aggstore import AggStore

    paths = _event_files(str(tmp_path), nfiles=2)
    s = AggStore(str(tmp_path / "s"))
    s.absorb(paths)
    before = _as_dict(s.query())
    st = s.absorb(paths)
    assert st == {"absorbed": 0, "skipped": 2, "rows": 0}
    assert _as_dict(s.query()) == before


def test_crash_partial_without_sidecar_recomputed(ray_session,
                                                  tmp_path):
    from vfs_index_ray.aggstore import AggStore, _file_key

    paths = _event_files(str(tmp_path), nfiles=2)
    s = AggStore(str(tmp_path / "s"))
    s.absorb(paths)
    # simulate a crash between partial rename and sidecar commit:
    # delete file 0's sidecar and corrupt its partial
    key = _file_key(paths[0])
    os.remove(os.path.join(s.pdir, f"{key}.json"))
    with open(os.path.join(s.pdir, f"{key}.parquet"), "wb") as fh:
        fh.write(b"torn")
    # the torn partial is invisible (no sidecar): query sees file 1
    partial_view = _as_dict(s.query())
    assert partial_view == _brute(paths[1:])
    # re-absorb recomputes file 0 and converges to the full answer
    st = s.absorb(paths)
    assert st["absorbed"] == 1 and st["skipped"] == 1
    assert _as_dict(s.query()) == _brute(paths)
    side = json.load(open(os.path.join(s.pdir, f"{key}.json")))
    assert side["rows"] == 3000


def test_compact_preserves_answer_and_skips_reabsorb(ray_session,
                                                     tmp_path):
    from vfs_index_ray.aggstore import AggStore

    paths = _event_files(str(tmp_path))
    s = AggStore(str(tmp_path / "s"))
    s.absorb(paths[:3])
    before = _as_dict(s.query())
    st = s.compact()
    assert st["compacted"] == 3
    assert _as_dict(s.query()) == before == _brute(paths[:3])
    # absorbed files stay exactly-once after their sidecars are gone
    st = s.absorb(paths)
    assert st == {"absorbed": 1, "skipped": 3, "rows": 3000}
    assert _as_dict(s.query()) == _brute(paths)
    # second compact folds gen + the new partial; answer unchanged
    st2 = s.compact()
    assert st2["compacted"] == 2
    assert _as_dict(s.query()) == _brute(paths)
    # compacting a single live partial is a no-op
    assert s.compact() == {"compacted": 0, "generation": None}


def test_compact_crash_windows(ray_session, tmp_path):
    import os

    from vfs_index_ray.aggstore import AggStore

    paths = _event_files(str(tmp_path))
    s = AggStore(str(tmp_path / "s"))
    s.absorb(paths)
    want = _brute(paths)

    # crash AFTER the generation sidecar, BEFORE source deletion:
    # simulate by re-creating the replaced partials post-compact
    import shutil
    backup = str(tmp_path / "bk")
    shutil.copytree(s.pdir, backup)
    st = s.compact()
    gen = st["generation"]
    for f in os.listdir(backup):  # resurrect the replaced partials
        dst = os.path.join(s.pdir, f)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(backup, f), dst)
    # double-stored on disk but never double-counted
    assert _as_dict(s.query()) == want
    assert s.absorb(paths) == {"absorbed": 0, "skipped": 4, "rows": 0}
    # next compact garbage-collects the leftovers and stays correct
    s.compact()
    assert _as_dict(s.query()) == want
    live = [f for f in os.listdir(s.pdir) if f.endswith(".json")]
    assert len(live) == 1

    # crash BEFORE the sidecar: a bare generation parquet is invisible
    s2 = AggStore(str(tmp_path / "s2"))
    s2.absorb(paths[:2])
    with open(os.path.join(s2.pdir, "cdeadbeef.parquet"), "wb") as fh:
        fh.write(b"torn")
    assert _as_dict(s2.query()) == _brute(paths[:2])
