"""Incremental windowed-aggregate store with exactly-once absorb.

The aggregate analog of the index build's wave protocol (build.py):
a directory of per-input-file PARTIAL aggregates, each committed with
tmp+rename followed by a JSON sidecar — a partial without its sidecar
is invisible and gets recomputed, so absorbing is crash-idempotent and
re-absorbing a committed file is a no-op.  ``query()`` merges only
committed partials; results are byte-identical whether files were
absorbed one at a time, in any order, or all at once.

Partials are (type, window_us) → (count, x1e4-exact sum): the same
integer-exact fold the window family uses (windows.hopping_aggregate),
so a store query is DuckDB-comparable.  Scale shape: one Ray task per
un-absorbed file (wave parallelism = file count, like build waves);
each partial is windows × types rows regardless of input size, and
``query()`` reads only those tiny tables.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SCHEMA = pa.schema([("event_type", pa.string()),
                     ("window_us", pa.int64()),
                     ("n", pa.int64()),
                     ("s", pa.int64())])


def _file_key(path: str) -> str:
    # full-path cryptographic hash: the vectorized token FNV caps
    # hashed bytes (MAX_TOKEN_BYTES), so long same-length paths
    # differing only past the cap would collide and partials would
    # silently overwrite each other
    import hashlib
    return hashlib.sha1(
        os.path.abspath(path).encode("utf-8")).hexdigest()[:16]


def _partial_of(t: pa.Table, type_col: str, ts_col: str,
                val_col: str, win_us: int) -> pa.Table:
    from .functions.boilerplate import _group_counts
    us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    v = np.floor(t[val_col].to_numpy(zero_copy_only=False)
                 * 10000.0 + 0.5).astype(np.int64)
    w = (us // win_us) * win_us
    g = _group_counts(
        pa.table({"event_type": t[type_col],
                  "window_us": pa.array(w, pa.int64()),
                  "v": pa.array(v, pa.int64())}),
        ["event_type", "window_us"], [("v", "sum"), ("v", "count")])
    return pa.table({"event_type": g["event_type"].cast(pa.string()),
                     "window_us": g["window_us"].cast(pa.int64()),
                     "n": g["v_count"].cast(pa.int64()),
                     "s": g["v_sum"].cast(pa.int64())})


class AggStore:
    """Persistent incremental (type, window) aggregate over event
    files.  ``absorb(files)`` commits one partial per new file;
    ``query()`` merges committed partials."""

    def __init__(self, root: str, *, window_minutes: int = 60,
                 type_col: str = "event_type", ts_col: str = "ts",
                 val_col: str = "value"):
        self.root = root
        self.pdir = os.path.join(root, "partials")
        os.makedirs(self.pdir, exist_ok=True)
        self.win_us = window_minutes * 60_000_000
        self.cols = (type_col, ts_col, val_col)

    def _sidecar(self, key: str) -> str:
        return os.path.join(self.pdir, f"{key}.json")

    def _partial(self, key: str) -> str:
        return os.path.join(self.pdir, f"{key}.parquet")

    def committed(self) -> dict[str, dict]:
        out = {}
        for f in os.listdir(self.pdir):
            if f.endswith(".json"):
                with open(os.path.join(self.pdir, f)) as fh:
                    out[f[:-5]] = json.load(fh)
        return out

    def _live_keys(self, sides: dict[str, dict]) -> list[str]:
        """Partials that still count: committed and not replaced by a
        committed compaction."""
        replaced = set()
        for s in sides.values():
            replaced.update(s.get("replaces", ()))
        return [k for k in sides if k not in replaced]

    def _absorbed_keys(self, sides: dict[str, dict]) -> set[str]:
        """File keys that must not be re-absorbed: directly committed
        ones plus every file key a compaction absorbed (transitively,
        via source_keys)."""
        keys = set(sides)
        for s in sides.values():
            keys.update(s.get("source_keys", ()))
        return keys

    def absorb(self, files: list[str]) -> dict:
        """Compute + commit partials for files not yet committed.
        One Ray task per new file; tmp+rename, sidecar last."""
        import ray

        done = self._absorbed_keys(self.committed())
        todo = [(f, _file_key(f)) for f in files]
        todo = [(f, k) for f, k in todo if k not in done]
        type_col, ts_col, val_col = self.cols
        win_us, pdir = self.win_us, self.pdir

        @ray.remote(num_cpus=1)
        def one(path: str, key: str) -> int:
            t = pq.read_table(path,
                              columns=[type_col, ts_col, val_col],
                              use_threads=False)
            part = _partial_of(t, type_col, ts_col, val_col, win_us)
            tmp = os.path.join(pdir, f".{key}.parquet.tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(pdir, f"{key}.parquet"))
            side = {"source": os.path.abspath(path),
                    "rows": t.num_rows, "partial_rows": part.num_rows,
                    "ts": time.time()}
            stmp = os.path.join(pdir, f".{key}.json.tmp")
            with open(stmp, "w") as fh:
                json.dump(side, fh)
            os.replace(stmp, os.path.join(pdir, f"{key}.json"))
            return t.num_rows

        rows = ray.get([one.remote(f, k) for f, k in todo])
        return {"absorbed": len(todo), "skipped": len(files) - len(todo),
                "rows": int(sum(rows))}

    def compact(self) -> dict:
        """Fold all live partials into ONE committed generation
        partial (the budgeted-merge analog for the aggregate store) —
        crash-safe in the same sidecar-last style:

        1. gc partials a committed compaction already replaced
           (leftovers of a crash mid-delete — query ignores them
           either way);
        2. write the merged generation partial (tmp+rename), then its
           sidecar listing ``replaces`` (the live partial keys it
           subsumes) and ``source_keys`` (every FILE key absorbed,
           transitively — so re-absorbing those files stays a no-op
           after their sidecars are gone);
        3. delete the replaced partials' sidecars + files.

        A crash between (2) and (3) double-stores rows on disk but
        never double-COUNTS: ``query``/``absorb`` consult
        ``replaces``/``source_keys`` first.  Idempotent: the
        generation key is a content hash of the keys it replaces."""
        import hashlib

        from .functions.boilerplate import _group_counts

        sides = self.committed()
        replaced = set()
        for s in sides.values():
            replaced.update(s.get("replaces", ()))
        for k in list(sides):
            if k in replaced:  # gc leftovers from a crashed compact
                for p in (self._sidecar(k), self._partial(k)):
                    if os.path.exists(p):
                        os.remove(p)
                sides.pop(k)
        live = sorted(sides)
        if len(live) <= 1:
            return {"compacted": 0, "generation": None}
        src_keys: set[str] = set()
        sources: set[str] = set()
        for k in live:
            s = sides[k]
            if "source_keys" in s:
                src_keys.update(s["source_keys"])
                sources.update(s.get("sources", ()))
            else:
                src_keys.add(k)
                sources.add(s["source"])
        gen = "c" + hashlib.sha1(
            ",".join(live).encode()).hexdigest()[:15]
        parts = [pq.read_table(self._partial(k), use_threads=False)
                 for k in live]
        parts = [p for p in parts if p.num_rows]
        if parts:
            m = _group_counts(
                pa.concat_tables(parts).combine_chunks(),
                ["event_type", "window_us"],
                [("n", "sum"), ("s", "sum")])
            merged = pa.table({
                "event_type": m["event_type"].cast(pa.string()),
                "window_us": m["window_us"].cast(pa.int64()),
                "n": m["n_sum"].cast(pa.int64()),
                "s": m["s_sum"].cast(pa.int64())})
        else:
            merged = _SCHEMA.empty_table()
        tmp = os.path.join(self.pdir, f".{gen}.parquet.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, self._partial(gen))
        side = {"kind": "compact", "replaces": live,
                "source_keys": sorted(src_keys),
                "sources": sorted(sources), "ts": time.time()}
        stmp = os.path.join(self.pdir, f".{gen}.json.tmp")
        with open(stmp, "w") as fh:
            json.dump(side, fh)
        os.replace(stmp, self._sidecar(gen))
        for k in live:  # gc; crash here is benign (see docstring)
            for p in (self._sidecar(k), self._partial(k)):
                if os.path.exists(p):
                    os.remove(p)
        return {"compacted": len(live), "generation": gen}

    def query(self) -> pa.Table:
        """Merge committed partials → (event_type, window_us, n,
        sum_x1e4), sorted."""
        import pyarrow.compute as pc

        from .functions.boilerplate import _group_counts

        parts = [pq.read_table(self._partial(k), use_threads=False)
                 for k in self._live_keys(self.committed())]
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "window_us": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sum_x1e4": pa.array([], pa.int64())})
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return empty
        m = _group_counts(
            pa.concat_tables(parts).combine_chunks(),
            ["event_type", "window_us"], [("n", "sum"), ("s", "sum")])
        out = pa.table({"event_type": m["event_type"],
                        "window_us": m["window_us"],
                        "n": m["n_sum"].cast(pa.int64()),
                        "sum_x1e4": m["s_sum"].cast(pa.int64())})
        return out.take(pc.sort_indices(out, sort_keys=[
            ("event_type", "ascending"), ("window_us", "ascending")]))
