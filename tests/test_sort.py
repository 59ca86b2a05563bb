"""Distributed global sort (functions/sort.py): differential vs a
one-node full pyarrow sort, routing-prefix edge cases, row-number
exactness, skew, and the resumable sorted_write manifest."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vfs_index_ray.functions.sort import (_route_u64, order_by,
                                          sorted_write)


def _mk_table(n=20000, seed=11, with_nulls=True):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 14, size=n)
    strs = ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=int(L)))
            for L in lens]
    strs[0] = ""
    strs[1] = "zzzzzzzzzz\xe9中"  # >8 bytes, multi-byte tail
    strs[2] = strs[3] = "sameprefix-abcdefgh-different-tails-a"
    t = pa.table({
        "s": pa.array(strs),
        "f": pa.array(rng.normal(size=n), pa.float64()),
        "i": pa.array(rng.integers(-500, 500, size=n), pa.int64()),
    })
    if with_nulls:
        mask = pa.array(rng.random(n) < 0.02)
        t = t.set_column(1, "f", pc.if_else(
            mask, pa.scalar(None, pa.float64()), t["f"].combine_chunks()))
        smask = pa.array(rng.random(n) < 0.02)
        t = t.set_column(0, "s", pc.if_else(
            smask, pa.scalar(None, pa.string()), t["s"].combine_chunks()))
    return t


def _expected(t, keys):
    idx = pc.sort_indices(
        t, sort_keys=[(c, "descending" if d == "desc" else "ascending")
                      for c, d in keys],
        null_placement="at_end")
    return t.take(idx)


def _got(out):
    import ray
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    return tbl.sort_by("rn")


def _assert_key_cols_equal(got, exp, keys):
    for c, _ in keys:
        g, e = got[c].combine_chunks(), exp[c].combine_chunks()
        gn, en = np.asarray(g.is_null()), np.asarray(e.is_null())
        assert (gn == en).all(), f"null placement differs on {c}"
        ga = g.to_numpy(zero_copy_only=False)
        ea = e.to_numpy(zero_copy_only=False)
        if ga.dtype.kind == "f":
            ok = (ga == ea) | (np.isnan(ga) & np.isnan(ea)) | gn
            assert ok.all(), f"key order differs on {c}"
        else:
            assert all((a == b) or n for a, b, n in zip(ga, ea, gn)), \
                f"key order differs on {c}"


@pytest.mark.parametrize("keys", [
    [("i", "asc"), ("s", "asc"), ("f", "asc")],
    [("f", "desc"), ("i", "asc")],
    [("s", "asc"), ("i", "desc")],
    [("s", "desc"), ("f", "asc"), ("i", "asc")],
])
def test_order_by_matches_single_node_sort(ray_session, keys):
    import ray.data
    t = _mk_table()
    ds = ray.data.from_arrow(t).repartition(8)
    out = order_by(ds, keys, row_number_col="rn", num_parts=5)
    got = _got(out)
    assert got["rn"].to_pylist() == list(range(1, t.num_rows + 1))
    _assert_key_cols_equal(got, _expected(t, keys), keys)


def test_order_by_skewed_key(ray_session):
    """90%-one-value primary key: every tie co-partitions (searchsorted
    routing) and the secondary key orders them globally."""
    import ray.data
    rng = np.random.default_rng(3)
    n = 10000
    i = np.where(rng.random(n) < 0.9, 7, rng.integers(-50, 50, size=n))
    t = pa.table({"i": pa.array(i, pa.int64()),
                  "j": pa.array(rng.permutation(n), pa.int64())})
    keys = [("i", "asc"), ("j", "desc")]
    out = order_by(ray.data.from_arrow(t).repartition(6), keys,
                   row_number_col="rn", num_parts=4)
    got = _got(out)
    exp = _expected(t, keys)
    assert got["i"].to_pylist() == exp["i"].to_pylist()
    assert got["j"].to_pylist() == exp["j"].to_pylist()


def test_order_by_low_cardinality_leading_key_spreads(ray_session):
    """5-distinct-value leading key: composite routing must spread the
    data over more partitions than distinct leading values (the 100-TB
    skew case), while staying exactly ordered."""
    import ray.data
    rng = np.random.default_rng(9)
    n = 30000
    langs = np.array(["de", "en", "fr", "ja", "pt"])
    t = pa.table({
        "lang": pa.array(langs[rng.integers(0, 5, size=n)]),
        "score": pa.array(rng.permutation(n), pa.int64())})
    keys = [("lang", "asc"), ("score", "desc")]
    out = order_by(ray.data.from_arrow(t).repartition(8), keys,
                   row_number_col="rn", num_parts=12)
    import ray
    refs = out.to_arrow_refs()
    nonempty = sum(1 for b in ray.get(refs) if b.num_rows)
    assert nonempty > 5, f"routing collapsed to {nonempty} partitions"
    got = pa.concat_tables(ray.get(refs)).sort_by("rn")
    exp = _expected(t, keys)
    assert got["lang"].to_pylist() == exp["lang"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()


def test_order_by_string_routing_prefix_edges(ray_session):
    """Strings sharing an 8-byte prefix but differing later MUST order
    correctly (they co-partition and the local sort uses full keys)."""
    import ray.data
    strs = ["prefix00" + tail for tail in
            ["zzz", "", "aaa", "mmm", "aab", "zza"]] + ["prefix0", "pre", ""]
    t = pa.table({"s": pa.array(strs),
                  "k": pa.array(range(len(strs)), pa.int64())})
    keys = [("s", "asc"), ("k", "asc")]
    out = order_by(ray.data.from_arrow(t).repartition(3), keys,
                   row_number_col="rn", num_parts=3)
    got = _got(out)
    assert got["s"].to_pylist() == sorted(strs)


def test_route_u64_monotone_int_float(ray_session):
    ints = pa.array([-2**62, -5, -1, 0, 1, 7, 2**62], pa.int64())
    u = _route_u64(ints)
    assert (u[1:] > u[:-1]).all()
    fl = pa.array([-np.inf, -3.5, -0.0, 0.0, 1e-300, 2.5, np.inf],
                  pa.float64())
    uf = _route_u64(fl)
    assert (uf[1:] >= uf[:-1]).all()
    # descending flips the order; nulls stay last either way
    ud = _route_u64(ints, descending=True)
    assert (ud[1:] < ud[:-1]).all()
    withnull = pa.array([3, None, -4], pa.int64())
    un = _route_u64(withnull, descending=True)
    assert un[1] == np.uint64(0xFFFFFFFFFFFFFFFF)


def test_sorted_write_manifest_and_resume(ray_session, tmp_path):
    import ray.data
    t = _mk_table(n=3000, seed=5, with_nulls=False)
    ds = ray.data.from_arrow(t).repartition(4)
    out_dir = str(tmp_path / "sorted")
    man = sorted_write(ds, [("i", "asc"), ("s", "asc")], out_dir,
                       row_number_col="rn", num_parts=3)
    assert sum(e["rows"] for e in man.values()) == t.num_rows
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert files == sorted(man.keys())
    # concatenating files in name order IS the global order
    import pyarrow.parquet as pq
    full = pa.concat_tables([pq.read_table(os.path.join(out_dir, f))
                             for f in files])
    exp = _expected(t, [("i", "asc"), ("s", "asc")])
    assert full.sort_by("rn")["i"].to_pylist() == exp["i"].to_pylist()
    # manifest min/max are range-disjoint in file order (primary key)
    mins = [man[f]["min"] for f in files]
    maxs = [man[f]["max"] for f in files]
    assert all(int(maxs[k]) <= int(mins[k + 1]) for k in
               range(len(files) - 1))
    # resume: drop one part from the manifest, rerun — only it rewrites
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        before = json.load(f)
    victim = files[0]
    del before[victim]
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(before, f)
    mtimes = {f: os.path.getmtime(os.path.join(out_dir, f)) for f in files}
    man2 = sorted_write(ds, [("i", "asc"), ("s", "asc")], out_dir,
                        row_number_col="rn", num_parts=3)
    assert set(man2) == set(man)
    kept = [f for f in files if f != victim]
    assert all(os.path.getmtime(os.path.join(out_dir, f)) == mtimes[f]
               for f in kept), "finished parts must not rewrite"


def test_read_sorted_range_prunes_files(ray_session, tmp_path):
    import ray.data
    from vfs_index_ray.functions.sort import read_sorted_range
    rng = np.random.default_rng(21)
    n = 8000
    t = pa.table({"k": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(rng.integers(0, 100, n), pa.int64())})
    out_dir = str(tmp_path / "srt")
    sorted_write(ray.data.from_arrow(t).repartition(4),
                 [("k", "asc")], out_dir, num_parts=8)
    got = read_sorted_range(out_dir, 1000, 1499, key="k")
    import ray
    tbl = pa.concat_tables(ray.get(got.to_arrow_refs()))
    assert sorted(tbl["k"].to_pylist()) == list(range(1000, 1500))
    # pruning: only files whose [min,max] overlaps the range are read
    import json
    with open(out_dir + "/_manifest.json") as f:
        man = json.load(f)
    overlapping = sum(1 for e in man.values()
                      if not (int(e["max"]) < 1000 or int(e["min"]) > 1499))
    assert overlapping < len(man), "range should not touch every file"
    # empty range is schema-preserving
    empty = read_sorted_range(out_dir, -99, -50, key="k")
    assert empty.count() == 0
    assert set(empty.schema().names) == {"k", "v"}


def test_order_by_empty_and_single_part(ray_session):
    import ray.data
    t = pa.table({"i": pa.array([], pa.int64())})
    out = order_by(ray.data.from_arrow(t), [("i", "asc")],
                   row_number_col="rn")
    assert out.count() == 0
    t2 = pa.table({"i": pa.array([3, 1, 2], pa.int64())})
    out2 = order_by(ray.data.from_arrow(t2), [("i", "desc")],
                    row_number_col="rn", num_parts=1)
    assert _got(out2)["i"].to_pylist() == [3, 2, 1]
