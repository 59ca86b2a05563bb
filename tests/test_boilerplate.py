"""Corpus-level boilerplate removal + per-doc repetition stats."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import pytest


def _mk_ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def _py_boiler(texts, min_docs, sep):
    c = Counter()
    for t in texts:
        for u in set(t.split(sep)):
            c[u] += 1
    freq = {u for u, k in c.items() if k >= min_docs}
    out = []
    for t in texts:
        units = t.split(sep)
        kept = [u for u in units if u not in freq]
        out.append((sep.join(kept), len(units) - len(kept)))
    return out


def test_remove_boilerplate_lines_matches_bruteforce(ray_session):
    from vfs_index_ray.functions.boilerplate import remove_boilerplate
    texts = [
        "nav home\ncontent one unique\nfooter c",
        "nav home\nanother body text\nfooter c",
        "nav home\nthird doc words\nfooter c",
        "totally unique\nno boiler here",
        "nav home",          # every line boilerplate -> empty text
        "",                   # empty doc: the '' line is corpus-rare
    ]
    rows = sorted(remove_boilerplate(_mk_ds(texts), min_docs=3,
                                     unit="line").take_all(),
                  key=lambda r: r["doc_id"])
    exp = _py_boiler(texts, 3, "\n")
    for r, (text, n_rem) in zip(rows, exp):
        assert r["text"] == text
        assert r["n_removed"] == n_rem
    assert rows[4]["text"] == ""


def test_remove_boilerplate_min_frac_ceil_semantics(ray_session):
    """min_frac=0.5 over 5 docs -> threshold ceil(2.5)=3 distinct docs."""
    from vfs_index_ray.functions.boilerplate import remove_boilerplate
    texts = ["a b", "a c", "a d", "b e", "f g"]  # df: a=3, b=2
    rows = sorted(remove_boilerplate(_mk_ds(texts), min_frac=0.5,
                                     unit="token").take_all(),
                  key=lambda r: r["doc_id"])
    # 'a' (df 3 >= 3) pruned; 'b' (df 2 < 3) kept
    assert [r["text"] for r in rows] == ["b", "c", "d", "b e", "f g"]
    assert [r["n_removed"] for r in rows] == [1, 1, 1, 0, 0]


def test_remove_boilerplate_requires_one_threshold(ray_session):
    from vfs_index_ray.functions.boilerplate import remove_boilerplate
    ds = _mk_ds(["x"])
    with pytest.raises(ValueError):
        remove_boilerplate(ds, unit="token")
    with pytest.raises(ValueError):
        remove_boilerplate(ds, min_docs=2, min_frac=0.5, unit="token")


def test_remove_boilerplate_no_frequent_units_is_identity(ray_session):
    from vfs_index_ray.functions.boilerplate import remove_boilerplate
    texts = ["p q", "r s", "t u"]
    rows = sorted(remove_boilerplate(_mk_ds(texts), min_docs=2,
                                     unit="token").take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["text"] for r in rows] == texts
    assert all(r["n_removed"] == 0 for r in rows)


def test_frequent_units_exact_string_semantics(ray_session):
    """Counts key on the string itself; within-doc repeats count once."""
    from vfs_index_ray.functions.boilerplate import frequent_units
    texts = ["x x x x", "x y", "z z z"]  # df: x=2, y=1, z=1
    freq = frequent_units(_mk_ds(texts), min_docs=2, unit="token")
    assert freq.to_pylist() == ["x"]


def test_repetition_stats_matches_bruteforce(ray_session):
    from vfs_index_ray.functions.textstats import RepetitionStats
    texts = ["a b a b a", "x y z", "", "w", "p p p p", "a a b b a a"]
    rows = sorted(_mk_ds(texts).map_batches(
        RepetitionStats(), batch_format="pyarrow").take_all(),
        key=lambda r: r["doc_id"])
    for r, t in zip(rows, texts):
        ws = t.split(" ")
        bgs = [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
        nb, nd = len(bgs), len(set(bgs))
        mc = max(Counter(bgs).values()) if bgs else 0
        assert r["n_bigrams"] == nb
        assert r["dup_bigram_frac_x1e4"] == (
            math.floor((nb - nd) / nb * 10000 + 0.5) if nb else 0)
        assert r["top_bigram_frac_x1e4"] == (
            math.floor(mc / nb * 10000 + 0.5) if nb else 0)
