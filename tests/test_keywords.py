"""Vocabulary df table + rare-term keyword extraction."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest


def _mk_ds(texts):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def _py_keywords(texts, k):
    df = Counter()
    for t in texts:
        for u in set(t.split(" ")):
            df[u] += 1
    out = []
    for i, t in enumerate(texts):
        tf = Counter(t.split(" "))
        ranked = sorted(tf, key=lambda u: (df[u], -tf[u], u.encode()))
        for r, u in enumerate(ranked[:k], 1):
            out.append((i, r, u, tf[u], df[u]))
    return out


def test_unit_doc_frequencies_counts_distinct_docs(ray_session):
    from vfs_index_ray.functions.boilerplate import unit_doc_frequencies
    texts = ["x x y", "x z", "z z"]
    t = unit_doc_frequencies(_mk_ds(texts), unit="token")
    got = dict(zip(t["unit"].to_pylist(), t["df"].to_pylist()))
    assert got == {"x": 2, "y": 1, "z": 2}


def test_unit_doc_frequencies_min_docs_filter(ray_session):
    from vfs_index_ray.functions.boilerplate import unit_doc_frequencies
    texts = ["x x y", "x z", "z z"]
    t = unit_doc_frequencies(_mk_ds(texts), unit="token", min_docs=2)
    got = dict(zip(t["unit"].to_pylist(), t["df"].to_pylist()))
    assert got == {"x": 2, "z": 2}


def test_doc_keywords_matches_bruteforce(ray_session):
    from vfs_index_ray.functions.keywords import doc_keywords
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat and the dog",
        "quantum flux capacitor the",
        "sat sat sat rare",
    ]
    rows = sorted(doc_keywords(_mk_ds(texts), k=3).take_all(),
                  key=lambda r: (r["doc_id"], r["rank"]))
    got = [(r["doc_id"], r["rank"], r["token"], r["tf"], r["df"])
           for r in rows]
    assert got == _py_keywords(texts, 3)


def test_doc_keywords_fewer_tokens_than_k(ray_session):
    from vfs_index_ray.functions.keywords import doc_keywords
    rows = doc_keywords(_mk_ds(["solo"]), k=5).take_all()
    assert len(rows) == 1
    assert rows[0]["token"] == "solo"
    assert rows[0]["rank"] == 1 and rows[0]["tf"] == 1 and rows[0]["df"] == 1


def test_doc_keywords_user_vocab_missing_tokens_rank_last(ray_session):
    """Tokens absent from a user-supplied df table rank after known."""
    from vfs_index_ray.functions.keywords import doc_keywords
    vocab = pa.table({"unit": pa.array(["known"]),
                      "df": pa.array([1], pa.int64())})
    rows = sorted(doc_keywords(_mk_ds(["zzz known aaa"]), k=3,
                               df_table=vocab).take_all(),
                  key=lambda r: r["rank"])
    assert rows[0]["token"] == "known"
    # unknowns after, among themselves by token bytes asc
    assert [r["token"] for r in rows[1:]] == ["aaa", "zzz"]
    assert all(r["df"] == 2 ** 62 for r in rows[1:])


def test_doc_keywords_tf_tiebreak_before_token(ray_session):
    """Equal df -> higher tf wins; equal (df, tf) -> byte order."""
    from vfs_index_ray.functions.keywords import doc_keywords
    # one doc: every token df=1; 'b' tf=2 beats 'a' tf=1
    rows = sorted(doc_keywords(_mk_ds(["b a b c"]), k=3).take_all(),
                  key=lambda r: r["rank"])
    assert [r["token"] for r in rows] == ["b", "a", "c"]


@pytest.mark.parametrize("k", [1, 2])
def test_doc_keywords_k_bounds_rows_per_doc(ray_session, k):
    from vfs_index_ray.functions.keywords import doc_keywords
    rows = doc_keywords(_mk_ds(["a b c", "d e"]), k=k).take_all()
    per = Counter(r["doc_id"] for r in rows)
    assert per[0] == k and per[1] == min(k, 2)
