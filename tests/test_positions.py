"""Positional-postings tests: token-adjacency phrase matching with no
corpus access, verified against a plain-Python position oracle."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vfs_index_ray import corpus


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_phrase_docs(texts, ids, phrase):
    seq = _tokens(phrase)
    out = []
    for i, t in zip(ids, texts):
        toks = _tokens(t)
        for j in range(len(toks) - len(seq) + 1):
            if toks[j:j + len(seq)] == seq:
                out.append(i)
                break
    return sorted(out)


@pytest.fixture(scope="module")
def pos_index(ray_session, pages_file, tmp_path_factory):
    from vfs_index_ray.build import IndexBuilder

    idx = str(tmp_path_factory.mktemp("posidx") / "idx")
    IndexBuilder(idx, mode="word", num_parts=8, id_col=None,
                 positions=True).build([pages_file])
    return idx


def test_positional_phrase_matches_planted(pos_index, pages_file):
    from vfs_index_ray.hashing import doc_id_from_url
    from vfs_index_ray.search import SearchEngine

    eng = SearchEngine(pos_index, corpus_files=[pages_file])
    got = eng.phrase_match_positional(corpus.PHRASE)
    tbl = pq.read_table(pages_file, columns=["url", "text"])
    want = _py_phrase_docs(tbl["text"].to_pylist(),
                           [doc_id_from_url(u)
                            for u in tbl["url"].to_pylist()],
                           corpus.PHRASE)
    assert got.tolist() == want
    assert len(got) == 3  # the planted rows


def test_positional_phrase_fuzz(pos_index, pages_file):
    from vfs_index_ray.hashing import doc_id_from_url
    from vfs_index_ray.search import SearchEngine

    eng = SearchEngine(pos_index, corpus_files=[pages_file])
    tbl = pq.read_table(pages_file, columns=["url", "text"])
    texts = tbl["text"].to_pylist()
    ids = [doc_id_from_url(u) for u in tbl["url"].to_pylist()]
    rng = np.random.Generator(np.random.Philox(key=[31, 0]))
    for _ in range(25):
        # sample real phrases (guaranteed hits) + shuffled ones (mostly 0)
        doc = texts[int(rng.integers(0, len(texts)))]
        toks = _tokens(doc)
        if len(toks) < 4:
            continue
        j = int(rng.integers(0, len(toks) - 3))
        ln = int(rng.integers(2, 4))
        phrase = " ".join(toks[j:j + ln])
        got = eng.phrase_match_positional(phrase).tolist()
        assert got == _py_phrase_docs(texts, ids, phrase), phrase


def test_token_adjacency_vs_substring_semantics(ray_session, tmp_path):
    """'aurora, borealis' is token-adjacent (positions consecutive) but
    not a substring match — positional finds it, substring variant not."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    rows = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["aurora, borealis lights",
                          "aurora borealis lights",
                          "aurora shines borealis"], pa.string()),
    })
    src = str(tmp_path / "mini.parquet")
    pq.write_table(rows, src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="word", num_parts=2, id_col="doc_id",
                 positions=True).build([src])
    eng = SearchEngine(idx, corpus_files=[src], id_col="doc_id")
    assert eng.phrase_match_positional("aurora borealis").tolist() == [1, 2]
    assert eng.phrase_match("aurora borealis").tolist() == [2]
    # non-adjacent tokens match neither
    assert eng.phrase_match_positional("borealis aurora").tolist() == []


def test_repeated_token_phrase(ray_session, tmp_path):
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    rows = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["stream stream stream data",
                          "stream data stream"], pa.string()),
    })
    src = str(tmp_path / "rep.parquet")
    pq.write_table(rows, src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="word", num_parts=2, id_col="doc_id",
                 positions=True).build([src])
    eng = SearchEngine(idx)
    assert eng.phrase_match_positional("stream stream").tolist() == [1]
    assert eng.phrase_match_positional("stream stream stream").tolist() == [1]


def test_positions_require_flag(built_index):
    from vfs_index_ray.search import SearchEngine

    idx, _ = built_index  # built without positions
    eng = SearchEngine(idx)
    with pytest.raises(ValueError):
        eng.phrase_match_positional("bababa babade")


def test_proximity_vs_python(pos_index, pages_file):
    from vfs_index_ray.hashing import doc_id_from_url
    from vfs_index_ray.search import SearchEngine

    eng = SearchEngine(pos_index)
    tbl = pq.read_table(pages_file, columns=["url", "text"])
    texts = tbl["text"].to_pylist()
    ids = [doc_id_from_url(u) for u in tbl["url"].to_pylist()]

    def py_prox(qtoks, window):
        out = []
        for i, t in zip(ids, texts):
            toks = _tokens(t)
            poss = [[j for j, w in enumerate(toks) if w == qt]
                    for qt in qtoks]
            if any(not p for p in poss):
                continue
            import itertools
            best = min(max(c) - min(c)
                       for c in itertools.product(*poss))
            if best <= window:
                out.append(i)
        return sorted(out)

    for q, w in [("bababa babade", 3), ("bababa babade", 20),
                 (corpus.PHRASE, 3)]:
        got = eng.proximity_match(q, w).tolist()
        assert got == py_prox(sorted(set(q.split())), w), (q, w)
    # window 0 with two distinct terms → impossible
    assert eng.proximity_match("bababa babade", 0).tolist() == []
