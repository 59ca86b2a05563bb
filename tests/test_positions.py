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
    # chunked distributed path returns identical docs
    dist = SearchEngine(pos_index)
    dist.phrase_stage_threshold = 4
    dist.phrase_distributed = True
    for q, w in [("bababa babade", 3), ("bababa babade", 20)]:
        assert dist.proximity_match(q, w).tolist() == \
            eng.proximity_match(q, w).tolist(), (q, w)


def test_trigram_positional_exact_substring(ray_session, tmp_path):
    """Trigram-positional chaining makes CJK substring search EXACT: doc
    B has both query trigrams scattered (the reference's unverified AND
    would return it); the positional chain rejects it."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    rows = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["前置活動内容後置",      # contains 活動内容
                          "活動内と動内容は別々"],  # scattered trigrams
                         pa.string()),
    })
    src = str(tmp_path / "cjk.parquet")
    pq.write_table(rows, src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="trigram", num_parts=2, id_col="doc_id",
                 positions=True).build([src])
    eng = SearchEngine(idx)
    q = "活動内容"
    # unverified AND (reference semantics): both docs
    assert eng.match(q).tolist() == [1, 2]
    # positional chain: only the true substring match
    assert eng.phrase_match_positional(q).tolist() == [1]
    # short query still yields nothing (reference conformance)
    assert eng.phrase_match_positional("鬼滅").tolist() == []


def test_trigram_positional_fuzz(ray_session, tmp_path):
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    ref = corpus.generate_ref_records()
    src = str(tmp_path / "ref.parquet")
    pq.write_table(ref, src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="trigram", num_parts=4, text_col="content",
                 id_col="id", positions=True).build([src])
    eng = SearchEngine(idx)
    contents = ref["content"].to_pylist()
    ids = ref["id"].to_pylist()
    rng = np.random.Generator(np.random.Philox(key=[41, 0]))
    for _ in range(20):
        doc = contents[int(rng.integers(0, len(contents)))]
        i = int(rng.integers(0, len(doc) - 6))
        q = doc[i:i + int(rng.integers(3, 7))]
        got = eng.phrase_match_positional(q).tolist()
        want = sorted(i_ for i_, c in zip(ids, contents) if q in c)
        assert got == want, q


def test_absorb_rewrites_positions(ray_session, tmp_path, pages_file):
    """Incremental absorb regenerates positional files — positional
    queries on an absorbed index equal the full build's."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    pages = pq.read_table(pages_file)
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pages.slice(0, 250), a)
    pq.write_table(pages.slice(250, 250), b)
    full = str(tmp_path / "full")
    IndexBuilder(full, mode="word", num_parts=4, id_col=None,
                 positions=True).build([a, b], waves=2)
    inc = str(tmp_path / "inc")
    bi = IndexBuilder(inc, mode="word", num_parts=4, id_col=None,
                      positions=True)
    bi.build([a])
    bi.absorb([b])
    ef, ei = SearchEngine(full), SearchEngine(inc)
    got_f = ef.phrase_match_positional(corpus.PHRASE)
    got_i = ei.phrase_match_positional(corpus.PHRASE)
    assert got_f.tolist() == got_i.tolist()
    assert len(got_f) == 3


def test_staged_phrase_identical_to_batched(pos_index, pages_file):
    """Rare-pivot staged chaining (the pure-head-phrase path) returns
    exactly the batched path's docs on every fuzzed phrase, including
    repeated-token phrases."""
    from vfs_index_ray.hashing import doc_id_from_url
    from vfs_index_ray.search import SearchEngine

    batched = SearchEngine(pos_index, corpus_files=[pages_file])
    staged = SearchEngine(pos_index, corpus_files=[pages_file])
    staged.phrase_stage_threshold = 0      # force the staged path
    staged.phrase_distributed = False
    tbl = pq.read_table(pages_file, columns=["url", "text"])
    texts = tbl["text"].to_pylist()
    ids = [doc_id_from_url(u) for u in tbl["url"].to_pylist()]
    rng = np.random.Generator(np.random.Philox(key=[77, 0]))
    checked = 0
    for _ in range(25):
        doc = texts[int(rng.integers(0, len(texts)))]
        toks = _tokens(doc)
        if len(toks) < 4:
            continue
        j = int(rng.integers(0, len(toks) - 3))
        ln = int(rng.integers(2, 5))
        phrase = " ".join(toks[j:j + ln])
        got = staged.phrase_match_positional(phrase).tolist()
        assert got == batched.phrase_match_positional(phrase).tolist(), \
            phrase
        assert got == _py_phrase_docs(texts, ids, phrase), phrase
        checked += 1
    assert checked > 10
    # repeated-token phrase exercises multi-occurrence base constraints
    got = staged.phrase_match_positional("ba ba").tolist()
    assert got == batched.phrase_match_positional("ba ba").tolist()


def test_distributed_phrase_identical_to_batched(ray_session, pos_index,
                                                 pages_file):
    """Chunked Ray fan-out phrase path (pure-head regime) returns
    exactly the batched and staged paths' docs on fuzzed phrases."""
    from vfs_index_ray.search import SearchEngine

    batched = SearchEngine(pos_index, corpus_files=[pages_file])
    dist = SearchEngine(pos_index, corpus_files=[pages_file])
    dist.phrase_stage_threshold = 4        # tiny chunks → real fan-out
    dist.phrase_distributed = True
    tbl = pq.read_table(pages_file, columns=["text"])
    texts = tbl["text"].to_pylist()
    rng = np.random.Generator(np.random.Philox(key=[78, 0]))
    checked = 0
    for _ in range(12):
        doc = texts[int(rng.integers(0, len(texts)))]
        toks = _tokens(doc)
        if len(toks) < 4:
            continue
        j = int(rng.integers(0, len(toks) - 3))
        phrase = " ".join(toks[j:j + int(rng.integers(2, 5))])
        assert dist.phrase_match_positional(phrase).tolist() == \
            batched.phrase_match_positional(phrase).tolist(), phrase
        checked += 1
    assert checked > 5
    # repeated-token phrase through the distributed path
    assert dist.phrase_match_positional("ba ba").tolist() == \
        batched.phrase_match_positional("ba ba").tolist()


def test_staged_phrase_ordinal_underflow(ray_session, tmp_path):
    """Regression: the staged path's base keys wrap uint64 when the
    rarest term occurs at an ordinal SMALLER than its phrase index in
    the first candidate (doc0 = 'beta alpha' for phrase 'alpha beta'
    puts beta at ordinal 0 with idx 1) — used to IndexError on the
    live-set update; such occurrences are now masked out."""
    import pyarrow as pa

    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    texts = ["beta alpha", "alpha beta"] + \
        [f"alpha filler{i} words here" for i in range(6)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }), src)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, mode="word", num_parts=2, id_col="doc_id",
                 positions=True).build([src])
    eng = SearchEngine(idx, corpus_files=[src], id_col="doc_id")
    eng.phrase_stage_threshold = 0         # force the staged path
    eng.phrase_distributed = False
    assert eng.phrase_match_positional("alpha beta").tolist() == [1]
    assert eng.phrase_match_positional("beta alpha").tolist() == [0]
