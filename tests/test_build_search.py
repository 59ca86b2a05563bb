"""Differential tests: Ray engine vs single-process oracle (SURVEY §5).

The FIXTURES.md query set: term equality, AND intersection, short-query
empty, df counts, limit, top-k BM25 rank-identical (doc ids AND fp64
scores), distributed-path equality, determinism across parallelism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from vfs_index_ray import corpus


@pytest.fixture(scope="module")
def engine(built_index, pages_file):
    from vfs_index_ray.search import SearchEngine

    idx, _ = built_index
    return SearchEngine(idx, corpus_files=[pages_file], id_col="doc_id")


QUERIES = [
    corpus.RARE_TERM,                       # planted rare term, df=4
    corpus.PHRASE,                          # planted phrase
    "bababa",                               # Zipf head term
    "bababa babade",                        # head + mid AND
    corpus.RARE_TERM + " bababa",           # rare + head
    "nosuchtoken42",                        # absent term
]


def test_stats_match_oracle(built_index, oracle_index):
    _, stats = built_index
    assert stats["n_docs"] == oracle_index.ndocs
    assert stats["avgdl"] == pytest.approx(oracle_index.avgdl, rel=1e-12)


@pytest.mark.parametrize("q", QUERIES)
def test_match_identical(engine, oracle_index, q):
    assert engine.match(q).tolist() == oracle_index.match(q)


def test_rare_term_df(engine):
    # planted df == 4 (analog of the reference's 活動内 df test)
    assert engine.df(corpus.RARE_TERM) == {corpus.RARE_TERM: 4}


def test_count(engine, oracle_index):
    assert engine.count(corpus.PHRASE) == oracle_index.count(corpus.PHRASE) == 3


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [3, 10, 50])
def test_bm25_rank_identical(engine, oracle_index, q, k):
    docs, scores = engine.bm25(q, k)
    expected = oracle_index.bm25(q, k)
    assert [int(d) for d in docs] == [d for d, _ in expected]
    # fp64 scores identical (fixed accumulation order), not approx
    assert [float(s) for s in scores] == [s for _, s in expected]


@pytest.mark.parametrize("q", QUERIES)
def test_bm25_maxscore_identical_to_exact(engine, q):
    de, se = engine.bm25(q, 10, method="exact")
    dm, sm = engine.bm25(q, 10, method="maxscore")
    assert de.tolist() == dm.tolist()
    assert se.tolist() == sm.tolist()


def test_bm25_distributed_identical(built_index, engine):
    from vfs_index_ray.search import bm25_topk_ray

    idx, _ = built_index
    d_r, s_r = bm25_topk_ray(idx, corpus.PHRASE, 10)
    d_e, s_e = engine.bm25(corpus.PHRASE, 10)
    assert d_r.tolist() == d_e.tolist()
    assert s_r.tolist() == s_e.tolist()


def test_fetch_rows_semijoin(engine, pages_file):
    docs = engine.match(corpus.RARE_TERM)
    rows = engine.fetch_rows(docs, columns=["url", "text"])
    assert rows.num_rows == 4
    assert all(corpus.RARE_TERM in t for t in rows["text"].to_pylist())


def test_text_byte_identical_per_url(pages_file):
    # per-row invariant (input_hint): text carried through untouched
    tbl = pq.read_table(pages_file, columns=["url", "text"])
    regen = corpus.generate_pages(tbl.num_rows)
    assert tbl["text"].to_pylist() == regen["text"].to_pylist()


def test_build_deterministic_across_parallelism(ray_session, pages_file,
                                                tmp_path, built_index):
    """Two builds at different parallelism → identical segment contents
    (FIXTURES.md item 10)."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    idx1, _ = built_index
    idx2 = str(tmp_path / "idx2")
    IndexBuilder(idx2, mode="word", num_parts=8, id_col=None,
                 tokenize_concurrency=1, tokenize_batch_size=64
                 ).build([pages_file])
    e1, e2 = SearchEngine(idx1), SearchEngine(idx2)
    for q in QUERIES:
        d1, s1 = e1.bm25(q, 20)
        d2, s2 = e2.bm25(q, 20)
        assert d1.tolist() == d2.tolist()
        assert s1.tolist() == s2.tolist()
    # segment files logically identical; bloom filters byte-identical
    import os
    import pyarrow.parquet as pq2
    for name in sorted(os.listdir(os.path.join(idx1, "segments"))):
        if name.endswith(".parquet"):
            t1 = pq2.read_table(os.path.join(idx1, "segments", name))
            t2 = pq2.read_table(os.path.join(idx2, "segments", name))
            assert t1.equals(t2), name
        elif name.endswith(".bloom"):
            b1 = open(os.path.join(idx1, "segments", name), "rb").read()
            b2 = open(os.path.join(idx2, "segments", name), "rb").read()
            assert b1 == b2, name


def test_bucketed_index_same_results(ray_session, pages_file, tmp_path,
                                     engine, oracle_index):
    """bucket_shift < 64 (doc-range chunked / salted head terms) must not
    change any result (SURVEY §7.6 posting order under salting)."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    idx = str(tmp_path / "idx_bucketed")
    IndexBuilder(idx, mode="word", num_parts=4, bucket_shift=61,
                 id_col=None, tokenize_concurrency=1).build([pages_file])
    eb = SearchEngine(idx)
    # chunking actually happened: more chunks than terms
    import json
    import os
    segdir = os.path.join(idx, "segments")
    nchunks = nterms = 0
    for f in os.listdir(segdir):
        if f.endswith(".json"):
            with open(os.path.join(segdir, f)) as fh:
                row = json.load(fh)
            nchunks += row["n_chunks"]
            nterms += row["n_terms"]
    assert nchunks > nterms
    for q in QUERIES:
        d1, s1 = eb.bm25(q, 10)
        expected = oracle_index.bm25(q, 10)
        assert [int(x) for x in d1] == [d for d, _ in expected]
        assert [float(x) for x in s1] == [s for _, s in expected]
        assert eb.match(q).tolist() == oracle_index.match(q)


def test_phrase_match(engine, pages_file):
    """Index-AND candidates + substring verification (phrase search)."""
    import pyarrow.parquet as pqx

    docs = engine.phrase_match(corpus.PHRASE)
    assert len(docs) == 3  # the planted phrase rows
    texts = {t for t in engine.fetch_rows(docs, columns=["text"])
             ["text"].to_pylist()}
    assert all(corpus.PHRASE in t for t in texts)
    # tokens co-occur but not adjacent → verified out
    tbl = pqx.read_table(pages_file, columns=["text"])
    scattered = [t for t in tbl["text"].to_pylist()
                 if all(w in t.split() for w in corpus.PHRASE.split())
                 and corpus.PHRASE not in t]
    n_all_tokens = len(engine.match(corpus.PHRASE))
    assert n_all_tokens == len(docs) + len(scattered)
    assert engine.phrase_match("nosuchtokenzz phrase").tolist() == []


def test_query_actor_batch(ray_session, built_index, oracle_index):
    """Actor-pool batch scorer returns per-query ranked results."""
    import ray.data

    from vfs_index_ray.search import QueryActor

    idx, _ = built_index
    qs = [corpus.RARE_TERM, corpus.PHRASE, "bababa"]
    out = ray.data.from_items([{"query": q} for q in qs]).map_batches(
        QueryActor, fn_constructor_kwargs=dict(index_dir=idx, k=5),
        batch_format="pyarrow", concurrency=1).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query"], []).append((r["rank"], r["doc_id"],
                                                r["score"]))
    for q in qs:
        got = sorted(by_q.get(q, []))
        expected = oracle_index.bm25(q, 5)
        assert [d for _, d, _ in got] == [d for d, _ in expected], q
        assert [s for _, _, s in got] == [s for _, s in expected], q


def test_distributed_on_bucketed_index(ray_session, pages_file, tmp_path,
                                       oracle_index):
    """bm25_topk_ray over a doc-range-chunked index: per-bucket scoring
    must still be exact (all of a doc's postings share its bucket)."""
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import bm25_topk_ray

    idx = str(tmp_path / "idx_dist_bucketed")
    IndexBuilder(idx, mode="word", num_parts=4, bucket_shift=61,
                 id_col=None).build([pages_file])
    for q in [corpus.PHRASE, "bababa babade"]:
        docs, scores = bm25_topk_ray(idx, q, 10)
        expected = oracle_index.bm25(q, 10)
        assert [int(x) for x in docs] == [d for d, _ in expected], q
        assert [float(x) for x in scores] == [s for _, s in expected], q


def test_bm25_auto_method_identical(engine, oracle_index):
    """method='auto' picks a pruned path for big multi-term queries and
    stays bit-identical to exact (the engine-wide invariant)."""
    for q in QUERIES:
        de, se = engine.bm25(q, 10, "exact")
        da, sa = engine.bm25(q, 10, "auto")
        assert de.tolist() == da.tolist()
        assert se.tolist() == sa.tolist()


def test_bm25_search_after_pages_tile_deep_topk(engine):
    """Cursor pagination invariant: walking pages of k=7 via
    search_after reproduces one deep top-k exactly (ranks, docs,
    fp64 scores), for head-heavy and rare+head query shapes."""
    for q in ["bababa babade", corpus.RARE_TERM + " bababa"]:
        deep_d, deep_s = engine.bm25(q, 50)
        got_d, got_s = [], []
        cursor = None
        while len(got_d) < len(deep_d):
            d, s = engine.bm25(q, 7, search_after=cursor)
            if len(d) == 0:
                break
            got_d.extend(d.tolist())
            got_s.extend(s.tolist())
            cursor = (float(s[-1]), int(d[-1]))
        n = len(deep_d)  # last 7-row page can overshoot the deep k
        assert got_d[:n] == deep_d.tolist(), q
        assert got_s[:n] == deep_s.tolist(), q


def test_bm25_search_after_empty_past_end(engine):
    d, s = engine.bm25("bababa", 10)
    d2, _ = engine.bm25("bababa", 10,
                        search_after=(float(s[-1]), int(d[-1])))
    # cursor strictly advances: nothing from page 1 reappears
    assert set(d2.tolist()).isdisjoint(set(d.tolist()))
