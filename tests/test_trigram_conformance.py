"""Reference-conformance end-to-end tests in trigram mode over the
ref_records fixture (FIXTURES.md F2) — mirrors the reference's own
golden-fixture assertions (SURVEY §5)."""

import pyarrow.parquet as pq
import pytest

from vfs_index_ray import corpus
from vfs_index_ray.oracle import OracleIndex


@pytest.fixture(scope="module")
def ref_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("refdata")
    path = str(d / "ref.parquet")
    pq.write_table(corpus.generate_ref_records(), path)
    return path


@pytest.fixture(scope="module")
def tri_indexes(ray_session, ref_file, tmp_path_factory):
    """Trigram indexes on title and content (one column per index, like
    the reference's per-column Regist)."""
    from vfs_index_ray.build import IndexBuilder

    d = tmp_path_factory.mktemp("tri")
    title_idx = str(d / "title")
    content_idx = str(d / "content")
    IndexBuilder(title_idx, mode="trigram", num_parts=4, text_col="title",
                 id_col="id").build([ref_file])
    IndexBuilder(content_idx, mode="trigram", num_parts=4,
                 text_col="content", id_col="id").build([ref_file])
    return title_idx, content_idx


def test_title_trigram_eq(tri_indexes, ref_file):
    """title.search("拉致問") finds the planted article
    (vfsindex_internal_test.go:583-601)."""
    from vfs_index_ray.search import SearchEngine

    title_idx, _ = tri_indexes
    eng = SearchEngine(title_idx, corpus_files=[ref_file], id_col="id")
    docs = eng.match("拉致問")
    rows = eng.fetch_rows(docs, columns=["id", "title"])
    titles = rows["title"].to_pylist()
    assert corpus.CJK_TITLE in titles
    # and the queried id is the planted one
    assert 132763 in rows["id"].to_pylist()


def test_full_title_match(tri_indexes, ref_file):
    """AND of all trigrams of the full title → exactly that article
    (vfsindex_internal_test.go:522-548 analog)."""
    from vfs_index_ray.search import SearchEngine

    title_idx, _ = tri_indexes
    eng = SearchEngine(title_idx, corpus_files=[ref_file], id_col="id")
    docs = eng.match(corpus.CJK_TITLE)
    rows = eng.fetch_rows(docs, columns=["title"])
    assert rows["title"].to_pylist() == [corpus.CJK_TITLE]


def test_activity_trigram_df(tri_indexes):
    """df of the first trigram of '活動内' == 4
    (vfsindex_internal_test.go:720-739)."""
    from vfs_index_ray.search import SearchEngine

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx)
    dfs = eng.df(corpus.ACTIVITY_TRIGRAM)
    assert list(dfs.values())[0] == 4


def test_short_query_empty(tri_indexes):
    """2-rune query → zero keys → zero rows (vfsindex_test.go:149-159)."""
    from vfs_index_ray.search import SearchEngine

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx)
    assert len(eng.match("鬼滅")) == 0
    docs, scores = eng.bm25("鬼", 5)
    assert len(docs) == 0


def test_trigram_vs_oracle(tri_indexes, ref_file):
    """Differential: trigram engine == trigram oracle on titles."""
    from vfs_index_ray.search import SearchEngine

    title_idx, _ = tri_indexes
    tbl = pq.read_table(ref_file)
    oi = OracleIndex.build(tbl["title"].to_pylist(),
                           tbl["id"].to_pylist(), mode="trigram")
    eng = SearchEngine(title_idx)
    for q in ["拉致問", corpus.CJK_TITLE, "渡辺麻友", "警視庁"]:
        assert eng.match(q).tolist() == oi.match(q), q
        d_e, s_e = eng.bm25(q, 10)
        expected = oi.bm25(q, 10)
        assert [int(x) for x in d_e] == [d for d, _ in expected]
        assert [float(x) for x in s_e] == [s for _, s in expected]


def test_numeric_query_via_planner(ray_session, tri_indexes, ref_file):
    """id == 132763 → that row; id >= 0 limit 3 → 3 rows
    (vfsindex_test.go:161-175, vfsindex_internal_test.go:175-180)."""
    from vfs_index_ray.planner import QueryExecutor
    from vfs_index_ray.search import SearchEngine

    title_idx, _ = tri_indexes
    eng = SearchEngine(title_idx, corpus_files=[ref_file], id_col="id")
    ex = QueryExecutor(eng, [ref_file], text_col="title", id_col="id")
    assert ex.execute("id == 132763").tolist() == [132763]
    assert len(ex.execute("id > 0", limit=3)) == 3
    # combined text+numeric AND
    got = ex.execute('title.search("拉致問") && id == 132763')
    assert got.tolist() == [132763]
    assert ex.first("id > 0") == min(pq.read_table(ref_file)["id"].to_pylist())


def test_trigram_df_multiterm(tri_indexes):
    """df() keys are the rune 3-grams, one entry per distinct trigram."""
    from vfs_index_ray.search import SearchEngine

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx)
    dfs = eng.df("活動内容")  # two trigrams: 活動内, 動内容
    assert set(dfs.keys()) == {"活動内", "動内容"}
    assert dfs["活動内"] == 4


def test_trigram_fuzz_vs_oracle(tri_indexes, ref_file):
    """Random CJK substring queries: match + bm25 rank-identical."""
    import numpy as np

    from vfs_index_ray.search import SearchEngine

    _, content_idx = tri_indexes
    tbl = pq.read_table(ref_file)
    contents = tbl["content"].to_pylist()
    oi = OracleIndex.build(contents, tbl["id"].to_pylist(), mode="trigram")
    eng = SearchEngine(content_idx)
    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    for _ in range(40):
        doc = contents[int(rng.integers(0, len(contents)))]
        i = int(rng.integers(0, max(len(doc) - 6, 1)))
        q = doc[i:i + int(rng.integers(2, 7))]  # includes <3-rune cases
        assert eng.match(q).tolist() == oi.match(q), q
        d_e, s_e = eng.bm25(q, 10)
        expected = oi.bm25(q, 10)
        assert [int(x) for x in d_e] == [d for d, _ in expected], q
        assert [float(x) for x in s_e] == [s for _, s in expected], q
