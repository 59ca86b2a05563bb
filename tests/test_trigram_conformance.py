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


def _all_trigram_keys(texts, ids):
    """Python oracle: {packed trigram key: set(ids)} over the fixture."""
    from vfs_index_ray.tokenizer import pack_trigram
    out = {}
    for i, s in zip(ids, texts):
        for k in pack_trigram(s):
            out.setdefault(k, set()).add(i)
    return out


def test_key_range_scan_exact_count(tri_indexes, ref_file):
    """J6 string semantics (index_file.go:1208-1422; 24-row assertion
    shape of vfsindex_internal_test.go:550-581): key-space range scan
    returns exactly the docs the trigram-key oracle predicts."""
    from vfs_index_ray.search import SearchEngine
    from vfs_index_ray.tokenizer import pack_trigram

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx)
    tbl = pq.read_table(ref_file)
    keymap = _all_trigram_keys(tbl["content"].to_pylist(),
                               tbl["id"].to_pylist())
    lo = pack_trigram("活動内")[0]
    hi = lo + (1 << 32)  # one first-rune step up the key space
    expect = sorted(set().union(*(v for k, v in keymap.items()
                                  if lo <= k <= hi)) or set())
    got = eng.term_range_docs(lo, hi)
    assert got.tolist() == expect
    assert len(got) > 0
    # open bounds degrade to all docs with any key
    all_docs = sorted(set().union(*keymap.values()))
    assert eng.term_range_docs(None, None).tolist() == all_docs


def test_nearest_key_climbs_key_space(tri_indexes, ref_file):
    """J7 on the key space (FindNearByKey index_file.go:1461-1534):
    exact hit returns itself; a probe between keys climbs to the
    closest indexed key below/above."""
    from vfs_index_ray.search import SearchEngine
    from vfs_index_ray.tokenizer import pack_trigram

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx)
    tbl = pq.read_table(ref_file)
    keymap = _all_trigram_keys(tbl["content"].to_pylist(),
                               tbl["id"].to_pylist())
    keys = sorted(keymap)
    # exact hit
    k = pack_trigram("活動内")[0]
    term, df = eng.nearest_term(k, less=True)
    assert term == k and df == len(keymap[k]) == 4
    # probe strictly between two indexed keys → climbs down / up
    import bisect
    probe = keys[len(keys) // 2] + 1
    while probe in keymap:
        probe += 1
    below = keys[bisect.bisect_right(keys, probe) - 1]
    above = keys[bisect.bisect_left(keys, probe)]
    t_lo, df_lo = eng.nearest_term(probe, less=True)
    t_hi, df_hi = eng.nearest_term(probe, less=False)
    assert t_lo == below and df_lo == len(keymap[below])
    assert t_hi == above and df_hi == len(keymap[above])
    # below the smallest key there is nothing
    assert eng.nearest_term(keys[0] - 1, less=True) is None


def test_planner_string_range(tri_indexes, ref_file):
    """Planner routes string range ops on the indexed text column to the
    key-space scan; strict > excludes the bound key (documented
    divergence from the reference's >-as->= mapping)."""
    from vfs_index_ray.planner import QueryExecutor
    from vfs_index_ray.search import SearchEngine
    from vfs_index_ray.tokenizer import pack_trigram

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx, corpus_files=[ref_file], id_col="id")
    ex = QueryExecutor(eng, [ref_file], text_col="content", id_col="id")
    tbl = pq.read_table(ref_file)
    keymap = _all_trigram_keys(tbl["content"].to_pylist(),
                               tbl["id"].to_pylist())
    k = pack_trigram("活動内")[0]
    le = sorted(set().union(*(v for kk, v in keymap.items() if kk <= k)))
    lt = sorted(set().union(*(v for kk, v in keymap.items() if kk < k)))
    assert ex.execute('content <= "活動内"').tolist() == le
    assert ex.execute('content < "活動内"').tolist() == lt
    # 2-rune bound → no extractable key → empty
    assert len(ex.execute('content < "活動"')) == 0


def test_planner_string_range_wrap_guard(tri_indexes, ref_file):
    """'< key 0' must return empty, not wrap uint64 into a full scan;
    symmetric guard for '>' at the top of the key space."""
    from vfs_index_ray.planner import Predicate, QueryExecutor
    from vfs_index_ray.search import SearchEngine

    _, content_idx = tri_indexes
    eng = SearchEngine(content_idx, corpus_files=[ref_file], id_col="id")
    ex = QueryExecutor(eng, [ref_file], text_col="content", id_col="id")
    # "\0\0\0" packs to trigram key 0: strict < has no keys below it
    assert len(ex._string_range_docs(
        Predicate("content", "<", "\x00\x00\x00"))) == 0
