"""Sinks (K3/K4/K5), format-dispatched ingestion (S1-S5), co-occurrence
distance (A6)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from vfs_index_ray import corpus
from vfs_index_ray.sinks import read_corpus, stream_results, write_results


def _sample_table():
    return pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "score": pa.array([1.5, 0.5, 0.25], pa.float64())})


def test_write_results_formats(tmp_path):
    t = _sample_table()
    p = write_results(t, str(tmp_path / "r.json"))
    assert json.load(open(p))[0] == {"doc_id": 1, "score": 1.5}
    p = write_results(t, str(tmp_path / "r.jsonl"))
    lines = open(p).read().splitlines()
    assert len(lines) == 3 and json.loads(lines[2])["doc_id"] == 3
    p = write_results(t, str(tmp_path / "r.csv"))
    assert pacsv.read_csv(p).num_rows == 3
    p = write_results(t, str(tmp_path / "r.parquet"))
    assert pq.read_table(p).equals(t)
    with pytest.raises(ValueError):
        write_results(t, str(tmp_path / "r.xyz"))


def test_stream_results_limit(ray_session):
    import ray.data
    ds = ray.data.range(1000)
    total = sum(b.num_rows for b in stream_results(ds, batch_size=128,
                                                   limit=300))
    assert total == 300
    total = sum(b.num_rows for b in stream_results(ds, batch_size=128))
    assert total == 1000


def test_read_corpus_json_csv(ray_session, tmp_path):
    rows = [{"doc_id": i, "text": f"alpha beta doc{i}"} for i in range(20)]
    jpath = str(tmp_path / "c.json")
    with open(jpath, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cpath = str(tmp_path / "c.csv")
    pacsv.write_csv(pa.Table.from_pylist(rows), cpath)
    for path in (jpath, cpath):
        ds = read_corpus([path], columns=["doc_id", "text"])
        got = sorted(r["doc_id"] for r in ds.take_all())
        assert got == list(range(20)), path
    with pytest.raises(ValueError):
        read_corpus([jpath, cpath])
    with pytest.raises(ValueError):
        read_corpus([str(tmp_path / "c.xml")])


def test_build_from_jsonl(ray_session, tmp_path):
    """Full index build from a JSONL corpus (S1/S2 parity)."""
    import json as _json

    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.oracle import OracleIndex
    from vfs_index_ray.search import SearchEngine

    pages = corpus.generate_pages(120)
    jpath = str(tmp_path / "pages.jsonl.json")
    with open(jpath, "w") as f:
        for url, text in zip(pages["url"].to_pylist(),
                             pages["text"].to_pylist()):
            f.write(_json.dumps({"url": url, "text": text}) + "\n")
    idx = str(tmp_path / "jidx")
    stats = IndexBuilder(idx, mode="word", num_parts=4, id_col=None
                         ).build([jpath])
    assert stats["n_docs"] == 120
    from vfs_index_ray.hashing import doc_id_from_url
    oi = OracleIndex.build(pages["text"].to_pylist(),
                           [doc_id_from_url(u) for u in
                            pages["url"].to_pylist()])
    eng = SearchEngine(idx)
    docs, scores = eng.bm25("bababa babade", 10)
    expected = oi.bm25("bababa babade", 10)
    assert [int(x) for x in docs] == [d for d, _ in expected]
    assert [float(x) for x in scores] == [s for _, s in expected]


def test_cooccur_distance(built_index, oracle_index):
    from vfs_index_ray.search import SearchEngine

    idx, _ = built_index
    eng = SearchEngine(idx)
    # brute-force expected from oracle postings
    def expected(ta, tb):
        a = set(oracle_index.match(ta))
        b = set(oracle_index.match(tb))
        if not a and not b:
            return 1.0
        return 1.0 - len(a & b) / max(len(a), len(b))

    for ta, tb in [("bababa", "babade"), (corpus.RARE_TERM, "bababa")]:
        assert eng.cooccur_distance(ta, tb) == pytest.approx(
            expected(ta, tb), abs=1e-12)
    # identical queries → distance 0; absent term → 1
    assert eng.cooccur_distance("bababa", "bababa") == 0.0
    assert eng.cooccur_distance("nosuchtokenzz", "bababa") == 1.0


def test_read_corpus_gzip(ray_session, tmp_path):
    """S6 parity: transparent .gz decompression on the read path."""
    import gzip

    rows = [{"doc_id": i, "text": f"alpha beta doc{i}"} for i in range(10)]
    p = str(tmp_path / "c.json.gz")
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_corpus([p])
    assert sorted(r["doc_id"] for r in ds.take_all()) == list(range(10))
