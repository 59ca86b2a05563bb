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


def test_read_corpus_lz4(ray_session, tmp_path):
    """S6 full parity (decompress/lz4.go:16-58): transparent .lz4
    (frame) decompression for json and csv inputs."""
    import pyarrow as pa

    rows = [{"doc_id": i, "text": f"alpha beta doc{i}"} for i in range(10)]
    jp = str(tmp_path / "c.json.lz4")
    with pa.output_stream(jp, compression="lz4") as f:
        for r in rows:
            f.write((json.dumps(r) + "\n").encode())
    ds = read_corpus([jp], columns=["doc_id", "text"])
    assert sorted(r["doc_id"] for r in ds.take_all()) == list(range(10))

    import io

    import pyarrow.csv as pacsv
    buf = io.BytesIO()
    pacsv.write_csv(pa.Table.from_pylist(rows), buf)
    cp = str(tmp_path / "c.csv.lz4")
    with pa.output_stream(cp, compression="lz4") as f:
        f.write(buf.getvalue())
    ds = read_corpus([cp])
    assert sorted(r["doc_id"] for r in ds.take_all()) == list(range(10))


def test_build_from_lz4_corpus(ray_session, tmp_path):
    """End-to-end: index build from an lz4-compressed JSONL corpus."""
    import pyarrow as pa

    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    pages = corpus.generate_pages(60)
    jp = str(tmp_path / "pages.json.lz4")
    with pa.output_stream(jp, compression="lz4") as f:
        for url, text in zip(pages["url"].to_pylist(),
                             pages["text"].to_pylist()):
            f.write((json.dumps({"url": url, "text": text}) + "\n"
                     ).encode())
    idx = str(tmp_path / "lzidx")
    stats = IndexBuilder(idx, mode="word", num_parts=4, id_col=None
                         ).build([jp])
    assert stats["n_docs"] == 60
    eng = SearchEngine(idx)
    assert len(eng.match("bababa")) > 0


def test_register_decoder(ray_session, tmp_path):
    """S5 full parity (util.go:216-255 setDecoder): a user-registered
    format decoder dispatches by extension."""
    import ray.data

    from vfs_index_ray import sinks

    p = str(tmp_path / "c.kv")
    with open(p, "w") as f:
        for i in range(5):
            f.write(f"{i}|text number {i}\n")

    def read_kv(files, columns):
        rows = []
        for fp in files:
            for line in open(fp):
                did, text = line.rstrip("\n").split("|", 1)
                rows.append({"doc_id": int(did), "text": text})
        ds = ray.data.from_items(rows)
        return ds.select_columns(columns) if columns else ds

    sinks.register_decoder(".kv", read_kv)
    try:
        ds = read_corpus([p], columns=["doc_id", "text"])
        assert sorted(r["doc_id"] for r in ds.take_all()) == list(range(5))
    finally:
        sinks._DECODERS.pop(".kv", None)


def test_write_results_ds_formats(ray_session, tmp_path):
    """Distributed writer: directory-of-files output per format, atomic
    publish, hive partitioning for parquet."""
    import ray.data

    from vfs_index_ray.sinks import write_results_ds
    rows = [{"doc_id": i, "grp": i % 3, "text": f"doc {i}"}
            for i in range(100)]
    ds = ray.data.from_items(rows)
    out = write_results_ds(ds, str(tmp_path / "pq"), "parquet",
                           partition_cols=["grp"])
    back = pq.read_table(out)
    assert back.num_rows == 100
    assert sorted(os.listdir(out)) == ["grp=0", "grp=1", "grp=2"]
    assert not os.path.exists(str(tmp_path / "pq.tmp"))
    out = write_results_ds(ray.data.from_items(rows),
                           str(tmp_path / "js"), "json")
    n = sum(1 for f in os.listdir(out)
            for _ in open(os.path.join(out, f)))
    assert n == 100
    out = write_results_ds(ray.data.from_items(rows),
                           str(tmp_path / "cs"), "csv")
    import pyarrow.csv as pacsv2
    n = sum(pacsv2.read_csv(os.path.join(out, f)).num_rows
            for f in os.listdir(out))
    assert n == 100
