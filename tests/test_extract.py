"""HTML -> text extraction (functions/extract.py).

BASELINE.json input_hint: pages (url, warc_ts, html:binary, text, lang),
per-row invariant "byte-identical extracted text per url".  The reference
indexes pre-decoded fields (indexer.go); at web scale text is produced
from html, so the extractor is part of the build path and its inversion
of the page template is asserted byte-for-byte here.
"""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from vfs_index_ray import corpus
from vfs_index_ray.functions.extract import (extract_text,
                                             extract_text_batch, wrap_html)


def test_extract_inverts_pages_template_byte_identical():
    pages = corpus.generate_pages(500)
    got = extract_text(pages.column("html"))
    assert got.to_pylist() == pages.column("text").to_pylist()


def test_extract_strips_blocks_and_decodes_entities():
    html = pa.array([
        b"<HEAD><title>drop me</title></HEAD><b>keep</b>",
        b"<script x=1>var a;</script>ok<!-- comment -->",
        b"<style>p{}</style>styled",
        b"x &amp;lt; y",           # single-pass decode: &amp;lt; -> &lt;
        b"a&nbsp;b&#39;c&quot;d&lt;e&gt;f",
        b"",
    ])
    assert extract_text(html).to_pylist() == [
        "keep", "ok", "styled", "x &lt; y", "a\xa0b'c\"d<e>f", ""]


def test_wrap_roundtrip_on_adversarial_text():
    texts = pa.array(["a & b < c > d", "&amp;", "北朝鮮による日本人拉致問題",
                      "", "line\nbreak  spaces\tkept"])
    assert extract_text(wrap_html(texts)).to_pylist() == texts.to_pylist()


def test_extract_batch_drops_html_keeps_schema():
    pages = corpus.generate_pages(8)
    out = extract_text_batch(pages, html_col="html", text_col="text")
    assert "html" not in out.column_names
    assert out.column("text").to_pylist() == pages.column("text").to_pylist()


def _dir_digest(d):
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(d)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(f.encode())
                    h.update(fh.read())
    return h.hexdigest()


def test_build_from_html_identical_to_build_from_text(ray_session, tmp_path):
    """IndexBuilder(html_col=...) extracts in-pipeline; the resulting index
    is byte-identical (deterministic segment content) to one built from the
    pre-extracted text column of the same pages."""
    from vfs_index_ray.build import IndexBuilder

    pages = corpus.generate_pages(500)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(pages, src)

    from_text = str(tmp_path / "idx_text")
    IndexBuilder(from_text, mode="word", num_parts=4, id_col=None
                 ).build([src])
    from_html = str(tmp_path / "idx_html")
    IndexBuilder(from_html, mode="word", num_parts=4, id_col=None,
                 html_col="html").build([src])

    assert (_dir_digest(os.path.join(from_text, "segments"))
            == _dir_digest(os.path.join(from_html, "segments")))

    from vfs_index_ray.search import SearchEngine
    eng = SearchEngine(from_html)
    docs, scores = eng.bm25(corpus.RARE_TERM, 10)
    assert len(docs) == 4  # planted df==4 fixture reachable via html path
