"""Tokenizer/hashing tests, incl. reference-conformance trigram semantics."""

import collections

import numpy as np
import pyarrow as pa

from vfs_index_ray import corpus
from vfs_index_ray.hashing import fnv1a64, fnv1a64_tokens
from vfs_index_ray.oracle import oracle_tokenize
from vfs_index_ray.tokenizer import (pack_trigram, postings_from_texts,
                                     tokenize_query, trigram_ids_flat)


def test_fnv_vector_matches_scalar():
    toks = pa.array(["hello", "a", "", "x" * 100, "日本語", "0abc9"])
    hv = fnv1a64_tokens(toks)
    assert [int(x) for x in hv] == [fnv1a64(t) for t in toks.to_pylist()]


def _postings_via_oracle(texts, mode):
    out = []
    for i, s in enumerate(texts):
        c = collections.Counter(oracle_tokenize(s, mode))
        out.extend((i, k, v) for k, v in sorted(c.items()))
    return sorted(out)


def test_word_postings_match_oracle():
    texts = pa.array(["Hello, World! hello", "the quick brown fox", "",
                      "UPPER lower 123 mixed-case", "日本語テキスト"])
    t = postings_from_texts(texts, np.arange(5, dtype=np.uint64), "word")
    got = sorted(zip(t["doc_id"].to_pylist(),
                     [int(x) for x in t["term_id"].to_pylist()],
                     t["tf"].to_pylist()))
    assert got == _postings_via_oracle(texts.to_pylist(), "word")


def test_trigram_postings_match_oracle():
    texts = pa.array(["北朝鮮による日本人拉致問題", "短い", "", "abcdef",
                      "活動内容の活動内容"])
    t = postings_from_texts(texts, np.arange(5, dtype=np.uint64), "trigram")
    got = sorted(zip(t["doc_id"].to_pylist(),
                     [int(x) for x in t["term_id"].to_pylist()],
                     t["tf"].to_pylist()))
    assert got == _postings_via_oracle(texts.to_pylist(), "trigram")


def test_trigram_short_string_zero_keys():
    # reference semantics: <3 runes → zero keys → Match("鬼滅") finds nothing
    # (vfsindex_test.go:149-159)
    assert pack_trigram("鬼滅") == []
    ids, parent, dl = trigram_ids_flat(pa.array(["ab", "x"]))
    assert len(ids) == 0
    assert dl.tolist() == [0, 0]


def test_trigram_count_is_runes_minus_two():
    # reference: len(TriKeys(s)) == len(runes)-2 (vfsindex_test.go:306-313)
    s = "活動内容のテスト文字列"
    assert len(pack_trigram(s)) == len(s) - 2


def test_trigram_roundtrip_packing():
    # pack is 16 bits per rune, 3 runes — decodable (util.go:76-83 analog)
    s = "活動内"
    key = pack_trigram(s)[0]
    runes = [(key >> 32) & 0xFFFF, (key >> 16) & 0xFFFF, key & 0xFFFF]
    assert "".join(chr(r) for r in runes) == s


def test_dl_counts_tokens():
    texts = pa.array(["one two three", "one one", ""])
    t = postings_from_texts(texts, np.arange(3, dtype=np.uint64), "word")
    by_doc = {}
    for r in t.to_pylist():
        by_doc[r["doc_id"]] = r["dl"]
    assert by_doc[0] == 3 and by_doc[1] == 2 and 2 not in by_doc


def test_tokenize_query_dedup_order():
    out = tokenize_query("B a b A c")
    assert [t for t, _ in out] == ["b", "a", "c"]


def test_ref_records_activity_planted():
    rr = corpus.generate_ref_records()
    # df of the planted trigram == 4 docs (vfsindex_internal_test.go:720-739)
    key = pack_trigram(corpus.ACTIVITY_TRIGRAM)[0]
    n = sum(1 for c in rr["content"].to_pylist()
            if key in oracle_tokenize(c, "trigram"))
    assert n == 4
    assert rr.num_rows == 31
    assert set(corpus.REF_IDS) <= set(rr["id"].to_pylist())


def test_pages_determinism_per_row():
    # per-row invariant: text byte-identical per url across regenerations
    a = corpus.generate_pages(300)
    b = corpus.generate_pages(300)
    assert a.equals(b)
    # and independent of total size: row r identical in different-sized runs
    c = corpus.generate_pages(120)
    assert a["text"].to_pylist()[:120] == c["text"].to_pylist()
    assert a["url"].to_pylist()[:120] == c["url"].to_pylist()
