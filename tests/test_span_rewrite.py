"""remove_dup_spans (functions/spans.py): exact-substring dedup
rewrite vs a brute-force reference."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _brute(docs: list[tuple[int, str]], L: int) -> dict:
    occ = []
    for doc_id, text in docs:
        toks = text.split(" ")
        for j in range(len(toks) - L + 1):
            occ.append((" ".join(toks[j:j + L]), doc_id, j))
    cnt = Counter(w for w, _, _ in occ)
    first: dict[str, tuple[int, int]] = {}
    for w, d, j in sorted(occ):
        first.setdefault(w, (d, j))
    out = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        cov = [False] * len(toks)
        for j in range(len(toks) - L + 1):
            w = " ".join(toks[j:j + L])
            if cnt[w] >= 2 and first[w] != (doc_id, j):
                for k in range(j, j + L):
                    cov[k] = True
        out[doc_id] = (" ".join(t for t, c in zip(toks, cov) if not c),
                       sum(cov))
    return out


def _run(docs, L, num_parts):
    import ray
    import ray.data

    from vfs_index_ray.functions.spans import remove_dup_spans

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }))
    out = remove_dup_spans(ds, L=L, num_parts=num_parts)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    return {i: (s, r) for i, s, r in zip(t["doc_id"].to_pylist(),
                                         t["text"].to_pylist(),
                                         t["n_removed"].to_pylist())}


@pytest.mark.parametrize("num_parts", [1, 4])
def test_remove_dup_spans_planted(ray_session, num_parts):
    quote = "to be or not to be that is"
    docs = [
        (1, f"first doc says {quote} and more"),
        (2, f"second doc quotes {quote} differently"),  # span removed
        (3, "a totally unique document with no repeats at all here"),
        (4, f"{quote}"),                                # exactly the span
        (5, "short text"),                              # < L tokens
    ]
    got = _run(docs, 8, num_parts)
    assert got == _brute(docs, 8)
    assert got[1][1] == 0          # corpus-first occurrence survives
    assert got[2][1] >= 8 and quote not in got[2][0]
    assert got[3] == (docs[2][1], 0)


def test_remove_dup_spans_random(ray_session):
    """400 docs over a tiny vocab so overlapping duplicate windows are
    common — overlap-merge semantics must match brute force exactly."""
    g = np.random.Generator(np.random.Philox(key=[123, 0]))
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(g.choice(vocab, 20))) for i in range(400)]
    assert _run(docs, 5, 4) == _brute(docs, 5)


def test_remove_dup_spans_no_dups_identity(ray_session):
    docs = [(i, f"a{i} b{i} c{i} d{i} doc{i} row{i} x{i} "
                f"y{i} z{i}") for i in range(10)]
    got = _run(docs, 4, 2)
    assert got == {i: (t, 0) for i, t in docs}


def test_remove_dup_spans_string_ids(ray_session):
    """url-keyed corpus (string id column) — the bench-corpus shape."""
    import ray
    import ray.data

    from vfs_index_ray.functions.spans import remove_dup_spans

    quote = "a b c d e f g h"
    docs = [("https://x.test/1", f"{quote} tail one"),
            ("https://x.test/2", f"other {quote} here"),
            ("https://x.test/3", "unique words without any repeats")]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([u for u, _ in docs]),
        "text": pa.array([t for _, t in docs]),
    }))
    out = remove_dup_spans(ds, L=8, id_col="url", num_parts=3)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    got = {u: (s, r) for u, s, r in zip(t["url"].to_pylist(),
                                        t["text"].to_pylist(),
                                        t["n_removed"].to_pylist())}
    int_docs = [(i, txt) for i, (_, txt) in enumerate(docs, 1)]
    want = {f"https://x.test/{i}": v
            for i, v in _brute(int_docs, 8).items()}
    assert got == want
