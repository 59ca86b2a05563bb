"""Multi-field weighted BM25 (search.fielded_bm25): the threshold
algorithm must return exactly the exhaustive combined top-k, fp64
score-identical; bm25_scores_for point probes must match full-scorer
scores bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def two_field_env(ray_session, tmp_path_factory):
    from vfs_index_ray import corpus
    from vfs_index_ray.build import IndexBuilder
    from vfs_index_ray.search import SearchEngine

    d = tmp_path_factory.mktemp("fielded")
    n = 300
    pages = corpus.generate_pages(n)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pages["text"],
        "lang": pages["lang"],
    })
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    body_idx, lang_idx = str(d / "body"), str(d / "lang")
    IndexBuilder(body_idx, mode="word", num_parts=4,
                 id_col="doc_id").build([src])
    IndexBuilder(lang_idx, mode="word", num_parts=4, id_col="doc_id",
                 text_col="lang").build([src])
    return SearchEngine(body_idx), SearchEngine(lang_idx), n


def _exhaustive(body, fld, w, q, k, n):
    bids, bsc = body.bm25(q, n + 1)
    fids, fsc = fld.bm25(q, n + 1)
    assert len(bids) <= n and len(fids) <= n  # truly exhaustive
    comb: dict[int, float] = {}
    for i, s in zip(bids.tolist(), bsc.tolist()):
        comb[i] = comb.get(i, 0.0) + 1.0 * s
    for i, s in zip(fids.tolist(), fsc.tolist()):
        comb[i] = comb.get(i, 0.0) + w * s
    order = sorted(comb, key=lambda i: (-comb[i], i))[:k]
    return order, [comb[i] for i in order]


def test_fielded_equals_exhaustive(two_field_env):
    from vfs_index_ray.search import fielded_bm25
    body, fld, n = two_field_env
    for q, w in (("bababa babade en", 0.4), ("de bababe", 1.5),
                 ("zzznope", 0.4)):
        ids, sc = fielded_bm25([(body, 1.0), (fld, w)], q, k=10)
        eids, esc = _exhaustive(body, fld, w, q, 10, n)
        assert ids.astype(np.int64).tolist() == eids
        # fielded accumulates 0 + 1.0*b + w*f; the dict does the same
        assert sc.tolist() == pytest.approx(esc, abs=0, rel=0)


def test_scores_for_matches_full_scorer(two_field_env):
    body, _, n = two_field_env
    q = "bababa babade"
    ids, sc = body.bm25(q, n + 1)
    probe_ids, probe_sc = body.bm25_scores_for(q, ids)
    lookup = dict(zip(probe_ids.tolist(), probe_sc.tolist()))
    for i, s in zip(ids.tolist(), sc.tolist()):
        assert lookup[i] == s  # bit-identical, not approx
    # non-matching docs score exactly 0
    _, zeros = body.bm25_scores_for("zzznope", np.arange(5))
    assert (zeros == 0.0).all()
