"""Unigram-LM quality scoring + stratified sampling."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa


def _mk_ds(texts, langs=None, parallelism=None):
    import ray.data
    t = {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    if langs is not None:
        t["lang"] = pa.array(langs)
    ds = ray.data.from_arrow(pa.table(t))
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds


def _py_lm(texts, scale=10**6):
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    total = sum(cnt.values())
    lp = {u: math.floor(math.log(c / total) * scale + 0.5)
          for u, c in cnt.items()}
    out = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        s = sum(lp[u] for u in toks)
        out.append((i, len(toks), math.floor(s / len(toks) + 0.5)))
    return out


def test_unit_term_frequencies(ray_session):
    from vfs_index_ray.functions.boilerplate import unit_term_frequencies
    texts = ["a b a c", "b b d", "a"]
    t = unit_term_frequencies(_mk_ds(texts), unit="token")
    got = dict(zip(t["unit"].to_pylist(), t["tf"].to_pylist()))
    assert got == {"a": 3, "b": 3, "c": 1, "d": 1}


def test_lm_score_matches_bruteforce(ray_session):
    from vfs_index_ray.functions.lmscore import lm_score
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish draws so counts are skewed like a real corpus
    texts = [" ".join(vocab[min(int(rng.zipf(1.4)) - 1, 39)]
                      for _ in range(int(rng.integers(3, 30))))
             for _ in range(200)]
    rows = sorted(lm_score(_mk_ds(texts, parallelism=7)).take_all(),
                  key=lambda r: r["doc_id"])
    exp = _py_lm(texts)
    assert len(rows) == len(exp)
    for r, (i, n, avg) in zip(rows, exp):
        assert r["doc_id"] == i
        assert r["n_tokens"] == n
        assert r["avg_logprob_x1e6"] == avg


def test_lm_score_user_vocab_oov(ray_session):
    """Tokens absent from a user-supplied tf table score as tf=1."""
    from vfs_index_ray.functions.lmscore import lm_score
    tf = pa.table({"unit": pa.array(["a", "b"]),
                   "tf": pa.array([9, 1], pa.int64())})
    rows = sorted(lm_score(_mk_ds(["a a b", "zz a"]),
                           tf_table=tf).take_all(),
                  key=lambda r: r["doc_id"])
    lp = {u: math.floor(math.log(c / 10) * 10**6 + 0.5)
          for u, c in [("a", 9), ("b", 1), ("zz", 1)]}
    assert rows[0]["avg_logprob_x1e6"] == math.floor(
        (2 * lp["a"] + lp["b"]) / 3 + 0.5)
    assert rows[1]["avg_logprob_x1e6"] == math.floor(
        (lp["zz"] + lp["a"]) / 2 + 0.5)


def test_stratified_sample_deterministic_and_partition_free(ray_session):
    from vfs_index_ray.functions.sampling import stratified_sample
    from vfs_index_ray.hashing import mix32
    langs = ["en", "de", "fr"] * 40
    texts = ["x"] * len(langs)
    a = stratified_sample(_mk_ds(texts, langs, parallelism=1),
                          group_col="lang", k=4)
    b = stratified_sample(_mk_ds(texts, langs, parallelism=11),
                          group_col="lang", k=4)
    assert a.equals(b)
    assert a.num_rows == 12
    # per-group: exactly the 4 lowest (mix32(id), id) of that group
    ids = np.arange(len(langs), dtype=np.int64)
    prio = mix32(ids)
    for g in ["de", "en", "fr"]:
        mask = np.array([x == g for x in langs])
        order = np.lexsort((ids[mask], prio[mask]))
        want = sorted(ids[mask][order][:4].tolist())
        got = sorted(a.filter(
            pa.compute.equal(a["lang"], g))["doc_id"].to_pylist())
        assert got == want
    # sample is a prefix-stable reservoir: adding MORE docs never
    # evicts a doc whose priority stayed among the k lowest
    c = stratified_sample(_mk_ds(texts + ["x"], langs + ["en"],
                                 parallelism=5), group_col="lang", k=4)
    de_a = a.filter(pa.compute.equal(a["lang"], "de"))["doc_id"]
    de_c = c.filter(pa.compute.equal(c["lang"], "de"))["doc_id"]
    assert de_a.to_pylist() == de_c.to_pylist()


def test_quality_filter_threshold_rank(ray_session):
    """Threshold is the value at ascending rank ceil(pct*n/100); docs
    at or above it survive (ties included), independent of
    partitioning."""
    from vfs_index_ray.functions.lmscore import quality_filter

    # distinct ordered scores: doc i mixes one rare token (tf=1) with
    # i+1 copies of the common token, so avg rises strictly with i
    texts = [f"r{i} " + " ".join(["c"] * (i + 1)) for i in range(10)]
    for par in (1, 5):
        out, thr = quality_filter(_mk_ds(texts, parallelism=par), pct=40)
        rows = sorted(r["doc_id"] for r in out.take_all())
        scored = {r["doc_id"]: r["avg_logprob_x1e6"]
                  for r in __import__("vfs_index_ray.functions.lmscore",
                                      fromlist=["lm_score"]
                                      ).lm_score(_mk_ds(texts)).take_all()}
        vals = sorted(scored.values())
        want_thr = vals[(40 * len(vals) + 99) // 100 - 1]
        assert thr == want_thr
        assert rows == sorted(i for i, v in scored.items()
                              if v >= want_thr)
        assert 0 < len(rows) < len(texts)
