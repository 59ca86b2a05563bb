"""functions/fuzzy.py: trigram-Jaccard fuzzy term lookup."""

import duckdb
import numpy as np
import pyarrow as pa

from vfs_index_ray.functions.fuzzy import fuzzy_terms, score_tokens
from vfs_index_ray.tokenizer import pack_trigram


def _py_jaccard(tok: str, q: str) -> int:
    g = {tok[i:i + 3] for i in range(len(tok) - 2)}
    qg = {q[i:i + 3] for i in range(len(q) - 2)}
    inter = len(g & qg)
    return (inter * 1_000_000) // max(len(g | qg), 1)


def test_score_tokens_matches_python_sets():
    toks = pa.array(["spark", "sparkle", "park", "apache", "sp",
                     "spar", "krabs", "sparc"])
    q = "sparc"
    qg = np.array(sorted(set(pack_trigram(q))), np.uint64)
    inter, jacc = score_tokens(toks, qg, len(qg))
    for i, t in enumerate(toks.to_pylist()):
        assert jacc[i] == _py_jaccard(t, q), t
    assert jacc[toks.to_pylist().index("sparc")] == 1_000_000


def test_fuzzy_terms_matches_duckdb_with_k_boundary(ray_session):
    import ray.data

    # 120 synthetic docs over a 60-token vocabulary with many partial
    # matches so the k=10 boundary (and its tie-break) is exercised
    rng = np.random.default_rng(11)
    vocab = ([f"spar{c}" for c in "abcdefghij"]
             + [f"sp{c}rk" for c in "aeiou"]
             + [f"park{c}" for c in "xyz"]
             + [f"tok{i}" for i in range(42)])
    texts = [" ".join(rng.choice(vocab, 8)) for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(6)
    got = fuzzy_terms(ds, "sparc", k=10)

    con = duckdb.connect()
    con.register("documents", t)
    toks = ("list_filter(regexp_split_to_array(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')")
    qg = sorted({"sparc"[i:i + 3] for i in range(3)})
    lit = "[" + ", ".join(f"'{g}'" for g in qg) + "]"
    want = con.sql(f"""
      WITH v AS (SELECT DISTINCT unnest({toks}) AS tok
                 FROM documents),
      t AS (SELECT tok,
              list_distinct(list_transform(range(1, length(tok) - 1),
                i -> substr(tok, CAST(i AS INT), 3))) AS gs
            FROM v WHERE length(tok) >= 3),
      s AS (SELECT tok, len(list_intersect(gs, {lit})) AS inter,
                   len(gs) AS ng FROM t)
      SELECT tok AS token,
             ((inter * 1000000) // (ng + 3 - inter))::BIGINT
               AS jacc_x1e6
      FROM s WHERE inter >= 1
      ORDER BY jacc_x1e6 DESC, token LIMIT 10
    """).arrow()
    assert got.num_rows == 10
    assert got["token"].to_pylist() == want["token"].to_pylist()
    assert (got["jacc_x1e6"].to_pylist()
            == want["jacc_x1e6"].to_pylist())


def test_fuzzy_terms_short_query_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["spark join"])}))
    assert fuzzy_terms(ds, "sp").num_rows == 0
