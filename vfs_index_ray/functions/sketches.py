"""Mergeable cardinality sketches: HyperLogLog approximate
count-DISTINCT group-by.

The 100-TB shape for distinct counting: the exact operator
(``distinct_aggregate``) must shuffle every (group, key) pair at least
once; the sketch shuffles NOTHING — each batch folds into a 64-register
max-array per group, partials are tiny (groups x 64 rows) and merge by
max, so a trillion-row input moves only kilobytes.

Everything is integer-exact and closed-form so a SQL oracle can
reproduce the estimate bit-for-bit (pipelines ``events_approx_users``):

- hash: ``hashing.mix32`` (already SQL-proven by the train_split
  oracle) — 32-bit value h; bucket = top 6 bits (m=64 registers),
  w = low 26 bits, rho = 27 - bitlen(w)  (bitlen(0) = 0, so an
  all-zero suffix gives the max rho of 27; any observed row has
  rho >= 1).
- harmonic denominator: rho <= 27, so sum(2^(27-rho)) over the 64
  registers (absent register: 2^27) is an exact int64.
- raw estimate: floor(alpha_64 * m^2 * 2^27 / denom) with
  alpha_64 = 709/1000 (Flajolet et al. 2007's constant, an exact
  rational) — int64-safe integer division on both sides.
- small-range correction (E <= 2.5 m and empty registers exist):
  linear counting m*ln(m/V) via ``LINEAR_COUNT_64`` — 64 PRECOMPUTED
  integer literals shared verbatim by the engine and the embedded SQL
  lookup, so no transcendental function is ever evaluated at query
  time on either side.

Reference analog: vfs-index's COUNT() per key is exact over posting
lists (query.go); this is the companion sketch for when the key space
itself is too large to count exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import mix32

HLL_P = 6                      # 64 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 32 - HLL_P         # 26 suffix bits -> rho in [1, 27]
HLL_SCALE = 1 << (HLL_WBITS + 1)               # 2^27
_ALPHA_NUM, _ALPHA_DEN = 709, 1000             # alpha_64 exactly
_EST_NUM = _ALPHA_NUM * HLL_M * HLL_M * HLL_SCALE  # fits int64

# linear-counting table: LINEAR_COUNT_64[V] = round(m * ln(m / V)) for
# V empty registers (V=64 -> 0). Both the engine and the generated SQL
# lookup use THESE literals — the ln is evaluated once, here.
LINEAR_COUNT_64 = {
    v: int(round(HLL_M * math.log(HLL_M / v))) for v in range(1, HLL_M + 1)
}


def hll_estimate(denom_scaled: int, zeros: int) -> int:
    """Integer HLL estimate from the merged register state.
    ``denom_scaled`` = sum over all m registers of 2^(27 - rho)
    (empty register: 2^27); ``zeros`` = number of empty registers."""
    e_raw = _EST_NUM // (_ALPHA_DEN * denom_scaled)
    if zeros > 0 and e_raw <= (5 * HLL_M) // 2:   # E <= 2.5 m
        return LINEAR_COUNT_64[zeros]
    return e_raw


def _rho(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per id — vectorized, no per-row Python."""
    h = mix32(ids).astype(np.uint64)
    bucket = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
    w = (h & np.uint64((1 << HLL_WBITS) - 1)).astype(np.int64)
    bitlen = np.zeros(len(w), np.int64)
    nz = w > 0
    bitlen[nz] = np.floor(np.log2(w[nz])).astype(np.int64) + 1
    return bucket, (HLL_WBITS + 1) - bitlen


def approx_distinct(ds, *, key_col: str, group_col: str,
                    out_col: str = "approx_distinct") -> pa.Table:
    """Approximate count(DISTINCT key_col) GROUP BY group_col via a
    64-register HyperLogLog per group.  Per batch: fold rows into a
    (group, bucket) -> max(rho) partial (at most groups x 64 rows ship
    per batch); the driver merges partials by max and applies the
    closed-form integer estimate.  Null keys are ignored (SQL COUNT
    DISTINCT semantics); null groups are ignored like the exact
    operator.  Output sorted by group. Deterministic under any
    partitioning/ordering (max is order-free)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, key_col])
        mask = pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[key_col]))
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], t.schema.field(group_col).type),
                "bucket": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64())})
        enc = t[group_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        groups = enc.dictionary
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket, rho = _rho(ids)
        regs = np.zeros(len(groups) * HLL_M, np.int64)
        np.maximum.at(regs, codes * HLL_M + bucket, rho)
        gi, bi = np.nonzero(regs.reshape(len(groups), HLL_M))
        return pa.table({
            group_col: groups.take(pa.array(gi, pa.int64())),
            "bucket": pa.array(bi, pa.int64()),
            "rho": pa.array(regs.reshape(len(groups), HLL_M)[gi, bi],
                            pa.int64()),
        })

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.table({group_col: pa.array([], pa.string()),
                         out_col: pa.array([], pa.int64())})
    m = pa.concat_tables(tbls).combine_chunks()
    # merge partials: max rho per (group, bucket), then estimate
    enc = m[group_col].combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    groups = enc.dictionary
    bucket = m["bucket"].to_numpy(zero_copy_only=False)
    rho = m["rho"].to_numpy(zero_copy_only=False)
    regs = np.zeros(len(groups) * HLL_M, np.int64)
    np.maximum.at(regs, codes * HLL_M + bucket, rho)
    regs = regs.reshape(len(groups), HLL_M)
    ests = []
    for g in range(len(groups)):
        r = regs[g]
        zeros = int((r == 0).sum())
        denom = int((1 << (HLL_WBITS + 1 - r[r > 0])).sum()) \
            + zeros * HLL_SCALE
        ests.append(hll_estimate(denom, zeros))
    names = groups.to_pylist()
    order = np.argsort(np.asarray(names, object), kind="stable")
    return pa.table({
        group_col: pa.array([names[i] for i in order], pa.string()),
        out_col: pa.array([ests[i] for i in order], pa.int64()),
    })


def hll_oracle_sql(table: str, key_col: str, group_col: str,
                   out_col: str = "approx_distinct") -> str:
    """DuckDB SQL that recomputes the EXACT same sketch from the raw
    rows: the mix32 hash in HUGEINT arithmetic, bitlen via
    length(printf('%b', w)) (pure integer — no floating point
    anywhere), the same integer division, and the linear-counting
    lookup embedded from LINEAR_COUNT_64."""
    lc_rows = ",\n    ".join(f"({v}, {e})"
                             for v, e in sorted(LINEAR_COUNT_64.items()))
    wmask = (1 << HLL_WBITS) - 1
    return f"""
WITH lc(zeros, est) AS (VALUES
    {lc_rows}
), ev AS (
  SELECT {group_col} AS g, {key_col} AS id FROM {table}
  WHERE {group_col} IS NOT NULL AND {key_col} IS NOT NULL
), h1 AS (
  SELECT g, CAST((CAST(id AS HUGEINT) * 2654435761) % 4294967296
                 AS BIGINT) AS v FROM ev
), h2 AS (
  SELECT g, CAST((CAST(xor(v, v >> 16) AS HUGEINT) * 2246822519)
                 % 4294967296 AS BIGINT) AS v FROM h1
), hh AS (
  SELECT g, xor(v, v >> 13) AS h FROM h2
), br AS (
  SELECT g, h // {wmask + 1} AS bucket,
    CASE WHEN h % {wmask + 1} = 0 THEN {HLL_WBITS + 1}
         ELSE {HLL_WBITS + 1} - length(printf('%b', h % {wmask + 1}))
    END AS rho
  FROM hh
), reg AS (
  SELECT g, bucket, max(rho) AS rho FROM br GROUP BY g, bucket
), agg AS (
  SELECT g, CAST(sum(1 << ({HLL_WBITS + 1} - rho)) AS BIGINT) AS nzd,
         count(*) AS nb
  FROM reg GROUP BY g
), est AS (
  SELECT g, nzd + ({HLL_M} - nb) * {HLL_SCALE} AS denom,
         {HLL_M} - nb AS zeros
  FROM agg
), raw AS (
  SELECT g, zeros,
         {_EST_NUM} // ({_ALPHA_DEN} * denom) AS e_raw
  FROM est
)
SELECT raw.g AS {group_col},
  CAST(CASE WHEN raw.zeros > 0 AND raw.e_raw <= {(5 * HLL_M) // 2}
            THEN lc.est ELSE raw.e_raw END AS BIGINT) AS {out_col}
FROM raw LEFT JOIN lc ON lc.zeros = raw.zeros
ORDER BY {group_col}
"""
