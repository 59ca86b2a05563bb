"""Deterministic sfN-equivalent gate fixture: tile an existing driver
testdata dir by an integer factor (default 10× sf0.1 ≈ an sf1: 50k
documents, 20k embeddings, 1M events, 1.5M orders).

    python tools/make_sf_scale.py [--src /root/testdata/sf0.1] \
        [--out /tmp/testdata_sf1] [--mult 10]

Replica r = 0 copies every table byte-identically; replicas r > 0 remap
ids by ``r * OFFSET`` (a power of ten above the max source id, so
replica ids never collide) and append one replica+doc-unique token to
each document's text (keeping n_chars consistent) so exact-dup
structure is not inflated 10×. Everything is a pure function of the
source tables — no wall-clock, no randomness — so the fixture is
reproducible and the oracle gate (engine vs DuckDB over the SAME files)
is meaningful at 10× scale. Tables the gate queries never touch are
copied once, unchanged.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_ONLY = ["region", "nation", "customer", "supplier", "part"]


def _offset_for(ids: np.ndarray) -> int:
    m = int(ids.max()) if len(ids) else 0
    off = 1
    while off <= m:
        off *= 10
    return off


def _salt_text(texts: list[str], r: int) -> list[str]:
    """Replica-r text transform: insert the replica token after every
    3rd original token. This BREAKS cross-replica similarity — a 3-token
    shingle survives only when it fits a gap, so replica↔original
    Jaccard lands ≈0.2-0.3 (far below near-dup thresholds), and the
    repeated salt token moves the replica's SimHash many bits — while
    WITHIN a replica every transformation is identical, so planted
    near-dup structure is preserved per replica. Without this, one
    suffix token keeps every replica a near-dup of its original and the
    near-dup pipelines (and their all-pairs oracle SQL) go quadratic in
    the WHOLE corpus instead of per planted cluster."""
    salt = f"q{r}zed"
    out = []
    for s in texts:
        toks = s.split(" ")
        parts = []
        for i in range(0, len(toks), 3):
            parts.extend(toks[i:i + 3])
            parts.append(salt)
        out.append(" ".join(parts))
    return out


def scale_documents(src: str, out: str, mult: int) -> None:
    t = pq.read_table(src)
    off = _offset_for(t["doc_id"].to_numpy(zero_copy_only=False))
    texts0 = t["text"].to_pylist()
    reps = [t]
    for r in range(1, mult):
        ids = t["doc_id"].to_numpy(zero_copy_only=False) + r * off
        text = pa.array(_salt_text(texts0, r), pa.string())
        rep = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": text,
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
        })
        reps.append(rep)
    pq.write_table(pa.concat_tables(reps), out)


def scale_embeddings(src: str, out: str, mult: int) -> None:
    t = pq.read_table(src)
    off = _offset_for(t["vec_id"].to_numpy(zero_copy_only=False))
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    flat = emb.values.to_numpy(zero_copy_only=False)
    dim = len(flat) // n if n else 0
    mat = flat.reshape(n, dim)
    reps = [t]
    for r in range(1, mult):
        # roll the DIMENSIONS by r: cosine within a replica is preserved
        # exactly (same rotation both sides), cross-replica similarity
        # collapses to ≈0 for generic vectors — so near-dup/ANN structure
        # tiles per replica instead of every copy pairing with its
        # original (which would make the all-pairs oracle quadratic in
        # the whole corpus)
        rolled = np.roll(mat, r % max(dim, 1), axis=1)
        reps.append(pa.table({
            "vec_id": pa.array(
                t["vec_id"].to_numpy(zero_copy_only=False) + r * off,
                pa.int64()),
            "embedding": pa.array(list(rolled.astype(np.float32)),
                                  emb.type),
            "label": t["label"],
        }))
    pq.write_table(pa.concat_tables(reps), out)


def scale_events(src: str, out: str, mult: int) -> None:
    t = pq.read_table(src)
    eoff = _offset_for(t["event_id"].to_numpy(zero_copy_only=False))
    uoff = _offset_for(t["user_id"].to_numpy(zero_copy_only=False))
    reps = [t]
    for r in range(1, mult):
        reps.append(pa.table({
            "event_id": pa.array(
                t["event_id"].to_numpy(zero_copy_only=False) + r * eoff,
                pa.int64()),
            "ts": t["ts"],
            "user_id": pa.array(
                t["user_id"].to_numpy(zero_copy_only=False) + r * uoff,
                pa.int64()),
            "event_type": t["event_type"],
            "value": t["value"],
            "props": t["props"],
        }))
    pq.write_table(pa.concat_tables(reps), out)


def scale_orders(src: str, out: str, mult: int) -> None:
    t = pq.read_table(src)
    koff = _offset_for(t["o_orderkey"].to_numpy(zero_copy_only=False))
    reps = [t]
    for r in range(1, mult):
        reps.append(pa.table({
            "o_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False) + r * koff,
                pa.int64()),
            "o_custkey": t["o_custkey"],
            "o_orderstatus": t["o_orderstatus"],
            "o_totalprice": t["o_totalprice"],
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
        }))
    pq.write_table(pa.concat_tables(reps), out)


def scale_lineitem(src: str, orders_src: str, out: str,
                   mult: int) -> None:
    """Tile lineitem with l_orderkey remapped by the SAME offset the
    orders tiling uses (computed from orders' o_orderkey domain), so
    every replica lineitem still joins its replica order.  Dim keys
    (l_partkey / l_suppkey) and the customer side (o_custkey) stay
    unchanged — the fixture reads as 'the same customers, parts and
    suppliers transacting 10× more', keeping every dim join valid."""
    ot = pq.read_table(orders_src, columns=["o_orderkey"])
    koff = _offset_for(ot["o_orderkey"].to_numpy(zero_copy_only=False))
    t = pq.read_table(src)
    reps = [t]
    for r in range(1, mult):
        cols = {"l_orderkey": pa.array(
            t["l_orderkey"].to_numpy(zero_copy_only=False) + r * koff,
            pa.int64())}
        for name in t.schema.names:
            if name != "l_orderkey":
                cols[name] = t[name]
        reps.append(pa.table(cols).select(t.schema.names))
    pq.write_table(pa.concat_tables(reps), out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata_sf1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    for t in COPY_ONLY:
        shutil.copyfile(os.path.join(args.src, f"{t}.parquet"),
                        os.path.join(args.out, f"{t}.parquet"))
    scale_documents(os.path.join(args.src, "documents.parquet"),
                    os.path.join(args.out, "documents.parquet"), args.mult)
    scale_embeddings(os.path.join(args.src, "embeddings.parquet"),
                     os.path.join(args.out, "embeddings.parquet"),
                     args.mult)
    scale_events(os.path.join(args.src, "events.parquet"),
                 os.path.join(args.out, "events.parquet"), args.mult)
    scale_orders(os.path.join(args.src, "orders.parquet"),
                 os.path.join(args.out, "orders.parquet"), args.mult)
    scale_lineitem(os.path.join(args.src, "lineitem.parquet"),
                   os.path.join(args.src, "orders.parquet"),
                   os.path.join(args.out, "lineitem.parquet"),
                   args.mult)
    for name in ("documents", "embeddings", "events", "orders",
                 "lineitem"):
        n = pq.read_metadata(os.path.join(args.out,
                                          f"{name}.parquet")).num_rows
        print(f"{name}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
