"""Deterministic epoch-shuffle shard writer (training-data global shuffle).

LLM training consumes a corpus in pseudo-random order, re-shuffled per
epoch.  A literal ``random_shuffle``/sort is an all-to-all exchange of
every byte; the scalable idiom is hash-order shuffling:

- each record's shuffle priority is ``mix32(id XOR seed)`` — a pure
  function, so the permutation is deterministic, reproducible across
  runs/cluster sizes, and re-seedable per epoch with zero state;
- ``shard = prio % num_shards`` hive-partitions the corpus to disk
  (the build.py postings-shuffle substrate — sequential parquet, no
  pull-based sort exchange, restartable spill);
- each shard then sorts LOCALLY by ``(prio, id)`` in one Ray task and
  is written atomically (tmp + rename) as one ordered parquet file —
  resumable output: a rerun skips shards whose file already exists.

A shard is the unit a trainer streams sequentially; global order is
"shard 0's rows, then shard 1's, …", which equals ordering the whole
corpus by ``(prio % S, prio, id)`` — SQL-reproducible, hence the
``shuffle_shards`` driver oracle.  Scale: shards are sized to fit a
task's heap (corpus_bytes / num_shards); at 100 TB that's simply more
shards, never more memory.

Reference parity note: vfs-index has no training-export surface; this
is a beyond-reference LLM-data operator (brief: operations a
large-scale training-data pipeline needs).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

from ..hashing import mix32


def write_shuffled_shards(ds, out_dir: str, *, num_shards: int,
                          seed: int = 0, id_col: str = "doc_id",
                          spill_dir: str | None = None) -> dict:
    """Shuffle ``ds`` into ``num_shards`` ordered parquet shards under
    ``out_dir`` (``shard_{k:05d}.parquet``, each sorted by (prio, id)
    with a ``pos`` column).  Deterministic in ``seed``; reruns skip
    already-written shards.  ``spill_dir`` accepts any
    ``spillfs.open_spill`` spec for the shuffle scratch (cluster runs
    point it at shared storage).  Returns ``{"rows": total, "shards":
    S, "per_shard": [...]}``."""
    import pyarrow.parquet as pq
    import ray

    from ..spillfs import open_spill

    os.makedirs(out_dir, exist_ok=True)
    todo = [k for k in range(num_shards) if not os.path.exists(
        os.path.join(out_dir, f"shard_{k:05d}.parquet"))]
    if todo:
        sp = open_spill(spill_dir, prefix="shards_")
        try:
            def assign(t: pa.Table) -> pa.Table:
                ids = t[id_col].to_numpy(zero_copy_only=False).astype(
                    np.int64)
                prio = mix32(ids ^ np.int64(seed))
                return t.append_column(
                    "prio", pa.array(prio, pa.int64())).append_column(
                    "shard", pa.array(prio % num_shards, pa.int32()))

            sp.write_parquet(
                ds.map_batches(assign, batch_format="pyarrow"),
                partition_cols=["shard"])
            shard_dirs = sp.list_parts("shard")
            fs = sp.fs

            @ray.remote(num_cpus=1)
            def one_shard(k: int) -> None:
                pdir = shard_dirs.get(str(k))
                final = os.path.join(out_dir, f"shard_{k:05d}.parquet")
                if pdir is not None:
                    t = pq.read_table(pdir, filesystem=fs,
                                      use_threads=False)
                else:  # a shard can legitimately be empty
                    t = None
                if t is not None and t.num_rows:
                    ids = t[id_col].to_numpy(zero_copy_only=False)
                    prio = t["prio"].to_numpy(zero_copy_only=False)
                    order = np.lexsort((ids, prio))
                    t = t.take(pa.array(order)).append_column(
                        "pos", pa.array(np.arange(len(order), dtype=np.int64),
                                        pa.int64()))
                else:
                    t = pa.table({id_col: pa.array([], pa.int64()),
                                  "prio": pa.array([], pa.int64()),
                                  "pos": pa.array([], pa.int64())})
                tmp = final + ".tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, final)   # atomic commit per shard

            ray.get([one_shard.remote(k) for k in todo])
        finally:
            sp.cleanup()

    per = []
    for k in range(num_shards):
        f = os.path.join(out_dir, f"shard_{k:05d}.parquet")
        per.append(pq.ParquetFile(f).metadata.num_rows)
    return {"rows": int(sum(per)), "shards": num_shards, "per_shard": per}


def read_shard(out_dir: str, shard: int, columns=None) -> pa.Table:
    """One ordered shard back (already sorted by (prio, id) at write)."""
    import pyarrow.parquet as pq
    return pq.read_table(
        os.path.join(out_dir, f"shard_{shard:05d}.parquet"),
        columns=columns, use_threads=False)
