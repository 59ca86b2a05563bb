"""Result sinks and ingestion helpers (reference K1-K6, S1-S6 parity).

The reference writes matched records as indented JSON or header-inferred
CSV (search_finder.go:426-450, indexer.go:127-191) and streams results
through a bounded channel (search_finder.go:451-486). Here:

- ``write_results``: pyarrow Table → json / jsonl / csv / parquet file.
- ``stream_results``: bounded streaming iterator over a Ray Dataset
  (`iter_batches` = the channel-with-backpressure analog).
- ``read_corpus``: format-dispatched ingestion (parquet / jsonl / csv —
  the decoder-registry analog, util.go:216-255); compressed variants
  (.gz etc.) ride on Arrow's transparent decompression, the reference's
  lz4 path analog (decompress/lz4.go).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq


def write_results(tbl: pa.Table, path: str, fmt: str | None = None) -> str:
    """Write a (small, driver-side) result table; fmt from extension."""
    if fmt is None:
        fmt = os.path.splitext(path)[1].lstrip(".") or "json"
    if fmt == "parquet":
        pq.write_table(tbl, path)
    elif fmt == "csv":
        pacsv.write_csv(tbl, path)
    elif fmt in ("json", "jsonl"):
        rows = tbl.to_pylist()
        with open(path, "w") as f:
            if fmt == "json":
                json.dump(rows, f, indent=2, default=str)
            else:
                for r in rows:
                    f.write(json.dumps(r, default=str) + "\n")
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return path


def write_results_ds(ds, out_dir: str, fmt: str = "parquet",
                     partition_cols: list[str] | None = None) -> str:
    """Distributed result writer (K3/K4 at scale): streams a Dataset to
    a DIRECTORY of files (one per block — never one giant file), written
    to a tmp dir and atomically renamed, so a failed job leaves no
    partial output and a rerun is clean. ``partition_cols`` hive-
    partitions parquet output by key (resumable/skippable per key)."""
    import shutil

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if fmt == "parquet":
        if partition_cols:
            ds.write_parquet(tmp, partition_cols=partition_cols)
        else:
            ds.write_parquet(tmp)
    elif fmt in ("json", "jsonl"):
        ds.write_json(tmp)
    elif fmt == "csv":
        ds.write_csv(tmp)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    # swap: rename any existing output aside first, so a crash between
    # steps leaves either the old output or the new one — never nothing
    old = out_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_dir):
        os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return out_dir


def stream_results(ds, batch_size: int = 1024, limit: int | None = None):
    """Streaming result iterator with an optional row limit — the
    reference's result channel + Limit SkipFn (search_finder.go:78-106,
    250-280) as Ray Data streaming consumption."""
    seen = 0
    for batch in ds.iter_batches(batch_size=batch_size,
                                 batch_format="pyarrow"):
        if limit is not None and seen + batch.num_rows > limit:
            yield batch.slice(0, limit - seen)
            return
        seen += batch.num_rows
        yield batch


# user-pluggable decoder registry (reference S5, util.go:216-255
# setDecoder): extension → fn(files, columns) -> ray Dataset. Built-in
# formats are dispatched below; register_decoder overrides or extends.
_DECODERS: dict[str, object] = {}

# transparent decompression suffixes (reference S6, decompress/lz4.go):
# Arrow decodes both stream formats on the read path
_COMPRESSION_SUFFIXES = {".gz": "gzip", ".lz4": "lz4"}


def register_decoder(ext: str, fn) -> None:
    """Register a custom format decoder: ``fn(files, columns) ->
    ray.data.Dataset`` for files with extension ``ext`` (e.g.
    ``".ndjson"``). The transparent-compression suffixes (.gz/.lz4) are
    stripped before dispatch, so a registered format composes with
    compressed inputs for free if ``fn`` handles them."""
    _DECODERS[ext if ext.startswith(".") else "." + ext] = fn


def _strip_compression(f: str) -> tuple[str, str | None]:
    for suf, codec in _COMPRESSION_SUFFIXES.items():
        if f.endswith(suf):
            return f[: -len(suf)], codec
    return f, None


def read_corpus(files: list[str], columns: list[str] | None = None):
    """Format-dispatched corpus reader: one Dataset from parquet / jsonl /
    csv inputs (extension decides, like the reference's decoder registry),
    with transparent .gz / .lz4 decompression. All files in one call must
    share a format and compression."""
    import ray.data

    stripped = [_strip_compression(f) for f in files]
    exts = {os.path.splitext(s)[1] for s, _ in stripped}
    codecs = {c for _, c in stripped}
    if len(exts) != 1:
        raise ValueError(f"mixed input formats: {sorted(exts)}")
    if len(codecs) != 1:
        raise ValueError("mixed compression codecs in one read")
    ext = exts.pop()
    codec = codecs.pop()
    if ext in _DECODERS:
        return _DECODERS[ext](files, columns)
    open_args = {"compression": codec} if codec else None
    if ext == ".parquet":
        if codec:
            raise ValueError("parquet is internally compressed; "
                             f"{codec} wrapping is not supported")
        return ray.data.read_parquet(files, columns=columns)
    if ext in (".json", ".jsonl"):
        ds = ray.data.read_json(files, arrow_open_stream_args=open_args)
    elif ext == ".csv":
        ds = ray.data.read_csv(files, arrow_open_stream_args=open_args)
    else:
        raise ValueError(f"no reader for {ext!r} (register_decoder to "
                         "add one)")
    if columns:
        ds = ds.select_columns(columns)
    return ds
