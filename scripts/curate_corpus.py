"""Production corpus-curation job: the rewrite pipeline end-to-end.

    python scripts/curate_corpus.py --input 'docs/*.parquet' \
        --output /data/curated [--id-col doc_id] [--text-col text] \
        [--line-dedup] [--span-dedup] [--span-l 8] [--min-tokens 0]

Stages (each optional, composed streaming — no driver
materialization of the corpus):

1. ``--line-dedup``: corpus-wide keep-first exact line dedup
   (functions/linededup.py).
2. ``--span-dedup``: exact-substring duplicate-span removal
   (functions/spans.py remove_dup_spans, Lee et al. semantics).
3. ``--min-tokens N``: drop documents that end up with fewer than N
   whitespace tokens.

Output: partitioned parquet under --output plus a stats.json with
input/output row counts and removed-unit totals.  The scale caveats
of the underlying ops apply (spill dirs must be cluster-readable on
multi-node; see functions/joins.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="input parquet file or glob")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--line-dedup", action="store_true")
    ap.add_argument("--span-dedup", action="store_true")
    ap.add_argument("--span-l", type=int, default=8)
    ap.add_argument("--min-tokens", type=int, default=0)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    files = sorted(glob.glob(args.input)) or [args.input]
    ds = ray.data.read_parquet(files,
                               columns=[args.id_col, args.text_col])
    n_in = ds.count()
    stats = {"input_docs": n_in}

    def _removed_total(rewr) -> int:
        # per-batch partial sums, merged on the driver (ints only).
        # The caller materializes the rewrite output first, so this
        # stats pass and the downstream stage share one execution
        # (duplicate-free rewrites return a LAZY identity dataset that
        # would otherwise re-execute per consumer).
        refs = rewr.map_batches(
            lambda t: pa.table({"s": pa.array(
                [pc.sum(t["n_removed"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow").to_arrow_refs()
        return int(sum(pc.sum(t["s"]).as_py() or 0
                       for t in ray.get(refs) if t.num_rows))

    def _drop_counter(rewr):
        return rewr.map_batches(
            lambda t: t.select([args.id_col, "text"]).rename_columns(
                [args.id_col, args.text_col]),
            batch_format="pyarrow")

    if args.line_dedup:
        from vfs_index_ray.functions.linededup import line_dedup
        out = line_dedup(ds, text_col=args.text_col,
                         id_col=args.id_col).materialize()
        stats["lines_removed"] = _removed_total(out)
        ds = _drop_counter(out)

    if args.span_dedup:
        from vfs_index_ray.functions.spans import remove_dup_spans
        out = remove_dup_spans(ds, L=args.span_l,
                               text_col=args.text_col,
                               id_col=args.id_col).materialize()
        stats["span_tokens_removed"] = _removed_total(out)
        ds = _drop_counter(out)

    if args.min_tokens > 0:
        lo = args.min_tokens

        def keep(t: pa.Table) -> pa.Table:
            texts = t[args.text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            ntok = pc.list_value_length(
                pc.split_pattern(pc.fill_null(texts, ""), pattern=" "))
            return t.filter(pc.greater_equal(ntok, pa.scalar(lo)))

        ds = ds.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)

    os.makedirs(args.output, exist_ok=True)
    ds.write_parquet(args.output)
    out_ds = ray.data.read_parquet(args.output)
    stats["output_docs"] = out_ds.count()
    with open(os.path.join(args.output, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
