"""Scale timings for the corpus-level text operators on the synthetic
1.2M-page bench corpus (input_hint schema: url/warc_ts/html/text/lang).

    python tools/perf_textops.py [--docs 1200000] [--cpus 32] \
        [--ops token_df boilerplate keywords repetition]

Each op streams the corpus through its full pipeline and lands in a
parquet sink under /tmp (no driver materialization); prints one JSON
line with per-op wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ops", nargs="*", default=[
        "token_df", "boilerplate", "keywords", "repetition",
        "lm_score", "shuffle_shards", "dup_spans", "span_rewrite",
        "regex_scan", "profile", "edit_near_dup"])
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from bench import _bench_corpus

    bdir = _bench_corpus(args.docs)

    def pages_ds():
        return ray.data.read_parquet(bdir, columns=["url", "text"])

    sink = "/tmp/vfsray_bench/textops_out"
    times: dict[str, float] = {}
    extra: dict[str, int] = {}

    if "token_df" in args.ops:
        from vfs_index_ray.functions.boilerplate import \
            unit_doc_frequencies
        t0 = time.perf_counter()
        t = unit_doc_frequencies(pages_ds(), unit="token")
        times["token_df"] = round(time.perf_counter() - t0, 3)
        extra["vocab_size"] = t.num_rows

    if "boilerplate" in args.ops:
        from vfs_index_ray.functions.boilerplate import remove_boilerplate
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = remove_boilerplate(pages_ds(), min_frac=0.5, unit="token",
                                 id_col="url")
        out.write_parquet(sink)
        times["boilerplate"] = round(time.perf_counter() - t0, 3)

    if "keywords" in args.ops:
        from vfs_index_ray.functions.keywords import doc_keywords
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = doc_keywords(pages_ds(), k=3, unit="token", id_col="url")
        out.write_parquet(sink)
        times["keywords"] = round(time.perf_counter() - t0, 3)

    if "repetition" in args.ops:
        from vfs_index_ray.functions.textstats import RepetitionStats
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = pages_ds().map_batches(
            RepetitionStats(text_col="text", id_col="url"),
            batch_format="pyarrow")
        out.write_parquet(sink)
        times["repetition"] = round(time.perf_counter() - t0, 3)

    if "lm_score" in args.ops:
        from vfs_index_ray.functions.lmscore import lm_score
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = lm_score(pages_ds(), unit="token", id_col="url")
        out.write_parquet(sink)
        times["lm_score"] = round(time.perf_counter() - t0, 3)

    if "dup_spans" in args.ops:
        from vfs_index_ray.functions.spans import dup_spans
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = dup_spans(pages_ds(), L=8, id_col="url")
        out.write_parquet(sink)
        times["dup_spans"] = round(time.perf_counter() - t0, 3)

    if "span_rewrite" in args.ops:
        from vfs_index_ray.functions.spans import remove_dup_spans
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        out = remove_dup_spans(pages_ds(), L=8, id_col="url")
        out.write_parquet(sink)
        times["span_rewrite"] = round(time.perf_counter() - t0, 3)

    if "shuffle_shards" in args.ops:
        from vfs_index_ray.functions.shards import write_shuffled_shards
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.perf_counter()
        # url corpus: ids are the fnv of the url (int64 domain)
        import numpy as np
        import pyarrow as pa

        def add_id(t: pa.Table) -> pa.Table:
            from vfs_index_ray.hashing import fnv1a64_tokens
            u = t["url"]
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            ids = fnv1a64_tokens(u).astype(np.int64)
            return t.append_column("doc_id", pa.array(ids, pa.int64()))

        write_shuffled_shards(
            pages_ds().map_batches(add_id, batch_format="pyarrow"),
            sink, num_shards=64, seed=3)
        times["shuffle_shards"] = round(time.perf_counter() - t0, 3)

    if "regex_scan" in args.ops:
        import pyarrow as pa
        import pyarrow.compute as pc

        from vfs_index_ray.functions.boilerplate import \
            partial_aggregate

        def prep(t: pa.Table) -> pa.Table:
            cnt = pc.count_substring_regex(
                t["text"], pattern=r"[0-9]{3,}").cast(pa.int64())
            return pa.table({
                "m": cnt,
                "hit": pc.cast(pc.greater(cnt, 0), pa.int64())})

        t0 = time.perf_counter()
        t = partial_aggregate(pages_ds(), ["hit"],
                              [("m", "sum"), ("m", "count")],
                              prepare=prep)
        times["regex_scan"] = round(time.perf_counter() - t0, 3)

    if "profile" in args.ops:
        from vfs_index_ray.functions.profile import table_profile
        t0 = time.perf_counter()
        t = table_profile(pages_ds(), num_cols=[],
                          str_cols=["url", "text"])
        times["profile"] = round(time.perf_counter() - t0, 3)

    if "edit_near_dup" in args.ops:
        import pyarrow as pa

        from vfs_index_ray.functions.editdist import edit_near_dup
        import numpy as np

        def add_id(t: pa.Table) -> pa.Table:
            from vfs_index_ray.hashing import fnv1a64_tokens
            u = t["url"]
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            ids = fnv1a64_tokens(u).astype(np.int64)
            return t.append_column("doc_id",
                                   pa.array(ids, pa.int64()))

        t0 = time.perf_counter()
        out = edit_near_dup(
            pages_ds().map_batches(add_id, batch_format="pyarrow"),
            id_col="doc_id", text_col="text", prefix_len=32,
            len_bucket=64, max_dist=10)
        import ray as _ray
        pairs = sum(t.num_rows for t in
                    _ray.get(out.to_arrow_refs()))
        times["edit_near_dup"] = round(time.perf_counter() - t0, 3)
        extra["edit_pairs"] = pairs

    shutil.rmtree(sink, ignore_errors=True)
    print(json.dumps({"docs": args.docs, "cpus": args.cpus,
                      "sec": times, **extra}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
