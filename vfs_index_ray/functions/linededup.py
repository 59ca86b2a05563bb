"""Global exact line-level dedup, keep-first (the C4 / CCNet
line-dedup webtext-cleanup shape).

A line that occurs anywhere else in the corpus keeps only its FIRST
occurrence in (doc_id, line-ordinal) order; every later occurrence is
removed and each document's text is rebuilt from its surviving lines
in original order.  Differs from boilerplate pruning
(functions/boilerplate.py), which removes every occurrence of
corpus-frequent units: here exactly one copy survives, so unique
content is never touched and duplicated content is kept once.

Reference parity note: vfs-index has no corpus rewrite — this is one
of the beyond-reference LLM-data operators.  The 100-TB shape is two
disk shuffles and zero driver materialization:

- phase 1: explode (line, doc_id, ord) occurrence rows per batch and
  spill hive-partitioned by ``fnv(line) % P`` (hashing is only the
  partition key; equality is decided on the raw line bytes inside a
  part, so collisions cannot merge groups);
- phase 2 (per part): lexsort by (line, doc, ord), boundary-diff the
  group starts (never np.unique on sorted data — measured in-repo),
  and emit the NON-first occurrences as (doc_id, ord) removal rows —
  only the duplicated tail crosses the wire;
- phase 3: co-partition the documents and the removal rows by
  ``hash(doc_id) % P`` (functions/joins.py co_partition_apply — NOT a
  relational join, which would re-ship a document's text once per
  removed line) and rebuild each partition's texts with one
  vectorized split → mask → binary_join kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _removal_rows(ds, *, text_col: str, id_col: str, sep: str,
                  num_parts: int, spill_dir: str | None):
    """Phases 1+2: a Dataset of (doc, ord) rows marking every line
    occurrence that is NOT the corpus-first for its line value.
    Returns None when the corpus has no duplicate lines.

    A hash-prefilter pass runs first (the spans-family pattern,
    functions/spans.py): per-line FNV counts as 16-byte rows through
    the disk spill yield the small sorted candidate-hash set, and only
    candidate lines' occurrence rows — duplicates plus rare collisions
    — enter the string shuffle.  Equality stays on the raw line bytes
    (a collision only adds a singleton group, which emits nothing)."""
    import ray
    import ray.data

    from ..hashing import fnv1a64_tokens
    from ..spillfs import open_spill
    from .spans import _in_sorted

    def split_lines(batch: pa.Table):
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")  # null text = one empty line
        lines = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        return lines, flat, parent

    from .boilerplate import _group_counts

    def hash_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = split_lines(batch)
        h = fnv1a64_tokens(flat)
        t = pa.table({"h": pa.array(h.view(np.int64), pa.int64())})
        cnt = _group_counts(t, ["h"], [("h", "count")])
        hh = cnt["h"]
        if isinstance(hh, pa.ChunkedArray):
            hh = hh.combine_chunks()
        part = (hh.to_numpy(zero_copy_only=False).view(np.uint64)
                % np.uint64(num_parts)).astype(np.int32)
        return pa.table({"h": hh,
                         "n": cnt["h_count"].cast(pa.int64()),
                         "part": pa.array(part, pa.int32())})

    hsp = open_spill(spill_dir, prefix="linededup_h_")
    try:
        hsp.write_parquet(
            ds.map_batches(hash_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            partition_cols=["part"])
        hdirs = list(hsp.list_parts("part").values())
        hfs = hsp.fs

        @ray.remote(num_cpus=1)
        def hash_part(pdir: str) -> np.ndarray:
            import pyarrow.parquet as pq
            t = pq.read_table(pdir, columns=["h", "n"],
                              filesystem=hfs, use_threads=False)
            g = _group_counts(t, ["h"], [("n", "sum")])
            g = g.filter(pc.greater_equal(g["n_sum"], pa.scalar(2)))
            hh = g["h"]
            if isinstance(hh, pa.ChunkedArray):
                hh = hh.combine_chunks()
            return hh.to_numpy(zero_copy_only=False).view(np.uint64)

        parts = ray.get([hash_part.remote(d) for d in hdirs]) \
            if hdirs else []
        cand = np.concatenate([p for p in parts if len(p)] or
                              [np.empty(0, np.uint64)])
        cand.sort()
    finally:
        hsp.cleanup()
    if not len(cand):
        return None
    cand_ref = ray.put(cand)

    def explode(batch: pa.Table) -> pa.Table:
        csort = ray.get(cand_ref)
        lines, flat, parent = split_lines(batch)
        offs = np.zeros(batch.num_rows + 1, np.int64)
        np.cumsum(pc.list_value_length(lines).to_numpy(
            zero_copy_only=False), out=offs[1:])
        ords = np.arange(len(flat), dtype=np.int64) - offs[parent]
        m = _in_sorted(fnv1a64_tokens(flat), csort)
        flat = flat.filter(pa.array(m))
        docs = batch[id_col].take(pa.array(parent[m]))  # keeps id type
        part = (fnv1a64_tokens(flat) % np.uint64(num_parts)
                ).astype(np.int32)
        return pa.table({
            "line": flat,
            "doc": docs,
            "ord": pa.array(ords[m], pa.int64()),
            "part": pa.array(part, pa.int32()),
        })

    sp = open_spill(spill_dir, prefix="linededup_")
    try:
        sp.write_parquet(
            ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True),
            partition_cols=["part"])
        part_dirs = list(sp.list_parts("part").values())
        if not part_dirs:
            return None

        fs = sp.fs

        @ray.remote(num_cpus=1)
        def one_part(pdir: str) -> pa.Table:
            import pyarrow.parquet as pq
            t = pq.read_table(pdir, columns=["line", "doc", "ord"],
                              filesystem=fs, use_threads=False)
            idx = pc.sort_indices(t, sort_keys=[
                ("line", "ascending"), ("doc", "ascending"),
                ("ord", "ascending")])
            t = t.take(idx)
            line = t["line"]
            if isinstance(line, pa.ChunkedArray):
                line = line.combine_chunks()
            n = len(line)
            if n == 0:
                return t.select(["doc", "ord"])  # keeps the id type
            # boundary diff on the sorted line column: True where a new
            # group starts; everything else is a duplicate occurrence
            neq = pc.not_equal(line.slice(1), line.slice(0, n - 1))
            dup = np.empty(n, bool)
            dup[0] = False
            np.logical_not(neq.to_numpy(zero_copy_only=False),
                           out=dup[1:])
            keep = pa.array(dup)
            return pa.table({"doc": t["doc"].filter(keep),
                             "ord": t["ord"].filter(keep)})

        refs = [one_part.remote(d) for d in part_dirs]
        ray.wait(refs, num_returns=len(refs))

        # only the row COUNT comes to the driver; the removal tables
        # stay in the object store
        @ray.remote(num_cpus=0)
        def nrows(t: pa.Table) -> int:
            return t.num_rows

        if sum(ray.get([nrows.remote(r) for r in refs])) == 0:
            return None
        return ray.data.from_arrow_refs(refs)
    finally:
        sp.cleanup()


def _rebuild_kernel(docs: pa.Table, rem: pa.Table, *, text_col: str,
                    id_col: str, sep: str) -> pa.Table:
    """One partition's rebuild: drop removed (doc, ord) lines and
    re-join the survivors — fully vectorized."""
    # Arrow sort + index_in keep the id column type-agnostic (int doc
    # ids or url strings)
    docs = docs.take(pc.sort_indices(docs,
                                     sort_keys=[(id_col, "ascending")]))
    ids = docs[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    texts = docs[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")  # null text = one empty line
    lines = pc.split_pattern(texts, pattern=sep)
    flat = pc.list_flatten(lines)
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    offs = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    removed = np.zeros(len(flat), bool)
    n_removed = np.zeros(len(ids), np.int64)
    if rem.num_rows:
        rord = rem["ord"].to_numpy(zero_copy_only=False)
        # co-partitioning guarantees every removal's doc is here; the
        # ord is in range because both phases split identically
        row = pc.index_in(rem["doc"], value_set=ids).to_numpy(
            zero_copy_only=False).astype(np.int64)
        removed[offs[row] + rord] = True
        np.add.at(n_removed, row, 1)
    kept = flat.filter(pa.array(~removed))
    kept_per_doc = counts - n_removed
    koffs = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(kept_per_doc, out=koffs[1:])
    lst = pa.LargeListArray.from_arrays(pa.array(koffs, pa.int64()),
                                        kept)
    text = pc.binary_join(lst, sep)
    if text.type != pa.string():
        text = text.cast(pa.string())
    return pa.table({
        id_col: docs[id_col],
        "text": text,
        "n_removed": pa.array(n_removed, pa.int64()),
    })


def line_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
               sep: str = "\n", num_parts: int | None = None,
               spill_dir: str | None = None):
    """Corpus-wide keep-first exact line dedup.  Returns a Dataset of
    ``(id_col, text, n_removed)`` covering every input document (docs
    with no duplicated lines pass through with n_removed=0)."""
    import ray

    if num_parts is None:
        num_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    removals = _removal_rows(ds, text_col=text_col, id_col=id_col,
                             sep=sep, num_parts=num_parts,
                             spill_dir=spill_dir)
    if removals is None:
        # no duplicate lines anywhere: identity rebuild, still
        # emitting the (id, text, n_removed) schema
        def ident(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch[id_col],
                "text": pc.fill_null(batch[text_col],
                                     "").cast(pa.string()),
                "n_removed": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()),
            })
        return ds.map_batches(ident, batch_format="pyarrow",
                              zero_copy_batch=True)

    from .joins import co_partition_apply

    def kernel(docs: pa.Table, rem: pa.Table) -> pa.Table:
        return _rebuild_kernel(docs, rem, text_col=text_col,
                               id_col=id_col, sep=sep)

    return co_partition_apply(ds, removals, left_on=id_col,
                              right_on="doc", kernel=kernel,
                              num_parts=num_parts)
