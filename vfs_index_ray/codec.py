"""Posting-list codec: delta + varint compression, skip blocks, block metadata.

Replaces the reference's per-(key,record) FlatBuffers write-files and merged
``KeyRecordList`` (reference: spec/index.fbs:22-60, column.go:418-604) with a
columnar encoding: one segment row per (term_id, chunk) holding
delta+varint-compressed doc_ids, varint tfs and dls, skip entries every
``BLOCK`` postings, and per-block (tf_max, dl_min) bounds from which a valid
BM25 upper bound can be derived at query time without knowing avgdl/N at
build time.

All encode/decode paths are vectorized numpy — no per-posting Python loops.
Blocks are self-contained (the first doc_id of each block is encoded
absolute, not as a delta), so a block can be decoded without its
predecessors — the analog of the reference's 512B/4096B lazy FlatBuffers
paging (index_file.go:664-749).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per skip block
IMPACT_CAP = 64    # frontier bins: exact per-tf below, one overflow above
# chunks smaller than this carry no impact frontier (they decode in
# microseconds; the dense scatter buffer would cost 65x their postings).
# Env-tunable for sweeps; 2**62 disables frontiers entirely.
IMPACT_MIN_N = int(__import__("os").environ.get("VFSRAY_IMPACT_MIN_N",
                                                "128"))

_U64 = np.uint64
_FNV = None  # placeholder to keep lint quiet; hashing lives in hashing.py


# ---------------------------------------------------------------------------
# varint (LEB128) — vectorized encode/decode for uint64 arrays
# ---------------------------------------------------------------------------

# LEB128 size thresholds: value >= 2^(7k) needs k+1 bytes. One
# searchsorted pass replaces a shift-loop of up to 10 full-array passes
# (measured 5x on a 5M mixed-magnitude array — the encode stage is
# memory-bandwidth-bound, so passes are the cost).
_VARINT_THRESH = np.array([1 << (7 * k) for k in range(1, 10)],
                          dtype=np.uint64)


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated LEB128 varints (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbytes = np.searchsorted(_VARINT_THRESH, v, side="right") + 1
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    # byte 0 exists for every value — write it without a mask pass
    multi = nbytes > 1
    chunk = (v & _U64(0x7F)).astype(np.uint8)
    chunk[multi] |= np.uint8(0x80)
    out[starts] = chunk
    # higher bytes touch only the shrinking subset of wide values
    rest = np.flatnonzero(multi)
    i = 1
    while len(rest):
        nb = nbytes[rest]
        st = starts[rest]
        vr = v[rest]
        chunk = ((vr >> _U64(7 * i)) & _U64(0x7F)).astype(np.uint8)
        cont = (nb - 1) > i
        chunk[cont] |= np.uint8(0x80)
        out[st + i] = chunk
        rest = rest[cont]
        i += 1
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode concatenated LEB128 varints into a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    n = int(is_end.sum())
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    # uniform-width fast path (e.g. a dl stream where every doc length
    # is 2 bytes): strided column reads, no index arrays at all
    if 0 < n < len(b) and len(b) % n == 0:
        w = len(b) // n
        if w <= 10:
            ie = is_end.reshape(n, w)
            if ie[:, -1].all() and not ie[:, :-1].any():
                bb = b.reshape(n, w)
                out = (bb[:, 0] & 0x7F).astype(np.uint64)
                for i in range(1, w):
                    out |= ((bb[:, i] & 0x7F).astype(np.uint64)
                            << _U64(7 * i))
                return out
    starts = np.empty(len(b), dtype=bool)
    starts[0] = True
    starts[1:] = is_end[:-1]
    start_pos = np.flatnonzero(starts)
    if len(start_pos) * 5 < len(b):
        # very-wide-value streams only (avg > 5 bytes/value — rare:
        # posting deltas/tfs are mostly 1 byte, dls 1-3): per-position
        # full passes beat subset gathers there (measured crossover
        # between 4- and 8-byte uniform widths)
        validx = np.zeros(len(b), dtype=np.int64)
        np.cumsum(is_end[:-1], out=validx[1:])
        idx = np.arange(len(b), dtype=np.int64)
        start_idx = np.maximum.accumulate(np.where(starts, idx, 0))
        pos = idx - start_idx
        out = np.zeros(n, dtype=np.uint64)
        for p in range(int(pos.max()) + 1):
            sel = pos == p
            out[validx[sel]] |= ((b[sel] & 0x7F).astype(np.uint64)
                                 << _U64(7 * p))
        return out
    # byte 0 of every value (values are mostly 1 byte — one gather)
    out = (b[start_pos] & 0x7F).astype(np.uint64)
    rest = np.flatnonzero(~starts)
    if len(rest):
        # continuation bytes only, then shrink the working set as
        # positions are consumed (no `pos == p` passes over 1-byte
        # values). Value index per byte: bsearch on start positions when
        # the set is small (skips the full-array cumsum), cumsum gather
        # when it is not (bsearch is n log n in the set size)
        if len(rest) * 4 < n:
            vrest = np.searchsorted(start_pos, rest, side="right") - 1
        else:
            validx = np.zeros(len(b), dtype=np.int64)
            np.cumsum(is_end[:-1], out=validx[1:])
            vrest = validx[rest]
        pos_rest = rest - start_pos[vrest]
        p = 1
        while len(rest):
            take = pos_rest == p
            cur = rest[take]
            out[vrest[take]] |= ((b[cur] & 0x7F).astype(np.uint64)
                                 << _U64(7 * p))
            keep = ~take
            rest = rest[keep]
            vrest = vrest[keep]
            pos_rest = pos_rest[keep]
            p += 1
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    return out


def varint_count(buf: bytes) -> int:
    b = np.frombuffer(buf, dtype=np.uint8)
    return int(((b & 0x80) == 0).sum())


# ---------------------------------------------------------------------------
# posting-list chunk encode/decode
# ---------------------------------------------------------------------------

def _varint_sizes(v: np.ndarray) -> np.ndarray:
    return np.searchsorted(_VARINT_THRESH, v, side="right") + 1


def encode_chunk(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                 block_size: int = BLOCK) -> dict:
    """Encode one term's (chunk of a) posting list.

    ``doc_ids`` must be strictly ascending uint64; ``tfs``/``dls`` aligned.
    Returns a dict of binary buffers + skip/bound lists, matching the
    segment-row schema in build.py. ``block_size`` tunes skip-block
    granularity (smaller → tighter block-max bounds, more skip entries);
    it is stored per chunk (``bsz``) so decode never guesses.
    """
    B = int(block_size)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    n = len(doc_ids)
    if n == 0:
        return dict(n=0, bsz=B, docs=b"", tfs=b"", dls=b"",
                    skip_doc_last=[], skip_off_doc=[], skip_off_tf=[],
                    skip_off_dl=[], block_tf_max=[], block_dl_min=[])
    if n > 1 and not (doc_ids[1:] > doc_ids[:-1]).all():
        raise ValueError("doc_ids must be strictly ascending")

    # delta encode with per-block restart (block starts are absolute)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    block_starts = np.arange(0, n, B, dtype=np.int64)
    deltas[block_starts] = doc_ids[block_starts]  # absolute restart per block

    doc_sizes = _varint_sizes(deltas)
    tf_sizes = _varint_sizes(tfs)
    dl_sizes = _varint_sizes(dls)
    doc_ends = np.cumsum(doc_sizes)
    tf_ends = np.cumsum(tf_sizes)
    dl_ends = np.cumsum(dl_sizes)

    docs_b = varint_encode(deltas)
    tfs_b = varint_encode(tfs)
    dls_b = varint_encode(dls)

    nblocks = len(block_starts)
    block_ends = np.minimum(block_starts + B, n)
    # byte offset where each block starts in each buffer
    off_doc = np.zeros(nblocks, dtype=np.int64)
    off_doc[1:] = doc_ends[block_starts[1:] - 1]
    off_tf = np.zeros(nblocks, dtype=np.int64)
    off_tf[1:] = tf_ends[block_starts[1:] - 1]
    off_dl = np.zeros(nblocks, dtype=np.int64)
    off_dl[1:] = dl_ends[block_starts[1:] - 1]

    tf_max = np.maximum.reduceat(tfs, block_starts)
    dl_min = np.minimum.reduceat(dls, block_starts)
    doc_last = doc_ids[block_ends - 1]

    return dict(
        n=int(n), bsz=B, docs=docs_b, tfs=tfs_b, dls=dls_b,
        skip_doc_last=doc_last.tolist(),
        skip_off_doc=off_doc.tolist(), skip_off_tf=off_tf.tolist(),
        skip_off_dl=off_dl.tolist(),
        block_tf_max=tf_max.tolist(), block_dl_min=dl_min.tolist(),
    )


def decode_chunk(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a chunk back into (doc_ids, tfs, dls) uint64 arrays."""
    n = int(row["n"])
    B = int(row.get("bsz") or BLOCK)
    tfs = varint_decode(row["tfs"], count=n)
    dls = varint_decode(row["dls"], count=n)
    if row.get("denc", 0):
        doc_ids = np.frombuffer(row["docs"], "<u8").copy()
        if len(doc_ids) != n:
            raise ValueError(f"fixed64 docs: expected {n}")
        return doc_ids, tfs, dls
    deltas = varint_decode(row["docs"], count=n)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    # undo cumsum across block-restart boundaries: blocks are independent
    if n > B:
        block_starts = np.arange(B, n, B, dtype=np.int64)
        # at each restart the stored value is absolute; cumsum added the
        # previous prefix — subtract it per block (vectorized via repeat)
        prefix = doc_ids[block_starts - 1].copy()
        reps = np.diff(np.append(block_starts, n))
        doc_ids[B:] -= np.repeat(prefix, reps)
    return doc_ids, tfs, dls


def encode_partition(terms: np.ndarray, docs: np.ndarray, tfs: np.ndarray,
                     dls: np.ndarray, bucket_shift: int = 64,
                     doc_encoding: str = "auto",
                     block_size: int = BLOCK):
    """Encode ALL posting lists of one shuffle partition in one vectorized pass.

    Inputs are the partition's postings sorted by (term_id, doc_id), doc_ids
    strictly ascending within each term. Output: one segment row per
    (term_id, doc_bucket) chunk, where ``doc_bucket = doc_id >> bucket_shift``
    — the skew/salting mechanism (SURVEY §4): a head term's postings split
    into doc-range-disjoint chunks that concatenate back in bucket order,
    and a distributed scorer can process bucket b of every term
    independently. ``bucket_shift=64`` ⇒ one chunk per term.

    Returns a ``pyarrow.Table`` with columns
    term_id, bucket, df, n, tf_sum, docs, tfs, dls (large_binary),
    skip_doc_last, skip_off_doc, skip_off_tf, skip_off_dl,
    block_tf_max, block_dl_min (lists).

    No per-term Python: varint encoding runs once over the concatenated
    delta stream and per-chunk binary columns are built zero-copy from byte
    offsets into that single buffer.
    """
    import pyarrow as pa

    terms = np.ascontiguousarray(terms, dtype=np.uint64)
    docs = np.ascontiguousarray(docs, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    B = int(block_size)
    n = len(terms)
    if n == 0:
        return _empty_segment_table()
    shift = _U64(min(bucket_shift, 63)) if bucket_shift < 64 else None
    buckets = (docs >> shift) if shift is not None else np.zeros(n, np.uint64)

    new_term = np.empty(n, dtype=bool)
    new_term[0] = True
    new_term[1:] = terms[1:] != terms[:-1]
    new_chunk = new_term.copy()
    new_chunk[1:] |= buckets[1:] != buckets[:-1]
    chunk_starts = np.flatnonzero(new_chunk)
    nchunks = len(chunk_starts)
    chunk_counts = np.diff(np.append(chunk_starts, n))

    # df per term, repeated onto its chunks
    term_starts = np.flatnonzero(new_term)
    term_counts = np.diff(np.append(term_starts, n))
    term_of_chunk = np.cumsum(new_term)[chunk_starts] - 1
    df_chunk = term_counts[term_of_chunk]

    # block starts: every B-th posting within a chunk
    local = np.arange(n, dtype=np.int64) - np.repeat(chunk_starts, chunk_counts)
    block_start_mask = (local % B) == 0
    block_starts = np.flatnonzero(block_start_mask)

    # deltas, absolute at block starts (blocks self-contained)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docs[0]
    deltas[1:] = docs[1:] - docs[:-1]
    deltas[block_starts] = docs[block_starts]

    doc_sizes = _varint_sizes(deltas)
    # doc-stream encoding: hash doc-ids make deltas ~as wide as raw
    # values; fixed64 (denc=1) decodes with one frombuffer (zero
    # passes) while wide varints take the slow dense decode path.
    # Decode-speed-aware threshold: varint only pays below ~4.5
    # bytes/value average — the shrinking-subset decoder is fast
    # through 4-byte widths (measured, BASELINE.md), and above that
    # varint's <45% size saving costs ~1000x on every head-term decode
    # (2.2 s vs ~5 ms for a 1.47M-posting hash-id list).
    if doc_encoding == "fixed":
        denc = 1
    elif doc_encoding == "varint":
        denc = 0
    else:  # auto
        denc = 1 if int(doc_sizes.sum()) > int(4.5 * n) else 0
    if denc:
        doc_sizes = np.full(n, 8, dtype=np.int64)
    tf_sizes = _varint_sizes(tfs)
    dl_sizes = _varint_sizes(dls)
    doc_ends = np.cumsum(doc_sizes)
    tf_ends = np.cumsum(tf_sizes)
    dl_ends = np.cumsum(dl_sizes)

    def _byte_start(ends: np.ndarray, idx: np.ndarray) -> np.ndarray:
        out = np.zeros(len(idx), dtype=np.int64)
        nz = idx > 0
        out[nz] = ends[idx[nz] - 1]
        return out

    if denc:
        docs_buf = np.frombuffer(
            np.ascontiguousarray(docs).astype("<u8").tobytes(), np.uint8)
    else:
        docs_buf = np.frombuffer(varint_encode(deltas), np.uint8)
    tfs_buf = np.frombuffer(varint_encode(tfs), np.uint8)
    dls_buf = np.frombuffer(varint_encode(dls), np.uint8)

    # per-block metadata
    block_ends = np.append(block_starts[1:], n) - 1  # last posting idx of block
    blk_doc_last = docs[block_ends]
    blk_tf_max = np.maximum.reduceat(tfs, block_starts)
    blk_dl_min = np.minimum.reduceat(dls, block_starts)
    chunk_of_block = np.cumsum(new_chunk)[block_starts] - 1
    blk_off_doc = (_byte_start(doc_ends, block_starts)
                   - _byte_start(doc_ends, chunk_starts)[chunk_of_block])
    blk_off_tf = (_byte_start(tf_ends, block_starts)
                  - _byte_start(tf_ends, chunk_starts)[chunk_of_block])
    blk_off_dl = (_byte_start(dl_ends, block_starts)
                  - _byte_start(dl_ends, chunk_starts)[chunk_of_block])

    tf_sum = np.add.reduceat(tfs, chunk_starts)

    # ---- impact frontier (disk-resident impact ordering) ---------------
    # Per chunk, one entry per distinct capped tf: the min-dl posting for
    # that tf (plus one overflow bin for tf >= IMPACT_CAP holding the
    # chunk's tf_max and the min dl among its members).  Every posting is
    # dominated by its bin's (tf_ub, dl_min), and BM25 is monotone
    # increasing in tf / decreasing in dl, so
    #   max over bins of score(tf_ub, dl_min)
    # is a VALID per-chunk upper bound — and for bins below the cap it is
    # EXACT (the bin pair is a real posting).  The stored doc achieving
    # each bin's min dl is a real high-impact posting, which gives the
    # MaxScore θ bootstrap its champion candidates without decoding any
    # block.  Computed only for chunks with >= IMPACT_MIN_N postings
    # (small chunks decode in microseconds and would blow the dense
    # scatter buffer up to 65x the posting count); two O(n) scatter-min
    # passes, no sort.  Replaces the reference's intended
    # selectivity-ordered traversal (search_cond.go:688-698) with
    # impact-ordered metadata the query never has to derive.
    imp_counts = np.zeros(nchunks, np.int64)
    imp_tf_v = np.empty(0, np.uint64)
    imp_dl_v = np.empty(0, np.uint64)
    imp_doc_v = np.empty(0, np.uint64)
    big = chunk_counts >= IMPACT_MIN_N
    nbig = int(big.sum())
    if nbig:
        nbins = IMPACT_CAP + 1
        fidx = np.cumsum(big) - 1            # compact frontier index
        chunk_of = np.repeat(np.arange(nchunks, dtype=np.int64),
                             chunk_counts)
        pbig = big[chunk_of]
        tfc = np.minimum(tfs[pbig], _U64(IMPACT_CAP)).astype(np.int64)
        key = fidx[chunk_of[pbig]] * nbins + tfc
        SENT = _U64(1) << _U64(63)
        mind = np.full(nbig * nbins, SENT, np.uint64)
        np.minimum.at(mind, key, dls[pbig])
        is_min = dls[pbig] == mind[key]
        mindoc = np.full(nbig * nbins, np.uint64(0xFFFFFFFFFFFFFFFF),
                         np.uint64)
        np.minimum.at(mindoc, key[is_min], docs[pbig][is_min])
        present = mind != SENT
        binpos = np.arange(nbig * nbins, dtype=np.int64) % nbins
        bin_tf = binpos.astype(np.uint64)
        ov = binpos == IMPACT_CAP            # overflow bin: chunk tf_max
        if ov[present].any():
            chunk_tf_max = np.maximum.reduceat(tfs, chunk_starts)
            bin_tf[ov] = chunk_tf_max[big][np.arange(nbig * nbins,
                                                     dtype=np.int64)
                                           [ov] // nbins]
        imp_counts[big] = present.reshape(nbig, nbins).sum(axis=1)
        imp_tf_v = bin_tf[present]
        imp_dl_v = mind[present]
        imp_doc_v = mindoc[present]

    def _binary_col(buf: np.ndarray, ends: np.ndarray) -> pa.Array:
        offs = np.empty(nchunks + 1, dtype=np.int64)
        offs[:-1] = _byte_start(ends, chunk_starts)
        offs[-1] = ends[-1]
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), nchunks,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf.tobytes())])

    blocks_per_chunk = np.bincount(chunk_of_block, minlength=nchunks)
    list_offs = np.zeros(nchunks + 1, dtype=np.int32)
    np.cumsum(blocks_per_chunk, out=list_offs[1:])
    loffs = pa.array(list_offs, pa.int32())

    def _list_col(values: np.ndarray, typ) -> pa.Array:
        return pa.ListArray.from_arrays(loffs, pa.array(values, typ))

    return pa.table({
        "term_id": pa.array(terms[chunk_starts], pa.uint64()),
        "denc": pa.array(np.full(nchunks, denc, np.uint8), pa.uint8()),
        "bsz": pa.array(np.full(nchunks, B, np.uint32), pa.uint32()),
        "bucket": pa.array(buckets[chunk_starts], pa.uint64()),
        "df": pa.array(df_chunk.astype(np.uint64), pa.uint64()),
        "n": pa.array(chunk_counts.astype(np.uint64), pa.uint64()),
        "tf_sum": pa.array(tf_sum.astype(np.uint64), pa.uint64()),
        "docs": _binary_col(docs_buf, doc_ends),
        "tfs": _binary_col(tfs_buf, tf_ends),
        "dls": _binary_col(dls_buf, dl_ends),
        "skip_doc_last": _list_col(blk_doc_last, pa.uint64()),
        "skip_off_doc": _list_col(blk_off_doc.astype(np.uint32), pa.uint32()),
        "skip_off_tf": _list_col(blk_off_tf.astype(np.uint32), pa.uint32()),
        "skip_off_dl": _list_col(blk_off_dl.astype(np.uint32), pa.uint32()),
        "block_tf_max": _list_col(blk_tf_max.astype(np.uint32), pa.uint32()),
        "block_dl_min": _list_col(blk_dl_min.astype(np.uint32), pa.uint32()),
        "imp_tf": _imp_col(imp_counts, imp_tf_v.astype(np.uint32),
                           pa.uint32()),
        "imp_dl": _imp_col(imp_counts, imp_dl_v.astype(np.uint32),
                           pa.uint32()),
        "imp_doc": _imp_col(imp_counts, imp_doc_v, pa.uint64()),
    })


def _imp_col(counts: np.ndarray, values: np.ndarray, typ):
    import pyarrow as pa
    offs = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offs[1:])
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                    pa.array(values, typ))


def chunk_rows_columnar(tbl) -> list[dict]:
    """Segment rows as light dicts whose buffer/list values are numpy
    VIEWS into the Arrow columns — no per-row byte copies or Python
    boxing. ``tbl.to_pylist()`` on a head term's thousands of chunk rows
    was a measured driver-side hotspot (the 1.6M-doc index stores 640k
    chunks); decode_chunk/decode_block accept these views unchanged
    (they slice and np.frombuffer, both fine on uint8 views)."""
    import pyarrow as pa
    n = tbl.num_rows
    if n == 0:
        return []
    cols: dict[str, object] = {}
    for name in tbl.column_names:
        col = tbl[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_large_binary(t) or pa.types.is_binary(t):
            width = 8 if pa.types.is_large_binary(t) else 4
            dt = np.int64 if width == 8 else np.int32
            offs = np.frombuffer(col.buffers()[1], dt, count=len(col) + 1,
                                 offset=col.offset * width)
            data = np.frombuffer(col.buffers()[2] or b"", np.uint8)
            cols[name] = [data[offs[i]:offs[i + 1]] for i in range(n)]
        elif pa.types.is_list(t):
            offs = np.frombuffer(col.buffers()[1], np.int32,
                                 count=len(col) + 1, offset=col.offset * 4)
            vals = col.values.to_numpy(zero_copy_only=False)
            cols[name] = [vals[offs[i]:offs[i + 1]] for i in range(n)]
        else:
            cols[name] = col.to_numpy(zero_copy_only=False)
    names = list(tbl.column_names)
    return [{nm: cols[nm][i] for nm in names} for i in range(n)]


def _empty_segment_table():
    import pyarrow as pa
    # column order/types must exactly mirror encode_partition's non-empty
    # output so empty and non-empty segment tables share one schema
    # (pa.concat_tables over mixed segments raises otherwise)
    return pa.table({
        "term_id": pa.array([], pa.uint64()),
        "denc": pa.array([], pa.uint8()),
        "bsz": pa.array([], pa.uint32()),
        "bucket": pa.array([], pa.uint64()),
        "df": pa.array([], pa.uint64()),
        "n": pa.array([], pa.uint64()),
        "tf_sum": pa.array([], pa.uint64()),
        "docs": pa.array([], pa.large_binary()),
        "tfs": pa.array([], pa.large_binary()),
        "dls": pa.array([], pa.large_binary()),
        "skip_doc_last": pa.array([], pa.list_(pa.uint64())),
        "skip_off_doc": pa.array([], pa.list_(pa.uint32())),
        "skip_off_tf": pa.array([], pa.list_(pa.uint32())),
        "skip_off_dl": pa.array([], pa.list_(pa.uint32())),
        "block_tf_max": pa.array([], pa.list_(pa.uint32())),
        "block_dl_min": pa.array([], pa.list_(pa.uint32())),
        "imp_tf": pa.array([], pa.list_(pa.uint32())),
        "imp_dl": pa.array([], pa.list_(pa.uint32())),
        "imp_doc": pa.array([], pa.list_(pa.uint64())),
    })


# ---------------------------------------------------------------------------
# per-partition term bloom filter (negative-lookup fast path)
# ---------------------------------------------------------------------------

_BLOOM_K = 7  # hash functions; with m = 16 bits/term → fp rate ~0.6%


def _bloom_hashes(terms: np.ndarray, m: int) -> np.ndarray:
    """(k, n) bit indices for each term — splitmix64 finalizer over
    term ^ seed_i, vectorized. ``m`` must be a power of two."""
    t = np.ascontiguousarray(terms, np.uint64)
    out = np.empty((_BLOOM_K, len(t)), np.int64)
    mask = _U64(m - 1)
    with np.errstate(over="ignore"):
        for i in range(_BLOOM_K):
            z = t + _U64(0x9E3779B97F4A7C15) * _U64(i + 1)
            z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
            z = z ^ (z >> _U64(31))
            out[i] = (z & mask).astype(np.int64)
    return out


def bloom_build(terms: np.ndarray, bits_per_term: int = 16,
                assume_sorted: bool = False) -> bytes:
    """Bloom filter over a partition's distinct term_ids, as packed
    bytes. Sized to the next power of two of n·bits_per_term (min 1024
    bits) → ~0.6% false positives at 16 bits/term with k=7.

    ``assume_sorted`` skips the sort inside unique (the encode path's
    terms are already lexsorted; under 32-way concurrency an extra
    full-array sort is bandwidth-amplified on this host)."""
    t = np.ascontiguousarray(terms, np.uint64)
    if assume_sorted:
        if len(t):
            keep = np.empty(len(t), bool)
            keep[0] = True
            keep[1:] = t[1:] != t[:-1]
            t = t[keep]
    else:
        t = np.unique(t)
    m = 1024
    while m < len(t) * bits_per_term:
        m <<= 1
    bits = np.zeros(m, bool)
    if len(t):
        idx = _bloom_hashes(t, m)
        bits[idx.ravel()] = True
    return np.packbits(bits, bitorder="little").tobytes()


def bloom_test(bloom: bytes, terms: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True = possibly present, False =
    definitely absent."""
    t = np.ascontiguousarray(terms, np.uint64)
    if len(t) == 0:
        return np.zeros(0, bool)
    bits = np.unpackbits(np.frombuffer(bloom, np.uint8),
                         bitorder="little")
    idx = _bloom_hashes(t, len(bits))
    return bits[idx].all(axis=0).astype(bool)


def decode_block(row: dict, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only block ``bi`` of a chunk (self-contained; for skip reads)."""
    n = int(row["n"])
    B = int(row.get("bsz") or BLOCK)
    nblocks = (n + B - 1) // B
    if not 0 <= bi < nblocks:
        raise IndexError(bi)
    cnt = min(B, n - bi * B)
    od, ot, ol = (row["skip_off_doc"], row["skip_off_tf"], row["skip_off_dl"])
    d_end = od[bi + 1] if bi + 1 < nblocks else len(row["docs"])
    t_end = ot[bi + 1] if bi + 1 < nblocks else len(row["tfs"])
    l_end = ol[bi + 1] if bi + 1 < nblocks else len(row["dls"])
    tfs = varint_decode(row["tfs"][ot[bi]:t_end], count=cnt)
    dls = varint_decode(row["dls"][ol[bi]:l_end], count=cnt)
    if row.get("denc", 0):
        docs = np.frombuffer(row["docs"][od[bi]:d_end], "<u8").copy()
        return docs, tfs, dls
    deltas = varint_decode(row["docs"][od[bi]:d_end], count=cnt)
    return np.cumsum(deltas, dtype=np.uint64), tfs, dls
