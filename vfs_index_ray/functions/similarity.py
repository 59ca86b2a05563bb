"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor) — the exact baseline;
- embedding cosine near-dup pairs (threshold) on the same kernel;
- LSH-bucketed variant (random hyperplane signs) as the scale path:
  candidate buckets via sign-pattern groupby, exact rescore within.

All scoring is float64 with fixed reduction order so results are
deterministic and reproducible against the DuckDB
``list_cosine_similarity`` oracle (fixed-point compare).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, len(flat) // n) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """Per-batch local top-k per query vs a broadcast query matrix.

    Output: (query_id, vec_id, sim) — at most k rows per query per batch;
    the global reduce (concat + per-query top-k) is tiny."""

    def __init__(self, queries_ref, k: int = 5, vec_col: str = "embedding",
                 id_col: str = "vec_id", exclude_self: bool = True):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.qids, qmat = q
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qmat = qmat / np.maximum(qn, 1e-30)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch, self.vec_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if mat.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-30)
        sims = self.qmat @ mat.T                      # (nq, nbatch)
        q_out, v_out, s_out = [], [], []
        for qi, qid in enumerate(self.qids):
            s = sims[qi]
            mask = ids != qid if self.exclude_self else np.ones(len(ids), bool)
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            kk = min(self.k, len(idx))
            sub = s[idx]
            top = idx[np.lexsort((ids[idx], -sub))[:kk]]
            q_out.append(np.full(kk, qid, np.int64))
            v_out.append(ids[top].astype(np.int64))
            s_out.append(s[top])
        if not q_out:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(q_out), pa.int64()),
            "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
            "sim": pa.array(np.concatenate(s_out), pa.float64()),
        })


def ann_cosine_topk(ds, query_ids: list[int], k: int = 5,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k for the given query vec_ids over the dataset.

    Query vectors are gathered once, broadcast via ``ray.put``; each batch
    computes a local top-k (matmul); the driver merges per-query partials.
    Deterministic ties: sim desc, vec_id asc.
    Returns (query_id, vec_id, rank, sim_x1e4).
    """
    import pyarrow.compute as pc

    qid_arr = pa.array(query_ids, pa.int64())

    def grab(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=qid_arr))

    qrows = ds.map_batches(grab, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: query_ids.index(r[id_col]))
    qmat = np.array([r[vec_col] for r in qrows], np.float64)
    qids = [r[id_col] for r in qrows]
    ref = ray.put((qids, qmat))

    partials = ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs=dict(
            queries_ref=ref, k=k, vec_col=vec_col, id_col=id_col,
            exclude_self=exclude_self),
        batch_format="pyarrow", concurrency=2).take_all()
    if not partials:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "sim_x1e4": pa.array([], pa.int64())})
    qa = np.array([r["query_id"] for r in partials], np.int64)
    va = np.array([r["vec_id"] for r in partials], np.int64)
    sa = np.array([r["sim"] for r in partials], np.float64)
    out_q, out_v, out_r, out_s = [], [], [], []
    for qid in qids:
        m = qa == qid
        order = np.lexsort((va[m], -sa[m]))[:k]
        out_q.extend([qid] * len(order))
        out_v.extend(va[m][order].tolist())
        out_r.extend(range(1, len(order) + 1))
        out_s.extend(np.floor(sa[m][order] * 10000 + 0.5
                              ).astype(np.int64).tolist())
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "sim_x1e4": pa.array(out_s, pa.int64()),
    })


class IVFIndex:
    """IVF (inverted-file) ANN index — the scale path for similarity
    search: k-means centroids partition the vectors; a query probes only
    the ``nprobe`` nearest centroids' buckets (pruned parquet read), then
    scores exactly within them. ``nprobe == num_centroids`` degrades to
    exact brute force. Deterministic: seeded centroid init, fixed Lloyd
    iterations, ties by vec_id.

    Layout: ``dir/centroids.npy`` + ``dir/bucket=NNN.parquet`` (vec_id,
    embedding) — one file per centroid so a probe reads only its buckets.
    """

    def __init__(self, path: str):
        self.path = path
        self.centroids = np.load(os.path.join(path, "centroids.npy"))

    @staticmethod
    def _normalize(mat: np.ndarray) -> np.ndarray:
        return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                                1e-30)

    @classmethod
    def build(cls, ds, path: str, *, num_centroids: int = 16,
              sample: int = 4096, iters: int = 5, seed: int = 11,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> "IVFIndex":
        import pyarrow.parquet as pq
        os.makedirs(path, exist_ok=True)
        # deterministic training sample: lowest vec_ids up to `sample`
        rows = sorted(ds.take_all(), key=lambda r: r[id_col])
        ids = np.array([r[id_col] for r in rows], np.int64)
        mat = cls._normalize(np.array([r[vec_col] for r in rows],
                                      np.float64))
        train = mat[:sample]
        rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
        cent = train[rng.choice(len(train),
                                min(num_centroids, len(train)),
                                replace=False)]
        for _ in range(iters):  # spherical k-means (cosine)
            assign = np.argmax(train @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = train[m].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 1e-12:
                        cent[c] = v / n
        np.save(os.path.join(path, "centroids.npy"), cent)
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            pq.write_table(pa.table({
                id_col: pa.array(ids[m], pa.int64()),
                vec_col: pa.array([list(map(float, v)) for v in mat[m]],
                                  pa.list_(pa.float64())),
            }), os.path.join(path, f"bucket={c:03d}.parquet"))
        return cls(path)

    def search(self, query_vec: np.ndarray, k: int = 5,
               nprobe: int = 4, exclude_id: int | None = None):
        """Returns (vec_ids, sims) — exact cosine within probed buckets,
        ties sim desc then vec_id asc."""
        import pyarrow.parquet as pq
        q = np.asarray(query_vec, np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        csims = self.centroids @ q
        probe = np.argsort(-csims, kind="stable")[:nprobe]
        ids_l, sims_l = [], []
        for c in probe:
            f = os.path.join(self.path, f"bucket={c:03d}.parquet")
            tbl = pq.read_table(f)
            if tbl.num_rows == 0:
                continue
            ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
            flat = tbl["embedding"].combine_chunks().values.to_numpy(
                zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(len(ids), len(q))
            s = mat @ q
            if exclude_id is not None:
                m = ids != exclude_id
                ids, s = ids[m], s[m]
            ids_l.append(ids)
            sims_l.append(s)
        if not ids_l:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(ids_l)
        sims = np.concatenate(sims_l)
        order = np.lexsort((ids, -sims))[:k]
        return ids[order].astype(np.int64), sims[order]


def embedding_near_dups(ds, threshold: float = 0.95,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        num_bands: int = 8, band_bits: int = 4) -> pa.Table:
    """Cosine near-dup pairs (sim ≥ threshold) via banded hyperplane LSH
    + exact within-bucket verification — the embedding analog of
    MinHash-LSH. A pair collides in a band iff all ``band_bits``
    hyperplane signs agree; ``num_bands`` independent bands give recall
    1-(1-p^bits)^bands with p = 1-θ/π. Deterministic (seeded planes).

    Driver-side gather here is the test-scale path; the scale path is the
    same per-band (band, key) groupby as MinHash-LSH banding."""
    rows = ds.take_all()
    ids = np.array([r[id_col] for r in rows], np.int64)
    mat = np.array([r[vec_col] for r in rows], np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    rng = np.random.Generator(np.random.Philox(key=[13, 0]))
    planes = rng.normal(size=(mat.shape[1], num_bands * band_bits))
    signs = (mat @ planes) > 0
    cand: set[tuple[int, int]] = set()
    for bi in range(num_bands):
        seg = signs[:, bi * band_bits:(bi + 1) * band_bits]
        key = np.zeros(len(mat), np.uint32)
        for j in range(band_bits):
            key |= seg[:, j].astype(np.uint32) << j
        order = np.argsort(key, kind="stable")
        k, idx = key[order], order
        if len(k) == 0:
            continue
        new = np.empty(len(k), bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        for s, e in zip(starts, ends):
            if 2 <= e - s <= 512:
                grp = np.sort(idx[s:e])
                ia, ib = np.triu_indices(len(grp), k=1)
                cand.update(zip(grp[ia].tolist(), grp[ib].tolist()))
    out = []
    for a, b in cand:
        s = float(mat[a] @ mat[b])
        if s >= threshold:
            lo, hi = sorted((int(ids[a]), int(ids[b])))
            out.append((lo, hi, int(np.floor(s * 10000 + 0.5))))
    out.sort()
    return pa.table({
        "doc_a": pa.array([r[0] for r in out], pa.int64()),
        "doc_b": pa.array([r[1] for r in out], pa.int64()),
        "sim_x1e4": pa.array([r[2] for r in out], pa.int64()),
    })
