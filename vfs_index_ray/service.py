"""Long-lived distributed query service (reference daemon parity: the
vfs-index searcher runs as a no-process library, but its cache story —
cache/cache.go per-process posting caches — maps here onto a pool of
resident query actors that keep their decoded-postings caches warm
across calls).

``QueryService`` holds N replica actors, each owning a full
``SearchEngine`` (segment reads are part-pruned pushdowns, so replicas
share nothing). Queries route to replicas by a deterministic hash of the
query string: the same query always lands on the same actor, so its
postings/contribution caches hit (query→cache affinity). Batches are
grouped per replica — one RPC per replica per call, results reassembled
in input order.

Scale shape: replicas are stateless-restartable (the index is on shared
storage); routing is client-side and O(1); adding replicas is linear QPS
until storage bandwidth saturates. Replicas are placed with Ray's
``SPREAD`` scheduling strategy by default, so on a multi-node cluster
they land on distinct nodes (verified by a simulated two-node cluster
test); pass ``scheduling_strategy=None`` to let Ray pack instead.
"""

from __future__ import annotations

import numpy as np

import ray

from .hashing import fnv1a64


@ray.remote
class QueryWorker:
    """One resident engine replica (caches live as long as the actor)."""

    def __init__(self, index_dir: str, corpus_files=None,
                 id_col: str = "doc_id"):
        from .search import SearchEngine
        self.engine = SearchEngine(index_dir, corpus_files=corpus_files,
                                   id_col=id_col, io_threads=False)
        self.n_calls = 0

    def bm25_batch(self, queries: list[str], k: int = 10,
                   method: str = "auto"):
        self.n_calls += 1
        out = []
        for q in queries:
            docs, scores = self.engine.bm25(q, k, method)
            out.append((docs.tolist(), scores.tolist()))
        return out

    def match(self, q: str) -> list[int]:
        self.n_calls += 1
        return self.engine.match(q).tolist()

    def df(self, q: str) -> dict[str, int]:
        self.n_calls += 1
        return self.engine.df(q)

    def calls(self) -> int:
        return self.n_calls

    def node_id(self) -> str:
        """Placement introspection (which node hosts this replica)."""
        return ray.get_runtime_context().get_node_id()


class QueryService:
    """Client facade over a pool of resident QueryWorker actors."""

    def __init__(self, index_dir: str, *, replicas: int = 4,
                 corpus_files=None, id_col: str = "doc_id",
                 num_cpus: float = 1,
                 scheduling_strategy: str | None = "SPREAD"):
        # max_restarts: a crashed replica restarts and rebuilds its
        # caches from the index on shared storage (workers hold no
        # unrecoverable state); in-flight calls on the dead actor fail
        # fast and the client may retry.
        # SPREAD: replicas distribute across nodes (soft constraint — a
        # single node still hosts all of them happily in local mode)
        opts = dict(num_cpus=num_cpus, max_restarts=2)
        if scheduling_strategy is not None:
            opts["scheduling_strategy"] = scheduling_strategy
        self.workers = [
            QueryWorker.options(**opts).remote(
                index_dir, corpus_files=corpus_files, id_col=id_col)
            for _ in range(replicas)]
        # fail fast if the index is unreadable (actor init raises lazily)
        ray.get([w.calls.remote() for w in self.workers])

    def _route(self, q: str) -> int:
        # deterministic (unlike builtin hash): same query → same replica
        # → warm postings/contribution caches
        return fnv1a64(q) % len(self.workers)

    def bm25(self, q: str, k: int = 10, method: str = "auto"):
        [(docs, scores)] = ray.get(
            self.workers[self._route(q)].bm25_batch.remote([q], k, method))
        return np.array(docs, np.uint64), np.array(scores, np.float64)

    def bm25_batch(self, queries: list[str], k: int = 10,
                   method: str = "auto"):
        """Route, batch per replica (one RPC each), reassemble in input
        order. Returns [(doc_ids, scores), ...] aligned with queries."""
        by_worker: dict[int, list[int]] = {}
        for i, q in enumerate(queries):
            by_worker.setdefault(self._route(q), []).append(i)
        futs = {w: self.workers[w].bm25_batch.remote(
            [queries[i] for i in idxs], k, method)
            for w, idxs in by_worker.items()}
        out: list = [None] * len(queries)
        for w, idxs in by_worker.items():
            for i, (docs, scores) in zip(idxs, ray.get(futs[w])):
                out[i] = (np.array(docs, np.uint64),
                          np.array(scores, np.float64))
        return out

    def match(self, q: str) -> np.ndarray:
        return np.array(
            ray.get(self.workers[self._route(q)].match.remote(q)),
            np.uint64)

    def calls_per_worker(self) -> list[int]:
        return ray.get([w.calls.remote() for w in self.workers])

    def worker_nodes(self) -> list[str]:
        """Node id per replica (asserts SPREAD placement in tests)."""
        return ray.get([w.node_id.remote() for w in self.workers])

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)
        self.workers = []
