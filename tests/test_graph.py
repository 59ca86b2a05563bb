"""functions/graph.py: transition edges + integer-exact PageRank."""

import numpy as np
import pyarrow as pa
import pytest

from vfs_index_ray.functions.graph import (_transition_kernel, pagerank,
                                           transition_edges)


def _serial_pagerank(edges, nodes, iterations=3, scale=10 ** 12):
    """Straight-line reference: same integer floor arithmetic."""
    n = len(nodes)
    pos = {v: i for i, v in enumerate(nodes)}
    outdeg = np.zeros(n, np.int64)
    for s, _ in edges:
        outdeg[pos[s]] += 1
    ranks = np.full(n, scale // n, np.int64)
    base = (15 * scale // 100) // n
    for _ in range(iterations):
        incoming = np.zeros(n, np.int64)
        for s, d in edges:
            incoming[pos[d]] += ranks[pos[s]] // outdeg[pos[s]]
        ranks = base + (85 * incoming) // 100
    return ranks


def test_transition_kernel_streams_and_self_loops():
    t = pa.table({
        "event_type": ["a", "a", "a", "b", "b", "a"],
        "ts": pa.array([1, 2, 3, 1, 2, 4], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([10, 10, 20, 30, 40, 50], pa.int64())})
    e = _transition_kernel(t, "event_type", "ts", "event_id",
                           "user_id")
    pairs = sorted(zip(e["src"].to_pylist(), e["dst"].to_pylist()))
    # a-stream: 10->10 dropped (self), 10->20, 20->50; b: 30->40
    assert pairs == [(10, 20), (20, 50), (30, 40)]


def test_pagerank_matches_serial_reference(ray_session):
    import ray
    import ray.data

    rng = np.random.default_rng(7)
    nodes = list(range(40))            # 35..39 isolated
    edges = [(int(rng.integers(0, 35)), int(rng.integers(0, 35)))
             for _ in range(300)]
    edges = [(s, d) for s, d in edges if s != d]
    et = pa.table({"src": pa.array([s for s, _ in edges], pa.int64()),
                   "dst": pa.array([d for _, d in edges], pa.int64())})
    ds = ray.data.from_arrow(et).repartition(5)
    got = pagerank(ds, pa.array(nodes, pa.int64()), iterations=3)
    want = _serial_pagerank(edges, nodes)
    order = np.argsort(got["node"].to_numpy())
    assert (got["rank"].to_numpy()[order] == want).all()
    # isolated nodes keep base rank (no incoming mass)
    base = (15 * 10 ** 12 // 100) // len(nodes)
    got_ranks = got["rank"].to_numpy()[order]
    assert (got_ranks[35:] == base).all()


def test_pagerank_empty_nodes(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64())}))
    out = pagerank(ds, pa.array([], pa.int64()))
    assert out.num_rows == 0


def test_transition_edges_distributed_matches_kernel(ray_session):
    import ray
    import ray.data

    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table({
        "event_type": pa.array(
            [f"t{int(x)}" for x in rng.integers(0, 4, n)]),
        "ts": pa.array(rng.permutation(n).astype("int64"),
                       pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 50, n).astype("int64"),
                            pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    got = pa.concat_tables(
        [b for b in ray.get(transition_edges(ds).to_arrow_refs())
         if b.num_rows])
    want = _transition_kernel(t, "event_type", "ts", "event_id",
                              "user_id")
    key = lambda tt: sorted(zip(tt["src"].to_pylist(),
                                tt["dst"].to_pylist()))
    assert key(got) == key(want)


def test_bfs_hops_chain_and_unreachable(ray_session):
    import ray.data

    from vfs_index_ray.functions.graph import bfs_hops

    # chain 0->1->2->3->4->5, island 10->11, seed {0, 10}
    et = pa.table({
        "src": pa.array([0, 1, 2, 3, 4, 10], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 5, 11], pa.int64())})
    ds = ray.data.from_arrow(et).repartition(3)
    out = bfs_hops(ds, pa.array([0, 10], pa.int64()), max_hops=3)
    got = dict(zip(out["node"].to_pylist(), out["hops"].to_pylist()))
    assert got == {0: 0, 10: 0, 1: 1, 11: 1, 2: 2, 3: 3}
    # nodes 4, 5 are beyond max_hops; absent from the result


def test_bfs_hops_cycle_min_hop(ray_session):
    import ray.data

    from vfs_index_ray.functions.graph import bfs_hops

    # cycle 1->2->3->1 plus shortcut 1->3: node 3 must get hop 1
    et = pa.table({
        "src": pa.array([1, 2, 3, 1], pa.int64()),
        "dst": pa.array([2, 3, 1, 3], pa.int64())})
    ds = ray.data.from_arrow(et)
    out = bfs_hops(ds, pa.array([1], pa.int64()), max_hops=5)
    got = dict(zip(out["node"].to_pylist(), out["hops"].to_pylist()))
    assert got == {1: 0, 2: 1, 3: 1}
