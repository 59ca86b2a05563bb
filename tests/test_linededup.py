"""line_dedup (functions/linededup.py): keep-first global exact line
dedup vs a brute-force reference, including same-doc duplicates, docs
losing every line, and partition-count invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _brute(docs: list[tuple[int, str]]) -> dict[int, tuple[str, int]]:
    seen: set[str] = set()
    out: dict[int, tuple[str, int]] = {}
    for doc_id, text in sorted(docs):
        kept, removed = [], 0
        for line in text.split("\n"):
            if line in seen:
                removed += 1
            else:
                seen.add(line)
                kept.append(line)
        out[doc_id] = ("\n".join(kept), removed)
    return out


def _docs():
    return [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),            # beta removed (doc 1 first)
        (3, "alpha\nbeta\ngamma"),     # everything removed
        (4, "epsilon\nepsilon\nzeta"),  # same-doc duplicate
        (5, "unique only line"),
        (6, ""),                        # splits to one empty line
        (7, "eta\n\ntheta"),            # its "" removed (doc 6 first)
    ]


@pytest.mark.parametrize("num_parts", [1, 4])
def test_line_dedup_matches_brute_force(ray_session, num_parts):
    import ray
    import ray.data

    from vfs_index_ray.functions.linededup import line_dedup

    docs = _docs()
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }))
    out = line_dedup(ds, num_parts=num_parts)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    got = {i: (s, r) for i, s, r in zip(t["doc_id"].to_pylist(),
                                        t["text"].to_pylist(),
                                        t["n_removed"].to_pylist())}
    assert got == _brute(docs)


def test_line_dedup_no_duplicates_identity(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.linededup import line_dedup

    docs = [(i, f"line a {i}\nline b {i}") for i in range(20)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }))
    t = pa.concat_tables(
        ray.get(line_dedup(ds).to_arrow_refs())).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    assert t["text"].to_pylist() == [t2 for _, t2 in docs]
    assert pc.sum(t["n_removed"]).as_py() == 0


def test_line_dedup_scale_random(ray_session):
    """600 docs with planted cross-doc duplicate lines, brute-force
    cross-check."""
    import ray
    import ray.data

    from vfs_index_ray.functions.linededup import line_dedup

    g = np.random.Generator(np.random.Philox(key=[99, 0]))
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(600):
        lines = [" ".join(g.choice(vocab, 3)) for _ in range(4)]
        docs.append((i, "\n".join(lines)))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    }))
    out = line_dedup(ds, num_parts=6)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    got = {i: (s, r) for i, s, r in zip(t["doc_id"].to_pylist(),
                                        t["text"].to_pylist(),
                                        t["n_removed"].to_pylist())}
    assert got == _brute(docs)
    assert sum(r for _, r in got.values()) > 0  # dups actually planted


def test_line_dedup_string_ids(ray_session):
    import ray
    import ray.data

    from vfs_index_ray.functions.linededup import line_dedup

    docs = [("u/1", "shared line\nown line 1"),
            ("u/2", "shared line\nown line 2")]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([u for u, _ in docs]),
        "text": pa.array([t for _, t in docs]),
    }))
    out = line_dedup(ds, id_col="url", num_parts=2)
    t = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    got = {u: (s, r) for u, s, r in zip(t["url"].to_pylist(),
                                        t["text"].to_pylist(),
                                        t["n_removed"].to_pylist())}
    assert got == {"u/1": ("shared line\nown line 1", 0),
                   "u/2": ("own line 2", 1)}


def test_line_dedup_null_text(ray_session):
    """Null text counts as one empty line (same convention as the
    spans family): the corpus-first empty line survives, later ones
    are removed."""
    import ray
    import ray.data

    from vfs_index_ray.functions.linededup import line_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", None, "real line"]),
    })
    out = line_dedup(ray.data.from_arrow(t), num_parts=2)
    got = pa.concat_tables(ray.get(out.to_arrow_refs())).combine_chunks()
    m = {i: (s, r) for i, s, r in zip(got["doc_id"].to_pylist(),
                                      got["text"].to_pylist(),
                                      got["n_removed"].to_pylist())}
    assert m == {1: ("", 0), 2: ("", 1), 3: ("real line", 0)}
