"""Session-scoped Ray + shared fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_file(tmp_path_factory):
    """Deterministic 500-row pages table on disk (FIXTURES F1)."""
    from vfs_index_ray import corpus

    d = tmp_path_factory.mktemp("pages")
    path = str(d / "pages.parquet")
    pq.write_table(corpus.generate_pages(500), path)
    return path


@pytest.fixture(scope="session")
def built_index(ray_session, pages_file, tmp_path_factory):
    """Word-mode index over the pages fixture, built once per session."""
    from vfs_index_ray.build import IndexBuilder

    idx = str(tmp_path_factory.mktemp("idx") / "word")
    b = IndexBuilder(idx, mode="word", num_parts=8, id_col=None,
                     tokenize_concurrency=2)
    stats = b.build([pages_file])
    return idx, stats


@pytest.fixture(scope="session")
def oracle_index(pages_file):
    from vfs_index_ray.hashing import doc_id_from_url
    from vfs_index_ray.oracle import OracleIndex

    pages = pq.read_table(pages_file)
    doc_ids = [doc_id_from_url(u) for u in pages["url"].to_pylist()]
    return OracleIndex.build(pages["text"].to_pylist(), doc_ids)
