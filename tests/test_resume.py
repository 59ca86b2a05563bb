"""Checkpoint/resume tests (FIXTURES.md items 8 + reference idempotence
record.go:46-82: interrupted builds continue, results identical)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from vfs_index_ray import corpus


@pytest.fixture(scope="module")
def two_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_corpora")
    pages = corpus.generate_pages(400)
    a = str(d / "a.parquet")
    b = str(d / "b.parquet")
    pq.write_table(pages.slice(0, 200), a)
    pq.write_table(pages.slice(200, 200), b)
    return [a, b]


def _bm25_fingerprint(idx, queries=(corpus.RARE_TERM, corpus.PHRASE,
                                    "bababa babade")):
    from vfs_index_ray.search import SearchEngine
    eng = SearchEngine(idx)
    out = []
    for q in queries:
        d, s = eng.bm25(q, 20)
        out.append((d.tolist(), s.tolist()))
    return out


def test_resume_after_wave_interrupt(ray_session, two_files, tmp_path):
    """Kill after wave 0 of 2 → a fresh builder completes only the missing
    wave and all segments; results identical to an uninterrupted build."""
    from vfs_index_ray.build import IndexBuilder

    clean = str(tmp_path / "clean")
    IndexBuilder(clean, mode="word", num_parts=8, id_col=None
                 ).build(two_files, waves=2)

    inter = str(tmp_path / "interrupted")
    b1 = IndexBuilder(inter, mode="word", num_parts=8, id_col=None)
    b1.build_postings_wave(0, [two_files[0]])  # "crash" here
    b2 = IndexBuilder(inter, mode="word", num_parts=8, id_col=None)
    b2.build(two_files, waves=2)
    assert _bm25_fingerprint(clean) == _bm25_fingerprint(inter)


def test_resume_after_partial_segments(ray_session, two_files, tmp_path):
    """Kill mid-phase-2 (3 of 8 partitions committed) → resume completes
    the other 5; no duplicate postings, identical results."""
    from vfs_index_ray.build import IndexBuilder, SegmentWriter

    clean = str(tmp_path / "clean2")
    IndexBuilder(clean, mode="word", num_parts=8, id_col=None
                 ).build(two_files)

    inter = str(tmp_path / "inter2")
    b1 = IndexBuilder(inter, mode="word", num_parts=8, id_col=None)
    b1.build_postings_wave(0, two_files)
    w = SegmentWriter(b1.segments_dir, 64)
    for p in range(3):
        pdir = os.path.join(b1.postings_dir, "wave=0000", f"part={p}")
        t = pq.read_table(pdir, columns=["term_id", "doc_id", "tf", "dl"])
        w.encode_part(p, t)
    assert sorted(b1._done_parts()) == [0, 1, 2]
    b2 = IndexBuilder(inter, mode="word", num_parts=8, id_col=None)
    b2.build(two_files)
    assert _bm25_fingerprint(clean) == _bm25_fingerprint(inter)
    # committed partitions were not rebuilt with different content
    for name in os.listdir(os.path.join(clean, "segments")):
        if name.endswith(".parquet"):
            t1 = pq.read_table(os.path.join(clean, "segments", name))
            t2 = pq.read_table(os.path.join(inter, "segments", name))
            assert t1.equals(t2), name


def test_wave_sidecar_requires_postings(ray_session, two_files, tmp_path):
    """Scratch loss before segments are built → wave recomputed, not
    trusted from the orphaned sidecar."""
    from vfs_index_ray.build import IndexBuilder

    idx = str(tmp_path / "scratchloss")
    scratch = str(tmp_path / "scratch")
    b1 = IndexBuilder(idx, mode="word", num_parts=8, id_col=None,
                      scratch_dir=scratch)
    b1.build_postings_wave(0, two_files)
    shutil.rmtree(scratch)  # lose the spill before phase 2
    b2 = IndexBuilder(idx, mode="word", num_parts=8, id_col=None,
                      scratch_dir=scratch)
    assert not b2._wave_done(0)  # sidecar alone must not count
    b2.build(two_files)
    clean = str(tmp_path / "clean3")
    IndexBuilder(clean, mode="word", num_parts=8, id_col=None
                 ).build(two_files)
    assert _bm25_fingerprint(clean) == _bm25_fingerprint(idx)


def test_absorb_incremental_equals_full(ray_session, two_files, tmp_path):
    """build(a) + absorb(b) == build([a, b]) — tokenized waves reused,
    segments re-encoded (the reference's incremental Regist + merge)."""
    import pyarrow.parquet as pq2

    from vfs_index_ray.build import IndexBuilder

    full = str(tmp_path / "full")
    IndexBuilder(full, mode="word", num_parts=8, id_col=None
                 ).build(two_files, waves=2)
    inc = str(tmp_path / "inc")
    b = IndexBuilder(inc, mode="word", num_parts=8, id_col=None)
    b.build([two_files[0]])
    stats = b.absorb([two_files[1]])
    assert stats["n_docs"] == 400
    assert _bm25_fingerprint(full) == _bm25_fingerprint(inc)
    import os
    for name in sorted(os.listdir(os.path.join(full, "segments"))):
        if name.endswith(".parquet"):
            t1 = pq2.read_table(os.path.join(full, "segments", name))
            t2 = pq2.read_table(os.path.join(inc, "segments", name))
            assert t1.equals(t2), name


def test_watch_absorb_once(ray_session, tmp_path):
    """watch_absorb --once ingests only files not yet in any wave; a
    second scan with no new files is a no-op; restartable by design."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa

    from vfs_index_ray import corpus
    from vfs_index_ray.search import SearchEngine

    pages = corpus.generate_pages(90)
    ids = pa.array(np.arange(90, dtype=np.int64), pa.int64())
    tbl = pages.append_column("doc_id", ids)
    inc = tmp_path / "incoming"
    inc.mkdir()
    pq.write_table(tbl.slice(0, 60), str(inc / "a.parquet"))
    idx = str(tmp_path / "idx")

    def run_once():
        return subprocess.run(
            [sys.executable, "scripts/watch_absorb.py", "--index", idx,
             "--input", str(inc / "*.parquet"), "--num-parts", "4",
             "--once"],
            capture_output=True, text=True, cwd="/root/repo", check=True)

    out = run_once()
    assert '"absorbed": 1' in out.stdout
    assert SearchEngine(idx).ndocs == 60
    # new file arrives → only it is absorbed
    pq.write_table(tbl.slice(60), str(inc / "b.parquet"))
    out = run_once()
    assert '"absorbed": 1' in out.stdout
    eng = SearchEngine(idx)
    assert eng.ndocs == 90
    docs = eng.match("bababa")
    assert (docs < 60).any() and (docs >= 60).any()
    # nothing new → no absorb line
    out = run_once()
    assert "absorbed" not in out.stdout


def test_build_index_toml_config(ray_session, tmp_path):
    """K6 parity: TOML job config sets build options; CLI overrides."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa

    from vfs_index_ray import corpus
    from vfs_index_ray.build import read_stats

    pages = corpus.generate_pages(40)
    ids = pa.array(np.arange(40, dtype=np.int64), pa.int64())
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pages.append_column("doc_id", ids), src)
    cfg = tmp_path / "job.toml"
    cfg.write_text('num_parts = 2\nmode = "word"\n')
    idx = str(tmp_path / "idx")
    subprocess.run(
        [sys.executable, "scripts/build_index.py", "--input", src,
         "--index", idx, "--config", str(cfg)],
        capture_output=True, text=True, cwd="/root/repo", check=True)
    st = read_stats(idx)
    assert st["num_parts"] == 2 and st["mode"] == "word"
