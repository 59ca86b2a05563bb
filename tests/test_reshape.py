"""unpivot (melt): k value columns become k rows per input row."""

from __future__ import annotations

import pyarrow as pa
import pytest

from vfs_index_ray.functions.reshape import unpivot


def test_unpivot_roundtrip(ray_session):
    import ray
    import ray.data
    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "a": pa.array([10, 20], pa.int64()),
        "b": pa.array([11, 21], pa.int64()),
        "c": pa.array([12, 22], pa.int64())})
    out = unpivot(ray.data.from_arrow(t), id_cols=["k"],
                  value_cols=["a", "b", "c"])
    got = pa.concat_tables(ray.get(out.to_arrow_refs()))
    got = got.sort_by([("k", "ascending"), ("name", "ascending")])
    assert got["k"].to_pylist() == [1, 1, 1, 2, 2, 2]
    assert got["name"].to_pylist() == ["a", "b", "c"] * 2
    assert got["value"].to_pylist() == [10, 11, 12, 20, 21, 22]


def test_unpivot_empty_and_validation(ray_session):
    import ray
    import ray.data
    t = pa.table({"k": pa.array([], pa.int64()),
                  "a": pa.array([], pa.int64())})
    out = unpivot(ray.data.from_arrow(t), id_cols=["k"],
                  value_cols=["a"])
    assert out.count() == 0
    with pytest.raises(ValueError):
        unpivot(ray.data.from_arrow(t), id_cols=["k"], value_cols=[])
