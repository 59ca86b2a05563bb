"""Snapshot diff: compare two keyed table versions and classify every
key as added / removed / changed (unchanged keys are omitted).

The incremental-maintenance primitive a 100-TB curation pipeline needs
between corpus versions ("what changed since the last crawl"), and the
set-difference generalization of the reference's dirty-filter resume
anti-join (reference: modules/vfs-index/internal/indexer file-state
diffing) lifted from file lists to whole keyed tables.

Scale shape: both snapshots co-partition by ``hash(key) % P`` through
the shared hive disk-spill substrate (``joins.co_partition_apply``,
size-aware part count, ``include_missing_left`` so right-only
partitions still report their keys as added); the per-partition kernel
is one vectorized ``index_in`` probe + null-safe column compare.  The
diff table itself streams back as object-store refs — rows never pass
through the driver.

Assumes ``key`` is unique within each snapshot (a primary key); with
duplicate keys the per-partition probe matches the first occurrence,
like a keyed dictionary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["snapshot_diff"]


def _null_safe_eq(a, b):
    """NULL-safe elementwise equality (SQL ``IS NOT DISTINCT FROM``):
    NULL == NULL is true, NULL == value is false."""
    an, bn = pc.is_null(a), pc.is_null(b)
    eq = pc.fill_null(pc.equal(a, b), False)
    return pc.or_(eq, pc.and_(an, bn))


def _diff_kernel(left: pa.Table, right: pa.Table, key: str,
                 compare_cols: list[str]) -> pa.Table:
    kt = (left if left.num_rows or not right.num_rows
          else right).schema.field(key).type
    schema = pa.schema([("key", kt), ("change", pa.string())])
    lk = left[key].combine_chunks() if left.num_rows else None
    rk = right[key].combine_chunks() if right.num_rows else None

    keys, changes = [], []
    if left.num_rows:
        li = (pc.index_in(lk, value_set=rk) if right.num_rows
              else pa.nulls(left.num_rows, pa.int32()))
        miss = pc.is_null(li)
        removed = lk.filter(miss)
        if len(removed):
            keys.append(removed)
            changes.append(np.full(len(removed), "removed"))
        if right.num_rows:
            both = pc.fill_null(pc.invert(miss), False)
            lmat = left.filter(both)
            rmat = right.take(li.filter(both))
            if lmat.num_rows:
                diff = None
                for c in compare_cols:
                    ne = pc.invert(_null_safe_eq(lmat[c], rmat[c]))
                    diff = ne if diff is None else pc.or_(diff, ne)
                if diff is not None:
                    ch = lmat[key].filter(diff)
                    if len(ch):
                        keys.append(ch.combine_chunks())
                        changes.append(np.full(len(ch), "changed"))
    if right.num_rows:
        ri = (pc.index_in(rk, value_set=lk) if left.num_rows
              else pa.nulls(right.num_rows, pa.int32()))
        added = rk.filter(pc.is_null(ri))
        if len(added):
            keys.append(added)
            changes.append(np.full(len(added), "added"))
    if not keys:
        return schema.empty_table()
    return pa.table({
        "key": pa.concat_arrays([k.cast(kt) for k in keys]),
        "change": pa.array(np.concatenate(changes)),
    }, schema=schema)


def snapshot_diff(left_ds, right_ds, *, key: str,
                  compare_cols: list[str] | None = None,
                  num_parts: int | None = None, spill_dir=None):
    """Diff ``right_ds`` (new snapshot) against ``left_ds`` (old):
    returns a Dataset of ``(key, change)`` with change in
    ``{'added', 'removed', 'changed'}``; unchanged keys are omitted.

    ``compare_cols`` defaults to every column both snapshots share
    except the key; comparison is NULL-safe (``IS DISTINCT FROM``)."""
    from .joins import co_partition_apply

    if compare_cols is None:
        lnames = set(left_ds.schema().base_schema.names)
        compare_cols = [c for c in right_ds.schema().base_schema.names
                        if c in lnames and c != key]

    def kernel(lp: pa.Table, rp: pa.Table) -> pa.Table:
        return _diff_kernel(lp, rp, key, list(compare_cols))

    return co_partition_apply(left_ds, right_ds, left_on=key,
                              kernel=kernel, num_parts=num_parts,
                              include_missing_left=True,
                              spill_dir=spill_dir)
