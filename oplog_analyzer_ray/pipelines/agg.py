"""Grouped aggregation with per-block partial pre-aggregation (SURVEY.md §2.6).

This is the engine's version of the reference's per-shard-private-accumulator →
merge pattern ("no contention", TailCommand.java:1003-1007, merge at
1084-1146): every block first collapses into one partial row per group via a
vectorized ``pyarrow.Table.group_by`` inside ``map_batches``, and only the tiny
partials go through the Ray Data ``groupby().aggregate()`` shuffle.

Why this matters at 100 TB: the naive ``ds.groupby(keys).aggregate(...)`` moves
EVERY row through an all-to-all exchange.  With the partial stage, the shuffle
input is at most ``num_blocks × num_groups`` rows regardless of data size, and
hot keys (Zipf-skewed conv_ids) are pre-combined inside each block, so skew at
the exchange is bounded by the block count — the same effect as salting, with
no salt column needed (each block acts as one salt partition).

Merge semantics are the reference's CORRECT ``EntryAccumulator.merge``
(count/total/min/max component-wise, EntryAccumulator.java:210-229), not the
lossy ``ScanCommand.java:338-356`` replay (SURVEY.md §7.5); pinned by
tests/test_agg.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


@dataclass(frozen=True)
class GroupSpec:
    """What to compute per group of ``keys``.

    count        -> output column ``cnt`` (COUNT(*))
    sum_cols     -> ``sum_<col>`` (SUM(col), null-ignoring like SQL)
    min_cols     -> ``min_<col>``; max_cols -> ``max_<col>``
    count_valid  -> ``cntv_<col>`` (COUNT(col): non-null count)
    """

    keys: tuple[str, ...]
    count: bool = True
    sum_cols: tuple[str, ...] = ()
    min_cols: tuple[str, ...] = ()
    max_cols: tuple[str, ...] = ()
    count_valid: tuple[str, ...] = ()

    @property
    def needed_columns(self) -> list[str]:
        cols = list(self.keys)
        for c in (*self.sum_cols, *self.min_cols, *self.max_cols, *self.count_valid):
            if c not in cols:
                cols.append(c)
        return cols


def _partial_batch(batch: pa.Table, spec: GroupSpec) -> pa.Table:
    """One partial row per group present in this block (vectorized)."""
    cols = [c for c in spec.needed_columns if c in batch.column_names]
    t = batch.select(cols)
    if spec.count:
        t = t.append_column("_ones", pa.array(np.ones(t.num_rows, dtype=np.int64)))
    aggs = []
    if spec.count:
        aggs.append(("_ones", "sum"))
    aggs += [(c, "sum") for c in spec.sum_cols]
    aggs += [(c, "min") for c in spec.min_cols]
    aggs += [(c, "max") for c in spec.max_cols]
    aggs += [(c, "count") for c in spec.count_valid]
    return t.group_by(list(spec.keys)).aggregate(aggs)


def grouped(ds: Dataset, spec: GroupSpec) -> Dataset:
    """partial-per-block pre-aggregate → small final shuffle → renamed stats."""
    partial = ds.map_batches(
        _partial_batch,
        fn_kwargs={"spec": spec},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    finals = []
    if spec.count:
        finals.append(Sum("_ones_sum", alias_name="cnt"))
    for c in spec.sum_cols:
        finals.append(Sum(f"{c}_sum", alias_name=f"sum_{c}"))
    for c in spec.min_cols:
        finals.append(Min(f"{c}_min", alias_name=f"min_{c}"))
    for c in spec.max_cols:
        finals.append(Max(f"{c}_max", alias_name=f"max_{c}"))
    for c in spec.count_valid:
        finals.append(Sum(f"{c}_count", alias_name=f"cntv_{c}"))
    return partial.groupby(list(spec.keys)).aggregate(*finals)
