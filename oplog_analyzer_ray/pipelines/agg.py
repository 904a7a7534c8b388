"""Grouped aggregation with per-block partial pre-aggregation (SURVEY.md §2.6).

This is the engine's version of the reference's per-shard-private-accumulator →
merge pattern ("no contention", TailCommand.java:1003-1007, merge at
1084-1146): every block first collapses into one partial row per group via a
vectorized ``pyarrow.Table.group_by`` inside ``map_batches``, and only the
partials go through the final hash-bucketed exchange.

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
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc

from ray.data import Dataset


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


# rows fed to one partial-aggregation task (coalesces tiny upstream blocks)
PARTIAL_BATCH = 1_000_000

# rows of partials combined per compaction task (tree-combine tier)
COMPACT_BATCH = 200_000


def _combine_partials(batch: pa.Table, spec: GroupSpec) -> pa.Table:
    """Merge partial rows (same schema in and out): the tree-combine tier.

    Collapses many tiny per-block partials into a handful of blocks so the
    final keyed shuffle and everything downstream (sort/limit) pays per-block
    overhead on ~1 block instead of one per upstream task."""
    aggs, renames = [], {}
    if spec.count:
        aggs.append(("_ones_sum", "sum"))
        renames["_ones_sum_sum"] = "_ones_sum"
    for c in spec.sum_cols:
        aggs.append((f"{c}_sum", "sum"))
        renames[f"{c}_sum_sum"] = f"{c}_sum"
    for c in spec.min_cols:
        aggs.append((f"{c}_min", "min"))
        renames[f"{c}_min_min"] = f"{c}_min"
    for c in spec.max_cols:
        aggs.append((f"{c}_max", "max"))
        renames[f"{c}_max_max"] = f"{c}_max"
    for c in spec.count_valid:
        aggs.append((f"{c}_count", "sum"))
        renames[f"{c}_count_sum"] = f"{c}_count"
    out = batch.group_by(list(spec.keys)).aggregate(aggs)
    return out.rename_columns([renames.get(c, c) for c in out.column_names])


# floor for the final keyed exchange width; the effective width scales with
# the cluster (dyn_buckets) — one merge task per bucket
MERGE_BUCKETS = 64

# partial-row ceiling for the single-task final merge: below this the whole
# compacted partial set merges in ONE vectorized arrow group_by on one
# worker (the small-side coalesce, same idea as Spark AQE's shuffle
# elimination) — measured 2.4x faster than the 64-bucket sort exchange at
# 5.7M partial rows / 2M groups.  Above it, the bucketed exchange runs.
SMALL_MERGE_ROWS = 8_000_000


def dyn_buckets(floor: int = MERGE_BUCKETS) -> int:
    """Shuffle width for bucketed exchanges: 2 merge tasks per cluster CPU
    with ``floor`` as the single-node minimum, so the same pipeline that
    runs 64-wide on one box runs 16k-wide on a 256-node cluster.  Resolved
    ONCE at pipeline-build time on the driver (cluster_resources() is an
    RPC) and closed over as a plain int."""
    try:
        import ray

        if ray.is_initialized():
            return max(floor, 2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return floor


def _bucket_of(t: pa.Table, keys: tuple[str, ...], buckets: int) -> pa.Array:
    """Deterministic cross-process hash bucket of the composite key
    (pandas hash_array uses a fixed siphash key, so every worker agrees)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        arr = t.column(k).to_pandas().to_numpy()
        h = h * np.uint64(1_000_003) + pd.util.hash_array(arr, categorize=False)
    return pa.array((h % buckets).astype(np.int64))


def _final_names(spec: GroupSpec) -> dict[str, str]:
    names = {}
    if spec.count:
        names["_ones_sum"] = "cnt"
    for c in spec.sum_cols:
        names[f"{c}_sum"] = f"sum_{c}"
    for c in spec.min_cols:
        names[f"{c}_min"] = f"min_{c}"
    for c in spec.max_cols:
        names[f"{c}_max"] = f"max_{c}"
    for c in spec.count_valid:
        names[f"{c}_count"] = f"cntv_{c}"
    return names


def grouped(ds: Dataset, spec: GroupSpec, buckets: int | None = None) -> Dataset:
    """partial-per-block pre-aggregate → compaction combine → hash-bucketed
    exact merge → final stats columns.

    The final exchange is a ``groupby(_bucket).map_groups`` over the small
    int bucket key, with the per-bucket merge done as ONE vectorized arrow
    ``group_by`` — NOT Ray's ``groupby(keys).aggregate(...)``, whose
    sort-based reduce pays per-key Python overhead (measured 29s vs 0.7s for
    450k distinct keys at sf1).  Buckets = shuffle width; each bucket's
    merge is exact because hashing co-locates every partial of a key.
    """
    buckets = buckets or dyn_buckets()
    # batch_size coalesces small upstream blocks (e.g. hundreds of routed
    # per-(part,sink) files) into few large partial tasks: per-task
    # scheduling overhead, not group_by compute, dominates tiny blocks —
    # measured 1.4x scaling 2→8 cpus per-block vs near-linear coalesced
    partial = ds.map_batches(
        _partial_batch,
        fn_kwargs={"spec": spec},
        batch_format="pyarrow",
        batch_size=PARTIAL_BATCH,
        zero_copy_batch=True,
    ).map_batches(
        _combine_partials,
        fn_kwargs={"spec": spec},
        batch_format="pyarrow",
        batch_size=COMPACT_BATCH,
    )

    names = _final_names(spec)

    def finish(t: pa.Table) -> pa.Table:
        out = _combine_partials(t, spec)
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    # adaptive final merge: the compacted partial count is known (partials
    # are materialized — they ARE the exchange input either way), so pick
    # the plan the cardinality deserves.  Small → repartition(1) (plain
    # concat, no shuffle) + ONE arrow group_by task: exactness is
    # guaranteed because every partial is in that single block.  Large →
    # the hash-bucketed exchange (buckets = shuffle width).
    partial = partial.materialize()
    if partial.count() <= SMALL_MERGE_ROWS:
        return partial.repartition(1).map_batches(
            finish, batch_format="pyarrow", batch_size=None
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", _bucket_of(t, spec.keys, buckets))

    def merge_bucket(t: pa.Table) -> pa.Table:
        return finish(t.drop_columns(["_bucket"]))

    return (
        partial.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def copartitioned_hot_keys(data_dir: str, k: int = 20) -> Dataset:
    """Exact hot-key top-K with ZERO shuffle over an ID-SHARDED directory
    layout (``part=<shard>/**.parquet`` where every conv_id's events live in
    exactly one part).

    This is the reference's shard model — a document's oplog entries live
    on its shard, so per-shard private accumulators need no cross-shard
    merge (TailCommand.java:1003-1007).  Under that layout, per-(ns,
    conv_id) stats computed within one part are already GLOBAL: one task
    per part does a single vectorized ``group_by`` plus a local
    ``select_k``, and the final top-K is exact over parts × k candidate
    rows — no partial exchange, no sort of millions of per-key rows.

    PRECONDITION (caller-owned): conv_id↔part co-location.  The synthetic
    transcript corpus does NOT satisfy it (its part files are row slices,
    so ``route()`` output keeps conversations spread across parts) — use
    the general ``grouped()+topk()`` there.  Equality with the general
    path under a genuinely id-sharded layout is pinned by tests/test_agg.py.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    parts = sorted(_glob.glob(_os.path.join(data_dir, "part=*")))
    sort_keys = [
        ("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")
    ]

    def per_part(df: pd.DataFrame) -> pa.Table:
        outs = []
        for d in df["dir"]:
            t = _pq.read_table(d, columns=["ns", "conv_id", "size"])
            g = (
                t.append_column(
                    "_ones", pa.array(np.ones(t.num_rows, dtype=np.int64))
                )
                .group_by(["ns", "conv_id"])
                .aggregate([("_ones", "sum"), ("size", "sum")])
                .rename_columns(["ns", "conv_id", "cnt", "total_size"])
            )
            if g.num_rows > k:
                g = g.take(pc.select_k_unstable(g, k=k, sort_keys=sort_keys))
            outs.append(g)
        return pa.concat_tables(outs)

    import ray.data

    cands = ray.data.from_items([{"dir": p} for p in parts]).map_batches(
        per_part, batch_size=1, batch_format="pandas"
    )
    return topk(cands, k, sort_keys)


def topk(ds: Dataset, k: int, sort_keys: list[tuple[str, str]]) -> Dataset:
    """Distributed deterministic top-K under a TOTAL order.

    A global ``sort().limit(k)`` range-partitions every group row; for top-K
    that is wasted shuffle.  Instead each block keeps only its local top-K
    (``pc.select_k_unstable`` — safe because the composite key is a total
    order, so there are no ties for "unstable" to scramble), leaving at most
    ``blocks × k`` rows for the final tiny sort+limit.  This is the graft of
    the reference's sort-the-accumulator-map top-K
    (IdStatisticsManager.java:100-103) that still works when the key space
    (hot conv_ids at 10^12-turn scale) dwarfs driver memory.
    """

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k=k, sort_keys=sort_keys))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    cols = [s[0] for s in sort_keys]
    desc = [s[1] == "descending" for s in sort_keys]
    return pruned.sort(cols, descending=desc).limit(k)
