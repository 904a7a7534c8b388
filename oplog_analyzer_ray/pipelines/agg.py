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

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc

import ray
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
    """One partial row per group present in this block (vectorized).

    Schema-less empty blocks pass through (the merge tiers filter them); a
    NON-empty block missing a spec column is a caller bug and fails with a
    named KeyError, not an opaque arrow field error from the group_by."""
    if batch.num_columns == 0:
        return batch
    missing = [c for c in spec.needed_columns if c not in batch.column_names]
    if missing:
        raise KeyError(
            f"grouped(): spec column(s) {missing} absent from block schema "
            f"{batch.column_names}"
        )
    t = batch.select(spec.needed_columns)
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

# rows of partials combined per compaction task (tree-combine tier).  Wider
# windows buy cross-block dedup before the exchange: at sf5 the hot-key
# partials drop 5.9M → 4.8M rows going 200k → 2M, directly cutting the
# bytes the final exchange must move.
COMPACT_BATCH = 2_000_000


def _combine_partials(batch: pa.Table, spec: GroupSpec) -> pa.Table:
    """Merge partial rows (same schema in and out): the tree-combine tier.

    Collapses many tiny per-block partials into a handful of blocks so the
    final keyed shuffle and everything downstream (sort/limit) pays per-block
    overhead on ~1 block instead of one per upstream task."""
    if batch.num_columns == 0:  # schema-less empty from the partial tier
        return batch
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
# elimination).  Low-cardinality groupings (per-sink stats: blocks × ~50
# groups) stay under it and skip the exchange entirely; anything bigger
# takes the parallel hash exchange — a serial merge of millions of partials
# is exactly the Amdahl term that capped round-2's 4→16 scaling at 0.64.
SMALL_MERGE_ROWS = 65_536

# ONE shared "bounded input" gate for every hash_bucket_apply call site
# (dedup joins, per-user events ops, embedding kernels, prefix scans): at or
# below this on-disk input size the task exchange materializes and scatters;
# above it the streamed sort path runs.  Env-overridable so the policy is
# tuned in one place, not five literals.
# int(float(...)) so scientific notation ("2e9") works in the env override
EXCHANGE_GATE_MAX_BYTES = int(
    float(os.environ.get("OPLOG_EXCHANGE_GATE_MAX_BYTES", 2e9))
)

# driver-side ref-count guard for the hand-rolled exchange: it tracks
# blocks × buckets ObjectRefs, trivial here (tens × hundreds) but not at a
# 256-node cluster's 10k blocks × 16k buckets — past this fanout, fall back
# to Ray Data's sort-based shuffle, whose distributed metadata handling is
# built for that regime.
MAX_EXCHANGE_FANOUT = 1 << 18


def dyn_buckets(floor: int = MERGE_BUCKETS) -> int:
    """Shuffle width for bucketed exchanges: 2 merge tasks per cluster CPU
    with ``floor`` as the single-node minimum, so the same pipeline that
    runs 64-wide on one box runs 16k-wide on a 256-node cluster.  Resolved
    ONCE at pipeline-build time on the driver (cluster_resources() is an
    RPC) and closed over as a plain int."""
    try:
        if ray.is_initialized():
            return max(floor, 2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass  # resource RPC failure: fall back to the single-node floor
    return floor


def _bucket_np(t: pa.Table, keys: tuple[str, ...], buckets: int) -> np.ndarray:
    """Deterministic cross-process hash bucket of the composite key
    (pandas hash_array uses a fixed siphash key, so every worker agrees).

    Null keys are fill_null'ed to an in-dtype sentinel BEFORE ``to_pandas``
    and re-marked afterwards: a null-bearing int64/bool block would
    otherwise convert to float64/object and hash the SAME non-null value
    to a DIFFERENT bucket than a null-free block does — silently splitting
    a key's partials across buckets.  Null-free blocks hash bit-identically
    to the pre-fix code."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t.column(k)
        mask = None
        if col.null_count:
            mask = pc.is_null(col).to_numpy(zero_copy_only=False)
            typ = col.type
            if pa.types.is_dictionary(typ):  # decode so the fill scalar fits
                typ = typ.value_type
                col = pc.cast(col, typ)
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                fill = ""
            elif pa.types.is_boolean(typ):
                fill = False
            elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                fill = b""
            else:
                fill = 0
            col = pc.fill_null(col, pa.scalar(fill, type=typ))
        arr = col.to_pandas().to_numpy()
        h = h * np.uint64(1_000_003) + pd.util.hash_array(arr, categorize=False)
        if mask is not None:  # null != the sentinel value, deterministically
            h[mask] = h[mask] * np.uint64(31) + np.uint64(7)
    return (h % buckets).astype(np.int64)


def _bucket_of(t: pa.Table, keys: tuple[str, ...], buckets: int) -> pa.Array:
    return pa.array(_bucket_np(t, keys, buckets))


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


def pin_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Append one typed zero-row block.  Ray skips map UDFs on empty blocks
    (and sort drops them entirely), so an operator whose input legitimately
    empties out — a zero-row table, a corpus with no duplicate pairs —
    would otherwise surface a schema-LESS result that breaks downstream
    sort/select and the operator's documented output contract.  One 0-row
    block, no other cost.  The single definition shared by every pipeline
    module's report surfaces."""
    import ray.data as _rd

    return ds.union(_rd.from_arrow(schema.empty_table()))


def final_empty(spec: GroupSpec, types: dict[str, "pa.DataType"]) -> pa.Table:
    """Zero-row FINAL-schema table for ``grouped(spec, ...)``'s ``empty=``,
    derived from the spec so call sites only supply source-column dtypes:
    ``types`` maps each key column and each aggregated SOURCE column to the
    dtype the merge emits for it (sum/min/max preserve the input type for
    int64/float64/timestamp inputs; ``cnt``/``cntv_*`` are always int64).
    Filter-heavy operators whose input can legitimately empty out (no
    purchases, no matching rows) pass this so a fully-empty input yields a
    typed zero-row result instead of the all-shards-schema-less
    ValueError."""
    fields = [(k, types[k]) for k in spec.keys]
    if spec.count:
        fields.append(("cnt", pa.int64()))
    fields += [(f"sum_{c}", types[c]) for c in spec.sum_cols]
    fields += [(f"min_{c}", types[c]) for c in spec.min_cols]
    fields += [(f"max_{c}", types[c]) for c in spec.max_cols]
    fields += [(f"cntv_{c}", pa.int64()) for c in spec.count_valid]
    return pa.schema(fields).empty_table()


def _pick_spec(t: pa.Table, spec_idx: int | None, cols: list[str] | None):
    """Inside-task projection for grouped_multi's union-schema partials:
    keep one spec's rows/columns.  No-op for single-spec grouped()."""
    if spec_idx is None:
        return t
    return t.filter(pc.equal(t.column("_spec"), spec_idx)).select(cols)


@ray.remote
def _project_task(t: pa.Table, spec_idx: int, cols: list[str]) -> pa.Table:
    """Per-block spec projection BEFORE a cross-worker transfer: without it
    the single-task small merge of a low-cardinality spec would ship every
    union block — including the OTHER specs' potentially-millions of
    partial rows — to one worker, once per small spec.  Schema-less empty
    blocks pass through (the merge filters them)."""
    if "_spec" not in t.column_names:
        return t
    return _pick_spec(t, spec_idx, cols)


# dictionary-encode a string column of an exchange slice only when it
# actually compresses: repeated key strings (ns/sink: dozens of distinct
# values across millions of partial rows) shrink to small-int indices + one
# tiny dictionary, while near-unique strings (conv_id in hot-key partials)
# would pay index overhead for nothing.  Decided PER SLICE — encoding before
# the split would ship the whole block-wide dictionary with every one of
# ``buckets`` slices (a buckets× amplification of exactly the wrong bytes).
_DICT_ENCODE_MAX_RATIO = 0.5


def _encode_exchange(t: pa.Table) -> pa.Table:
    if t.num_rows < 64:
        return t
    out = t
    for i, f in enumerate(t.schema):
        if not (pa.types.is_string(f.type) or pa.types.is_large_string(f.type)):
            continue
        enc = pc.dictionary_encode(t.column(f.name).combine_chunks())
        if len(enc.dictionary) <= _DICT_ENCODE_MAX_RATIO * t.num_rows:
            out = out.set_column(i, f.name, enc)
    return out


def _decode_exchange(t: pa.Table) -> pa.Table:
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, pc.cast(t.column(f.name), f.type.value_type))
    return t


@ray.remote
def _split_task(
    t: pa.Table,
    keys: tuple[str, ...],
    buckets: int,
    spec_idx: int | None = None,
    cols: list[str] | None = None,
):
    """Map side of the hand-rolled hash exchange: one pass that orders the
    block by bucket and returns ``buckets`` contiguous slices (Ray scatters
    them as separate objects via ``num_returns``), each with its repeated
    string key columns dictionary-encoded so the exchange moves int indices
    instead of full strings."""
    if t.num_columns == 0:  # schema-less empties carry no key columns
        return [t] * buckets
    return _order_and_slice(_pick_spec(t, spec_idx, cols), keys, buckets)


def _order_and_slice(
    t: pa.Table, keys: tuple[str, ...], buckets: int
) -> list[pa.Table]:
    """Shared split-side kernel of BOTH exchanges (grouped()'s _split_task
    and hash_bucket_apply's _split_group_task): order one block by key-hash
    bucket and return the ``buckets`` contiguous dictionary-encoded slices.
    One definition so the bucket semantics, the missing-key failure mode
    and the encode policy cannot drift between the two."""
    missing = [k for k in keys if k not in t.column_names]
    if missing:
        # a NON-empty block without the key is a caller bug — fail like the
        # sort path does, never silently drop rows
        raise KeyError(
            f"exchange split: key column(s) {missing} absent from block "
            f"schema {t.column_names}"
        )
    b = _bucket_np(t, keys, buckets)
    order = np.argsort(b, kind="stable")
    t2 = t.take(pa.array(order))
    cuts = np.searchsorted(b[order], np.arange(buckets + 1))
    return [
        _encode_exchange(
            t2.slice(cuts[i], cuts[i + 1] - cuts[i]).combine_chunks()
        )
        for i in range(buckets)
    ]


@ray.remote
def _merge_task(
    spec: GroupSpec, names: dict, empty: pa.Table | None, *shards: pa.Table
) -> pa.Table:
    """Reduce side: every partial of a key lands in exactly one bucket, so
    one vectorized arrow ``group_by`` over the concatenated shards is the
    exact merge.  Dictionary key columns (from the split-side encoding)
    decode back to plain strings first — each shard carries its own
    dictionary, so a plain concat would need a unification pass anyway.
    Schema-LESS empty shards (Ray drops the schema of all-empty map
    outputs) are filtered; when NOTHING remains, the caller-supplied
    final-schema ``empty`` table is the result."""
    usable = [s for s in shards if s.num_columns]
    if not usable:
        if empty is not None:
            return empty
        raise ValueError(
            "grouped(): every partial shard is schema-less (fully empty "
            "input) and no `empty` fallback table was supplied — pass "
            "grouped(..., empty=<final-schema empty table>)"
        )
    return _finalize(
        pa.concat_tables([_decode_exchange(s) for s in usable]), spec, names
    )


@ray.remote
def _concat_merge_task(
    spec: GroupSpec,
    names: dict,
    spec_idx: int | None,
    cols: list[str] | None,
    empty: pa.Table | None,
    *blocks: pa.Table,
) -> pa.Table:
    """Small-cardinality path: merge ALL partials in one task (exact — every
    partial is in the concat).  A raw task instead of a
    repartition(1)+map_batches Dataset job: grouped() runs per query, and
    ~0.3 s of streaming-executor startup per tiny merge is pure Amdahl tax.
    Schema-less empty blocks are filtered (see ``_merge_task``)."""
    usable = [b for b in blocks if b.num_columns]
    if not usable:
        if empty is not None:
            return empty
        raise ValueError(
            "grouped(): every partial block is schema-less (fully empty "
            "input) and no `empty` fallback table was supplied — pass "
            "grouped(..., empty=<final-schema empty table>)"
        )
    t = pa.concat_tables([_pick_spec(b, spec_idx, cols) for b in usable])
    return _finalize(t, spec, names)


def _finalize(t: pa.Table, spec: GroupSpec, names: dict) -> pa.Table:
    """Merge compacted partials and apply the final output column names —
    the one definition behind every merge tier (task, concat, sort-fallback
    finish and bucket merge), so rename/merge semantics cannot drift
    between plans."""
    out = _combine_partials(t, spec)
    return out.rename_columns([names.get(c, c) for c in out.column_names])


def _exchange_merge(
    partial: Dataset,
    spec: GroupSpec,
    buckets: int,
    *,
    refs: list | None = None,
    n_rows: int | None = None,
    spec_idx: int | None = None,
    cols: list[str] | None = None,
    empty: pa.Table | None = None,
) -> Dataset:
    """Final exact merge of MATERIALIZED compacted partials — plan picked by
    cardinality:

    - ≤ SMALL_MERGE_ROWS partials: ONE arrow group_by task (no exchange —
      spawning ``buckets`` merge tasks for a 48-group result is pure
      overhead);
    - otherwise a hand-rolled task-based hash exchange: per-block split
      tasks scatter bucket slices, one merge task per bucket does the
      vectorized group_by.  Chosen over Ray's sort-based
      ``groupby(_bucket).map_groups`` on measurement (sf5 hot-key partials,
      fresh sessions, best-of-2): hand 1.15 s @16 cpus / 2.05 s @4 vs sort
      1.58 s / 7.38 s — the sort path pays a boundary-sampling pass plus
      sort-merge machinery that a pre-hashed int bucket never needs.  Also
      NOT Ray's ``groupby(keys).aggregate(...)``, whose sort-based reduce
      pays per-key Python overhead (measured 29 s vs 0.7 s at 450k keys);
    - past MAX_EXCHANGE_FANOUT (blocks × buckets ObjectRefs on the driver),
      fall back to Ray Data's sort shuffle, which owns that regime.

    ``spec_idx``/``cols`` (grouped_multi) push the per-spec projection into
    the exchange tasks themselves — no intermediate filtered Dataset.
    """
    import ray.data as _rd

    names = _final_names(spec)
    if refs is None:
        refs = partial.to_arrow_refs()
    if n_rows is None:
        n_rows = partial.count()

    # one merge task over all blocks, for either reason: few enough partial
    # rows that a single vectorized group_by wins, or degenerate exchange
    # width (buckets == 1: options(num_returns=1) would hand back a bare
    # ObjectRef, not a list, so the split/merge loop below cannot run — and
    # one merge task IS the exact plan anyway, same as hash_bucket_apply)
    if refs and (n_rows <= SMALL_MERGE_ROWS or buckets == 1):
        use, si, sc = refs, spec_idx, cols
        if spec_idx is not None:
            # project each union block where it lives; only THIS spec's
            # partial rows cross to the single merge worker
            use = [_project_task.remote(r, spec_idx, cols) for r in refs]
            si, sc = None, None
        return _rd.from_arrow_refs(
            [_concat_merge_task.remote(spec, names, si, sc, empty, *use)]
        )

    if refs and len(refs) * buckets <= MAX_EXCHANGE_FANOUT:
        split_out = [
            _split_task.options(num_returns=buckets).remote(
                r, spec.keys, buckets, spec_idx, cols
            )
            for r in refs
        ]
        merged = [
            _merge_task.remote(spec, names, empty, *[s[b] for s in split_out])
            for b in range(buckets)
        ]
        return _rd.from_arrow_refs(merged)

    # Ray Data sort-shuffle fallback (huge fanout) — and the refs-empty
    # degenerate case, where map_batches supplies the empty-result schema
    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 and empty is not None:
            return empty
        return _finalize(_pick_spec(t, spec_idx, cols), spec, names)

    if not refs:
        if empty is None:
            # fail as loudly as the schema-less-blocks case in the merge
            # tasks: silently returning a schema-less dataset would move
            # the failure to a distant downstream .sort()/column select
            raise ValueError(
                "grouped(): input produced no blocks (fully empty input) "
                "and no `empty` fallback table was supplied — pass "
                "grouped(..., empty=<final-schema empty table>)"
            )
        # a zero-block dataset runs NO map UDF, so `finish` alone cannot
        # supply the schema — the appended typed 0-row block does
        return pin_schema(
            partial.repartition(1).map_batches(
                finish, batch_format="pyarrow", batch_size=None
            ),
            empty.schema,
        )

    # partial-schema empty derived from the FINAL-schema `empty` by inverse
    # rename (agg types are preserved through the merge), so the sort-shuffle
    # fallback survives schema-less blocks exactly like the exchange paths.
    partial_empty = None
    if empty is not None:
        inv = {v: k for k, v in names.items()}
        partial_empty = empty.rename_columns(
            [inv.get(c, c) for c in empty.column_names]
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 and partial_empty is not None:
            # already per-spec (final→partial) shaped: skip _pick_spec —
            # with spec_idx set (the grouped_multi/empties path) it would
            # look for the union-schema _spec column this table lacks
            t = partial_empty
        else:
            t = _pick_spec(t, spec_idx, cols)
        return t.append_column("_bucket", _bucket_of(t, spec.keys, buckets))

    def merge_bucket(t: pa.Table) -> pa.Table:
        return _finalize(t.drop_columns(["_bucket"]), spec, names)

    out = (
        partial.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
    if empty is not None:
        # Ray skips the map UDFs entirely for empty blocks, so a fully-empty
        # input leaves this plan schema-less; one appended typed 0-row block
        # pins the final schema in every case (0 extra rows otherwise)
        out = pin_schema(out, empty.schema)
    return out


def _normalize_block(t):
    """Pandas block → metadata-free Arrow (shared by both sides of the
    group exchange): from_pandas schema metadata is unhashable and breaks
    Ray's downstream schema dedup (sort reduce warns per block)."""
    if isinstance(t, pd.DataFrame):
        return pa.Table.from_pandas(
            t, preserve_index=False
        ).replace_schema_metadata(None)
    return t


@ray.remote
def _split_group_task(t, keys: tuple[str, ...], buckets: int):
    """Map side of :func:`hash_bucket_apply`: order one block by key-hash
    bucket and scatter the ``buckets`` contiguous slices.  Blocks of
    pandas-producing upstream stages arrive as DataFrames (``to_arrow_refs``
    hands block refs through as-is) — normalize to Arrow here.  Ray also
    emits schema-LESS empty blocks (e.g. SplitBlocks over a tiny file);
    they carry no key columns, so scatter them as empties."""
    t = _normalize_block(t)
    if t.num_rows == 0:
        return [t.schema.empty_table()] * buckets
    # shared kernel with grouped()'s _split_task: bucket order + per-slice
    # dictionary encode — the group exchange carries every dedup join and
    # all per-user events ops, so string user_id / shingle key columns
    # would otherwise ship raw through the bandwidth-starved wide level
    return _order_and_slice(t, keys, buckets)


@ray.remote
def _apply_group_task(fn, empty: pa.Table | None, *shards: pa.Table) -> pa.Table:
    """Reduce side of :func:`hash_bucket_apply`: every row of a key lands
    in exactly one bucket, so ``fn`` over the concatenated shards sees the
    complete groups.  ``fn`` must accept an empty (schema-correct) table —
    some buckets are legitimately empty.  Shards from pandas-block and
    arrow-block inputs may disagree on field order — unify by name; drop
    schema-less empties (they would otherwise poison the unified schema).
    The no-split fast path (buckets == 1) feeds raw block refs here, so
    pandas blocks are normalized like on the split side."""
    parts = [
        _normalize_block(s) if isinstance(s, pd.DataFrame)
        else _decode_exchange(s)
        for s in shards
    ]
    real = [p for p in parts if p.num_columns]
    if not real:
        # every shard schema-less (fully empty exchanged dataset): the
        # bucket's result is empty by definition — return the caller's
        # schema-correct empty table when given (downstream .sort()/select
        # on named columns stays typed), else the zero-column empty
        return empty.schema.empty_table() if empty is not None else parts[0]
    return fn(pa.concat_tables(real, promote_options="default"))


def hash_bucket_apply(
    ds: Dataset,
    keys: tuple[str, ...],
    fn,
    buckets: int | None = None,
    use_exchange: bool = True,
    empty: pa.Table | None = None,
) -> Dataset:
    """Generalized bucketed-groups operator: co-locate rows by hash of
    ``keys`` and run ``fn`` (pa.Table → pa.Table) once per bucket with all
    of a key's rows present — the primitive under every hand-rolled join
    in the dedup/curation family.

    ``empty``: optional schema template for the degenerate all-empty
    exchange (a fully-empty input produces schema-LESS blocks, which a
    downstream ``.sort()``/select on named columns would reject); when
    given, empty buckets return ``empty.schema.empty_table()``.

    Two plans, same results:
    - ``use_exchange=True`` (bounded inputs — the caller gates on corpus
      size, same policy as the shingle-side cache): materialize, then the
      task-based hash exchange.  Chosen over Ray's sort-based
      ``groupby(_bucket).map_groups`` on measurement: each sort stage costs
      ~2.8 s of boundary-sampling + sort-merge machinery at sf0.1 even when
      the per-bucket compute is milliseconds — the verify join paid that
      twice per run.
    - ``use_exchange=False`` (corpus-scale inputs): the streamed sort-based
      path — no materialization, Ray owns the shuffle.
    """
    buckets = buckets or dyn_buckets(MERGE_BUCKETS)
    if use_exchange:
        mat = ds.materialize()
        refs = mat.to_arrow_refs()
        ds = mat  # past-the-fanout-cap fallback reuses the blocks rather
        # than re-executing the upstream lineage a second time
        if refs and len(refs) * buckets <= MAX_EXCHANGE_FANOUT:
            import ray.data as _rd

            if buckets == 1:  # degenerate width: no split pass needed
                return _rd.from_arrow_refs(
                    [_apply_group_task.remote(fn, empty, *refs)]
                )
            split = [
                _split_group_task.options(num_returns=buckets).remote(
                    r, keys, buckets
                )
                for r in refs
            ]
            return _rd.from_arrow_refs(
                [
                    _apply_group_task.remote(fn, empty, *[s[b] for s in split])
                    for b in range(buckets)
                ]
            )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", _bucket_of(t, keys, buckets))

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            # _decode_exchange: dictionary-typed INPUT columns (e.g. parquet
            # dictionary pages) reach fn as plain strings on the exchange
            # plan; decode here too so both plans hand fn the same types
            lambda g: fn(_decode_exchange(g.drop_columns(["_bucket"]))),
            batch_format="pyarrow",
        )
    )
    if empty is not None:
        # same schema pin as grouped()'s fallback: a fully-empty input runs
        # no UDF, so one appended typed 0-row block keeps the result typed
        out = pin_schema(out, empty.schema)
    return out


def grouped(
    ds: Dataset,
    spec: GroupSpec,
    buckets: int | None = None,
    empty: pa.Table | None = None,
) -> Dataset:
    """partial-per-block pre-aggregate → compaction combine → hash-bucketed
    exact merge → final stats columns.

    NOTE (eager execution): the upstream pipeline runs when ``grouped()`` is
    CALLED — the compacted partials are materialized here because they are
    the exchange input either way (bounded at blocks × groups rows), and the
    merge plan is picked from their actual cardinality.  Callers composing
    grouped() into larger lazy graphs should call it last.

    ``empty``: optional FINAL-schema empty table returned when every
    partial block is schema-less (Ray drops the schema of all-empty map
    outputs) — without it a fully-empty input fails the merge's group_by.
    Callers whose partial stage can legitimately produce zero rows (e.g.
    window/dup detectors on short-doc corpora) should pass it.
    """
    buckets = buckets or dyn_buckets()
    # batch_size coalesces small upstream blocks (e.g. hundreds of routed
    # per-(part,sink) files) into few large partial tasks: per-task
    # scheduling overhead, not group_by compute, dominates tiny blocks —
    # measured 1.4x scaling 2→8 cpus per-block vs near-linear coalesced
    partial = (
        ds.map_batches(
            _partial_batch,
            fn_kwargs={"spec": spec},
            batch_format="pyarrow",
            batch_size=PARTIAL_BATCH,
            zero_copy_batch=True,
        )
        .map_batches(
            _combine_partials,
            fn_kwargs={"spec": spec},
            batch_format="pyarrow",
            batch_size=COMPACT_BATCH,
        )
        .materialize()
    )
    return _exchange_merge(partial, spec, buckets, empty=empty)


@ray.remote
def _spec_counts_task(t: pa.Table, n_specs: int) -> np.ndarray:
    """Per-spec partial-row counts of one union block (for plan choice).
    Schema-less empty blocks (Ray drops the schema of all-empty map
    outputs) carry no _spec column and count as zero everywhere."""
    if "_spec" not in t.column_names:
        return np.zeros(n_specs, dtype=np.int64)
    return np.bincount(
        t.column("_spec").to_numpy(zero_copy_only=False), minlength=n_specs
    ).astype(np.int64)


def _partial_col_names(spec: GroupSpec) -> list[str]:
    cols = []
    if spec.count:
        cols.append("_ones_sum")
    cols += [f"{c}_sum" for c in spec.sum_cols]
    cols += [f"{c}_min" for c in spec.min_cols]
    cols += [f"{c}_max" for c in spec.max_cols]
    cols += [f"{c}_count" for c in spec.count_valid]
    return cols


@dataclass(frozen=True)
class UnionPlan:
    """Shared machinery for multi-spec single-scan aggregation: the union
    partial schema (``_spec`` discriminator + nulls in foreign columns) and
    the per-batch partial function.  Built once on the driver; used by
    ``grouped_multi`` and by the fused route+aggregate pass
    (pipelines/route.route_aggregate), which computes the same partials as a
    side output of the routed WRITE scan."""

    specs: tuple[GroupSpec, ...]
    union_spec: GroupSpec
    union_cols: tuple[str, ...]

    def multi_partial(self, batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:  # schema-less empty block
            return batch
        parts = [_partial_batch(batch, s) for s in self.specs]
        tmap = {}
        for p in parts:
            for f in p.schema:
                tmap.setdefault(f.name, f.type)
        outs = []
        for i, p in enumerate(parts):
            cols = {"_spec": pa.array(np.full(p.num_rows, i, dtype=np.int8))}
            for c in self.union_cols:
                cols[c] = (
                    p.column(c)
                    if c in p.column_names
                    else pa.nulls(p.num_rows, tmap[c])
                )
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)


def union_plan(specs: list[GroupSpec]) -> UnionPlan:
    union_keys = list(dict.fromkeys(k for s in specs for k in s.keys))
    union_spec = GroupSpec(
        keys=("_spec", *union_keys),
        count=any(s.count for s in specs),
        sum_cols=tuple(dict.fromkeys(c for s in specs for c in s.sum_cols)),
        min_cols=tuple(dict.fromkeys(c for s in specs for c in s.min_cols)),
        max_cols=tuple(dict.fromkeys(c for s in specs for c in s.max_cols)),
        count_valid=tuple(
            dict.fromkeys(c for s in specs for c in s.count_valid)
        ),
    )
    union_cols = tuple(union_keys) + tuple(_partial_col_names(union_spec))
    return UnionPlan(tuple(specs), union_spec, union_cols)


def merge_union_partials(
    mat: Dataset | list,
    plan: UnionPlan,
    buckets: int | None = None,
    empties: "list[pa.Table] | None" = None,
) -> list[Dataset]:
    """Final per-spec exact merges over MATERIALIZED union partials.

    ``mat`` may be a list of materialized partial Datasets (the fused
    route+aggregate produces one per commit group, plus one for resumed
    units) — their block refs are pooled; no data moves to combine them.
    ``empties``: optional FINAL-schema zero-row table per spec, so a fully
    empty input (a quiet oplog window) yields typed empty reports instead
    of the loud no-``empty``-fallback ValueError this path otherwise
    dead-ends in (review finding: the advice in that error — pass
    ``grouped(..., empty=...)`` — was impossible to follow from here)."""
    buckets = buckets or dyn_buckets()
    if isinstance(mat, (list, tuple)):
        mats = [m for m in mat if m is not None]
        if not mats:
            raise ValueError("merge_union_partials: no partial datasets")
        refs = [r for m in mats for r in m.to_arrow_refs()]
        mat = mats[0] if len(mats) == 1 else mats[0].union(*mats[1:])
    else:
        refs = mat.to_arrow_refs()
    counts = np.zeros(len(plan.specs), dtype=np.int64)
    if refs:
        counts = sum(
            ray.get(
                [_spec_counts_task.remote(r, len(plan.specs)) for r in refs]
            )
        )
    return [
        _exchange_merge(
            mat,
            spec,
            buckets,
            refs=refs,
            n_rows=int(counts[i]),
            spec_idx=i,
            cols=list(spec.keys) + _partial_col_names(spec),
            empty=empties[i] if empties is not None else None,
        )
        for i, spec in enumerate(plan.specs)
    ]


def grouped_multi(
    ds: Dataset,
    specs: list[GroupSpec],
    buckets: int | None = None,
    empties: "list[pa.Table] | None" = None,
) -> list[Dataset]:
    """N grouped aggregations from ONE scan of ``ds``.

    Round-2's bench aggregate read the routed corpus into the object store
    once (`materialize()`) so two ``grouped()`` calls could share it — a
    full-dataset materialization whose cost is pure memory bandwidth and
    scales at ~0 on a fixed box.  This fuses instead: one streaming pass
    computes EVERY spec's per-block partials (each a vectorized group_by),
    conformed to a union schema with a ``_spec`` discriminator and nulls in
    foreign columns; compaction groups by (_spec, union keys) — the union
    aggs are null-preserving per spec because arrow aggregates skip nulls —
    and only the tiny per-spec partial sets are materialized and exchanged.
    The 30M-row input never enters the object store.

    Exactness per spec is pinned against separate grouped() calls in
    tests/test_agg.py.
    """
    plan = union_plan(specs)
    mat = (
        ds.map_batches(
            plan.multi_partial,
            batch_format="pyarrow",
            batch_size=PARTIAL_BATCH,
            zero_copy_batch=True,
        )
        .map_batches(
            _combine_partials,
            fn_kwargs={"spec": plan.union_spec},
            batch_format="pyarrow",
            batch_size=COMPACT_BATCH,
        )
        .materialize()
    )
    return merge_union_partials(mat, plan, buckets, empties=empties)


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
            )
            # name-mapped, NOT positional: pyarrow's keys-first aggregate
            # column order is not contractual across versions
            ren = {"_ones_sum": "cnt", "size_sum": "total_size"}
            g = g.rename_columns([ren.get(c, c) for c in g.column_names])
            if g.num_rows > k:
                g = g.take(pc.select_k_unstable(g, k=k, sort_keys=sort_keys))
            outs.append(g)
        return pa.concat_tables(outs)

    import ray.data

    cands = ray.data.from_items([{"dir": p} for p in parts]).map_batches(
        per_part, batch_size=1, batch_format="pandas"
    )
    return topk(cands, k, sort_keys)


@ray.remote
def _topk_finish_task(
    sort_keys: list, k: int, empty: pa.Table, *parts: pa.Table
) -> pa.Table:
    """One-task exact finish over the locally-pruned candidate blocks
    (≤ blocks × k rows by construction): concat, full sort under the total
    order, head k.  Schema-less parts (Ray strips the schema of all-empty
    map outputs) are dropped; a fully-empty candidate set returns the
    caller's typed ``empty`` table."""
    tabs = [t for t in parts if t.num_columns]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs, promote_options="default")
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    return t.take(idx.slice(0, min(k, t.num_rows)))


def topk(
    ds: Dataset,
    k: int,
    sort_keys: list[tuple[str, str]],
    empty: pa.Table | None = None,
) -> Dataset:
    """Distributed deterministic top-K under a TOTAL order.

    A global ``sort().limit(k)`` range-partitions every group row; for top-K
    that is wasted shuffle.  Instead each block keeps only its local top-K
    (``pc.select_k_unstable`` — safe because the composite key is a total
    order, so there are no ties for "unstable" to scramble), leaving at most
    ``blocks × k`` rows for the final tiny sort+limit.  This is the graft of
    the reference's sort-the-accumulator-map top-K
    (IdStatisticsManager.java:100-103) that still works when the key space
    (hot conv_ids at 10^12-turn scale) dwarfs driver memory.

    ``empty`` (a typed zero-row table) opts into a single-merge-task finish
    that survives a fully-empty candidate set with the documented schema.
    The lazy ``sort().limit(k)`` plan cannot be schema-pinned: a union
    appended before OR after the limit trips Ray's ``plan_union_op``
    assertion when ``Dataset.schema()`` stacks its own ``limit(1)`` on top,
    and without a pin an all-empty input surfaces schema-less.  The task
    finish is the same exact computation (full sort of ≤ blocks × k rows,
    then head k) in one bounded task.
    """

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k=k, sort_keys=sort_keys))

    # batch_size=None: the prune must see WHOLE blocks — Ray's default
    # ~1024-row batching would keep a top-k per slice (~rows/1024 × k
    # candidates per block), defeating the documented blocks × k bound
    pruned = ds.map_batches(
        local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    if empty is not None:
        import ray.data as _rd

        refs = pruned.to_arrow_refs()
        return _rd.from_arrow_refs(
            [_topk_finish_task.remote(sort_keys, k, empty, *refs)]
        )
    cols = [s[0] for s in sort_keys]
    desc = [s[1] == "descending" for s in sort_keys]
    return pruned.sort(cols, descending=desc).limit(k)
