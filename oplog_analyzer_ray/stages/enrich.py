"""Stateful actor-pool enrichment stage (SURVEY.md §2.4 ST1, §2.5 J1/J2).

Grafts the reference's lookup-join machinery — the ``fetchDocSizes`` batched
point-lookup (TailCommand.java:398-463) and the implicit classification maps
(BaseOplogCommand.java:97) — into the idiomatic Ray Data shape: a callable
CLASS passed to ``map_batches(EnrichStage, concurrency=N)``.  The small side
(tool→category, op_class→sink lookup tables) is broadcast ONCE via
``ray.put`` on the driver; each actor resolves the object ref in
``__init__`` (one fetch per actor, not per batch) and pre-builds Arrow
key/value arrays so the per-batch join is a vectorized ``pc.index_in`` +
``pc.take`` with an explicit fallback slot — mirroring the reference's
fallback-to-oplog-size on lookup miss (TailCommand.java:447).

At cluster scale this is the broadcast-join pattern: the lookup table ships
through the object store once per node, never per batch, and no shuffle is
needed for the join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..schema import (
    OP_SINKS,
    TOOL_CATEGORIES,
    TOOL_CATEGORY_FALLBACK,
    TOOL_DOC_SIZES,
)


def default_lookups() -> dict[str, dict]:
    """The enrichment tables; tiny, but broadcast like any small join side."""
    return {
        "tool_categories": dict(TOOL_CATEGORIES),
        "op_sinks": dict(OP_SINKS),
        "tool_doc_sizes": dict(TOOL_DOC_SIZES),
    }


def put_lookups(lookups: dict | None = None) -> "ray.ObjectRef":
    """Driver-side: place the lookup tables in the object store once."""
    return ray.put(lookups or default_lookups())


class _ArrowLookup:
    """dict[str,str] compiled to Arrow arrays for vectorized join-with-fallback."""

    def __init__(self, mapping: dict[str, str], fallback: str):
        self.keys = pa.array(list(mapping.keys()), pa.string())
        # one extra slot at the end = the fallback value for misses
        self.vals = pa.array(list(mapping.values()) + [fallback], pa.string())
        self.miss_index = len(mapping)

    def take(self, arr: pa.ChunkedArray) -> pa.ChunkedArray:
        idx = pc.index_in(arr, value_set=self.keys)
        return pc.take(self.vals, pc.fill_null(idx, self.miss_index))


# per-worker-process cache for the task-based variant: the broadcast ref is
# resolved once per worker (same cost profile as the actor __init__), and
# warm worker processes are REUSED across jobs — unlike actors, which spawn
# fresh processes per Dataset and pay import+startup on every short job.
_TASK_CACHE: dict[int, "EnrichStage"] = {}


def make_enrich_fn(lookups_ref=None):
    """Task-based enrichment with per-worker cached state.

    Functionally identical to the ``EnrichStage`` actor pool (same broadcast
    lookup tables, same vectorized join); use this for short jobs where
    actor-pool spawn latency would dominate, and the actor pool for
    long-running pipelines that want explicit pool sizing."""

    def enrich(batch: pa.Table) -> pa.Table:
        key = id(lookups_ref) if lookups_ref is not None else 0
        stage = _TASK_CACHE.get(key)
        if stage is None:
            stage = EnrichStage(lookups_ref)
            _TASK_CACHE.clear()  # at most one lookup set per worker
            _TASK_CACHE[key] = stage
        return stage(batch)

    return enrich


class EnrichStage:
    """Adds ``category`` (tool join) and ``sink`` (op_class routing key).

    Usage::

        ref = put_lookups()                       # once, on the driver
        ds.map_batches(EnrichStage, fn_constructor_kwargs={"lookups_ref": ref},
                       batch_format="pyarrow", concurrency=(1, 8))
    """

    def __init__(self, lookups_ref=None):
        lookups = ray.get(lookups_ref) if lookups_ref is not None else default_lookups()
        self._cat = _ArrowLookup(lookups["tool_categories"], TOOL_CATEGORY_FALLBACK)
        self._sink = _ArrowLookup(lookups["op_sinks"], "rejects")
        sizes = lookups["tool_doc_sizes"]
        self._size_keys = pa.array(list(sizes.keys()), pa.string())
        # miss slot is NULL: the reference's -1 unknown-doc-size sentinel
        # becomes an Arrow null (TailCommand.java:176-181)
        self._size_vals = pa.array(list(sizes.values()) + [None], pa.int64())
        self._size_miss = len(sizes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.append_column("category", self._cat.take(batch.column("tool")))
        batch = batch.append_column("sink", self._sink.take(batch.column("op_class")))
        idx = pc.index_in(batch.column("tool"), value_set=self._size_keys)
        doc_size = pc.take(self._size_vals, pc.fill_null(idx, self._size_miss))
        return batch.append_column("doc_size", doc_size)
