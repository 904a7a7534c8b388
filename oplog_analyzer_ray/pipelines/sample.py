"""Key-follow sampling (SURVEY.md §2.4 ST3, §2.5 J5).

Grafts the reference's ``sample`` command: per (shard, ns) it records the
first ``idSampleSize`` distinct ids seen and then keeps only records whose id
is in that membership set (SampleCommand.java:54-55,73,275-290).  "First K
distinct" is arrival-order-dependent there; per SURVEY.md §7.5 we replace it
with the deterministic **min-K by (first-seen ts, conv_id)** — same
cardinality semantics, reproducible under any execution order.

Two phases:
1. membership: grouped() min-ts per (ns, conv_id) → per-ns min-K entirely
   inside the dataset (each block keeps its local K smallest per ns, so at
   most blocks × ns × K rows survive the prune); only that pruned
   micro-table — never the full distinct (ns, conv_id) grain — reaches the
   driver for the final K-selection.
2. follow: broadcast the membership set via ``ray.put`` and semi-join the
   event stream with a vectorized ``pc.is_in`` on the composite key — no
   shuffle of the event stream at all (J5's broadcast semi-join).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .agg import GroupSpec, grouped
from .core import _mask_batches, _ok, event_dataset

SAMPLE_K = 5  # ids followed per ns (the --idSampleSize analogue)


def _key(ns_col, conv_col):
    return pc.binary_join_element_wise(ns_col, conv_col, "::")


def sample_membership(sf_dir: str, k: int = SAMPLE_K) -> pa.Table:
    """Per ns: the K distinct conv_ids with smallest (first_ts, conv_id).

    The distinct grain stays distributed: grouped() emits one (ns, conv_id,
    min_ts) row per key spread over its merge buckets, and a per-block
    min-K prune (the same idea as agg.topk, but per ns) cuts that to at
    most blocks × ns × K rows before anything is collected."""

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ns", "min_ts", "conv_id"], kind="mergesort")
        return df.groupby("ns", sort=False).head(k)

    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(ev, GroupSpec(keys=("ns", "conv_id"), count=False, min_cols=("ts",)))
    pruned = g.map_batches(local_prune, batch_format="pandas").to_pandas()
    member = (
        local_prune(pruned)
        .rename(columns={"min_ts": "first_ts"})
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        member[["ns", "conv_id", "first_ts"]],
        schema=pa.schema(
            [("ns", pa.string()), ("conv_id", pa.string()),
             ("first_ts", pa.timestamp("us"))]
        ),
        preserve_index=False,
    )


def sampled_events(sf_dir: str, k: int = SAMPLE_K) -> Dataset:
    """The followed sample: every event whose (ns, conv_id) is a member."""
    member = sample_membership(sf_dir, k)
    keys = _key(member.column("ns"), member.column("conv_id"))
    keys_ref = ray.put(keys.combine_chunks() if hasattr(keys, "combine_chunks") else keys)

    def follow(t: pa.Table) -> pa.Table:
        vs = ray.get(keys_ref)
        mask = pc.is_in(_key(t.column("ns"), t.column("conv_id")), value_set=vs)
        return t.filter(mask).select(
            ["conv_id", "turn_idx", "event_seq", "ns", "op_class", "size"]
        )

    ev = _mask_batches(event_dataset(sf_dir), _ok)
    return ev.map_batches(follow, batch_format="pyarrow").sort(
        ["conv_id", "turn_idx", "event_seq"]
    )
