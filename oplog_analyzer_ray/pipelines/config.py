"""Declarative pipeline builder — the engine's user-extension surface
(SURVEY.md §2.11).

The reference's only extension point is a new picocli subcommand sharing
``BaseOplogCommand`` (OplogAnalyzer.java:11-13); here a pipeline is data: an
ordered list of step dicts compiled onto a ``ray.data.Dataset``.  Each step
maps to a vectorized stage, so user pipelines compose from the same audited
operators the built-in queries use.

Supported steps (args in ``{}``):
  {"op": "parse"}                      parse/classify/flatten (M1-M5, F1)
  {"op": "enrich"}                     actor-pool lookup enrichment (ST1/J2)
  {"op": "drop_text"}                  payload-column prune
  {"op": "filter_ops",  "values": [..]}        F3 op-class allow-list
  {"op": "filter_ns",   "prefix": "bucket3."}  F2 namespace allow-list
  {"op": "filter_size", "min": 0, "max": 1<<30} F4 size range
  {"op": "filter_time", "gte": datetime}        F7 time range
  {"op": "exclude_rejects"}            drop op_class 'x' rows
  {"op": "select", "columns": [...]}   projection
  {"op": "limit", "n": N}              F9
  {"op": "group_stats", "keys": [..],  A1-A4 grouped stats through the
   "sum": [..], "min": [..],           partial-preaggregated grouped()
   "max": [..], "count": true}         engine (never Ray's per-key reduce)
  {"op": "topk", "k": N,               A5/A6 distributed top-K
   "sort": [["cnt", "descending"], ...]}

``build_pipeline(sf_dir, steps)`` starts from the transcript source; pass an
existing Dataset via ``source=`` to compose onto anything else.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..stages.enrich import EnrichStage, put_lookups
from ..stages.parse import parse_classify
from .core import ENRICH_CONCURRENCY, _mask_batches, read_transcripts


def _filter_step(ds: Dataset, mask_fn) -> Dataset:
    return _mask_batches(ds, mask_fn)


def build_pipeline(
    sf_dir: str | None,
    steps: list[dict],
    source: Dataset | None = None,
) -> Dataset:
    if source is None:
        if sf_dir is None:
            raise ValueError("need sf_dir or source")
        ds = read_transcripts(sf_dir)
    else:
        ds = source
    for step in steps:
        op = step["op"]
        if op == "parse":
            ds = ds.map_batches(
                parse_classify, batch_format="pyarrow", zero_copy_batch=True
            )
        elif op == "enrich":
            ds = ds.map_batches(
                EnrichStage,
                fn_constructor_kwargs={"lookups_ref": put_lookups()},
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=ENRICH_CONCURRENCY(),
            )
        elif op == "drop_text":
            ds = ds.map_batches(
                lambda t: t.drop_columns(["text"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        elif op == "filter_ops":
            vals = pa.array(step["values"])
            ds = _filter_step(
                ds, lambda t, v=vals: pc.is_in(t.column("op_class"), value_set=v)
            )
        elif op == "filter_ns":
            pfx = step["prefix"]
            ds = _filter_step(
                ds, lambda t, p=pfx: pc.starts_with(t.column("ns"), p)
            )
        elif op == "filter_size":
            lo, hi = step.get("min", 0), step.get("max", 1 << 62)
            ds = _filter_step(
                ds,
                lambda t, lo=lo, hi=hi: pc.and_(
                    pc.greater_equal(t.column("size"), lo),
                    pc.less_equal(t.column("size"), hi),
                ),
            )
        elif op == "filter_time":
            bound = pa.scalar(step["gte"], pa.timestamp("us"))
            ds = _filter_step(
                ds, lambda t, b=bound: pc.greater_equal(t.column("ts"), b)
            )
        elif op == "exclude_rejects":
            ds = _filter_step(
                ds, lambda t: pc.not_equal(t.column("op_class"), "x")
            )
        elif op == "select":
            cols = step["columns"]
            ds = ds.map_batches(
                lambda t, c=cols: t.select(c),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        elif op == "limit":
            ds = ds.limit(step["n"])
        elif op == "group_stats":
            from .agg import GroupSpec, grouped

            ds = grouped(
                ds,
                GroupSpec(
                    keys=tuple(step["keys"]),
                    count=step.get("count", True),
                    sum_cols=tuple(step.get("sum", ())),
                    min_cols=tuple(step.get("min", ())),
                    max_cols=tuple(step.get("max", ())),
                    count_valid=tuple(step.get("count_valid", ())),
                ),
            )
        elif op == "topk":
            from .agg import topk

            ds = topk(
                ds, step["k"], [(c, d) for c, d in step["sort"]]
            )
        else:
            raise ValueError(f"unknown pipeline step: {op!r}")
    return ds
