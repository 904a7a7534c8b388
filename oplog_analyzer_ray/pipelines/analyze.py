"""Analyze-phase reports (SURVEY.md §2.6 A10-A13, §2.2 M6).

Grafts AnalyzeCommand's offline report computations.  The heavy part (the
per-(shard, ns, op) aggregates) reuses the partial-preaggregated grouped()
pipeline; the classifications and skew comparisons are driver-side maps over
those SMALL aggregate results — exactly the reference's shape (HashMap
post-processing, AnalyzeCommand.java:377-394) but fed by a distributed
aggregate instead of a single-threaded file scan.

"shard" in the graft = the namespace's db-half (``bucketN``), the unit the
reference compares workloads across (AnalyzeCommand.java:87-101).
Thresholds preserved exactly: avg>2000 bytes → high-impact group
(AnalyzeCommand.java:405-437); ±20% deviation outliers and ≥2x avg-size
ratio recommendation (AnalyzeCommand.java:486-507,590-626).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .agg import GroupSpec, grouped
from .core import _mask_batches, _ok, event_dataset


def _shard_of(ns_col):
    return pc.list_element(pc.split_pattern(ns_col, "."), 0)


def shard_workloads(sf_dir: str) -> Dataset:
    """A10 + A12: per-shard totals and the impact/frequency grouping."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    ev = ev.map_batches(
        lambda t: pa.table(
            {"shard": _shard_of(t.column("ns")), "size": t.column("size")}
        ),
        batch_format="pyarrow",
    )
    g = grouped(ev, GroupSpec(keys=("shard",), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt")
        total = pc.cast(t.column("sum_size"), pa.int64())
        avg = pc.divide(total, cnt)
        return pa.table(
            {
                "shard": t.column("shard"),
                "total_ops": cnt,
                "total_bytes": total,
                "avg_bytes_per_op": avg,
                "workload_group": pc.if_else(
                    pc.greater(avg, 2000), "high-impact", "high-frequency"
                ),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["shard"])


def shard_skew(sf_dir: str) -> pa.Table:
    """A13: cross-shard deviation report.  The input is the tiny A10 result,
    so the comparison itself is a driver-side vectorized pass."""
    w = shard_workloads(sf_dir).to_pandas()
    aops = w["total_ops"].astype("float64").mean()
    abytes = w["total_bytes"].astype("float64").mean()
    ops_dev = (w["total_ops"] - aops) / aops * 100.0
    bytes_dev = (w["total_bytes"] - abytes) / abytes * 100.0
    import numpy as np

    out = pa.table(
        {
            "shard": pa.array(w["shard"], pa.string()),
            "total_ops": pa.array(w["total_ops"], pa.int64()),
            "total_bytes": pa.array(w["total_bytes"], pa.int64()),
            "ops_dev_pct": pa.array(np.floor(ops_dev * 1e6) / 1e6, pa.float64()),
            "bytes_dev_pct": pa.array(np.floor(bytes_dev * 1e6) / 1e6, pa.float64()),
            "outlier": pa.array(
                (ops_dev.abs() > 20.0) | (bytes_dev.abs() > 20.0), pa.bool_()
            ),
        }
    )
    return out


def skew_recommendation(sf_dir: str) -> dict:
    """A13's recommendation trigger: max/min avg-size ratio >= 2 across
    shards → review advised.  Driver-side scalar report (not oracle-checked;
    consumed by the CLI analyze report)."""
    w = shard_workloads(sf_dir).to_pandas()
    avg = w["avg_bytes_per_op"]
    ratio = float(avg.max()) / max(float(avg.min()), 1.0)
    return {
        "avg_size_ratio": round(ratio, 3),
        "recommend_review": bool(ratio >= 2.0),
        "n_outliers": int(shard_skew(sf_dir).column("outlier").to_pandas().sum()),
    }


def redacted_summaries(sf_dir: str) -> Dataset:
    """M6: payload redaction — replace update/command payloads with a
    '<doc: N fields, M elements, K bytes>' summary column
    (TailCommand.java:1179-1254's debug redactor as a projection stage)."""
    ev = _mask_batches(
        event_dataset(sf_dir),
        lambda t: pc.and_(
            pc.is_in(t.column("op_class"), value_set=pa.array(["u", "c"])),
            pc.equal(t.column("event_seq"), 0),
        ),
    )

    def redact(t: pa.Table) -> pa.Table:
        summary = pc.binary_join_element_wise(
            "<doc: ",
            pc.cast(t.column("diff_fields"), pa.string()),
            " fields, ",
            pc.cast(t.column("total_elements"), pa.string()),
            " elements, ",
            pc.cast(t.column("size"), pa.string()),
            " bytes>",
            "",
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "summary": summary,
            }
        )

    return ev.map_batches(redact, batch_format="pyarrow").sort(
        ["conv_id", "turn_idx"]
    )
