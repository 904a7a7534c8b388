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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..stages.parse import parse_classify
from ..state.shardkeys import shard_key_lookup
from ..synth import ensure_transcripts
from .agg import GroupSpec, grouped
from .core import _mask_batches, _ok, event_dataset
from .route import _add_part


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


def update_freq_by_shard(sf_dir: str) -> pa.Table:
    """A14 second level (AnalyzeCommand.java:628-703 analyzeIdAcrossShards):
    per update-namespace, compare each SOURCE SHARD's update activity to the
    namespace's cluster average.  The graft's source shard is the input
    ``part`` file — each part is one shard's stream, exactly the reference's
    extractShardIdFromFileName contract (AnalyzeCommand.java:536-549).

    Distributed shape: two grouped() levels — (ns, part, conv_id) partials
    give per-id update counts, then (ns, part) over those gives total ops /
    bytes / unique-id counts.  Only the tiny (ns × parts) grain reaches the
    driver, where the cluster-average comparison runs (the reference's
    HashMap post-processing, same placement as shard_skew)."""

    def keep_updates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("op_class"), "u"))
        return t.select(["ns", "part", "conv_id", "size"])

    ds = ray.data.read_parquet(ensure_transcripts(sf_dir), include_paths=True)
    ds = (
        ds.map_batches(_add_part, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(parse_classify, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(keep_updates, batch_format="pyarrow", zero_copy_batch=True)
    )
    per_id = grouped(
        ds, GroupSpec(keys=("ns", "part", "conv_id"), sum_cols=("size",))
    )
    per_shard = grouped(
        per_id, GroupSpec(keys=("ns", "part"), sum_cols=("cnt", "sum_size"))
    )
    w = per_shard.to_pandas()  # ns × parts rows — tiny at any corpus size
    w = w.rename(
        columns={
            "part": "shard",
            "cnt": "unique_ids",
            "sum_cnt": "total_updates",
            "sum_sum_size": "total_bytes",
        }
    )
    # cluster averages per namespace (mirrored bit-exactly in the oracle SQL:
    # identical expressions over exact int64 inputs)
    cl = w.groupby("ns").agg(
        ns_ops=("total_updates", "sum"),
        ns_bytes=("total_bytes", "sum"),
        n_shards=("shard", "count"),
    )
    w = w.join(cl, on="ns")
    aops = w["ns_ops"].astype("float64") / w["n_shards"]
    abpo = w["ns_bytes"].astype("float64") / w["ns_ops"]
    spo = w["total_bytes"].astype("float64") / w["total_updates"]
    ops_dev = (w["total_updates"] - aops) / aops * 100.0
    size_dev = (spo - abpo) / abpo * 100.0
    w = w.sort_values(["ns", "shard"], kind="mergesort")
    order = w.index
    return pa.table(
        {
            "ns": pa.array(w["ns"], pa.string()),
            "shard": pa.array(w["shard"], pa.string()),
            "total_updates": pa.array(w["total_updates"], pa.int64()),
            "total_bytes": pa.array(w["total_bytes"], pa.int64()),
            "unique_ids": pa.array(w["unique_ids"], pa.int64()),
            "avg_size_per_op": pa.array(
                np.floor(spo[order] * 1e6) / 1e6, pa.float64()
            ),
            "ops_dev_pct": pa.array(
                np.floor(ops_dev[order] * 1e6) / 1e6, pa.float64()
            ),
            "size_dev_pct": pa.array(
                np.floor(size_dev[order] * 1e6) / 1e6, pa.float64()
            ),
            "outlier": pa.array(
                (ops_dev[order].abs() > 20.0) | (size_dev[order].abs() > 20.0),
                pa.bool_(),
            ),
        }
    )


def shard_key_recommendations(sf_dir: str) -> list[dict]:
    """AnalyzeCommand.java:523-532: for every sharded namespace whose
    collection pattern is 'heavy-updates', flag that the current shard key
    may not distribute large documents evenly.  Consumes the shard-key
    catalog (state/shardkeys.py — the config.collections graft) joined
    against the tiny collection_patterns aggregate, driver-side."""
    from .core import collection_patterns

    keys = shard_key_lookup()
    recs = []
    for r in collection_patterns(sf_dir).to_pandas().itertuples():
        info = keys.get(r.ns)
        if info is not None and r.pattern == "heavy-updates":
            recs.append(
                {
                    "ns": r.ns,
                    "key_fields": info["key_fields"],
                    "is_hashed": info["is_hashed"],
                    "recommendation": (
                        f"Current key {info['key_fields']} may not "
                        "distribute large docs evenly"
                    ),
                }
            )
    return recs


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


# M6 full contract: the reference's redactor FIRST strips transaction
# bookkeeping fields (lsid/uid/txnNumber/stmtId/prevOpTime,
# TailCommand.java:1188-1193) and then replaces each payload field in place
# with a summary token (1223-1254), returning the redacted DOCUMENT.  The
# transcript analogues: [note:...] tokens are the bookkeeping clutter
# (counted in total_elements, never ops) and [tool:x] tokens are the payload
# fields.  Same RE2 regexes on both sides (pyarrow and DuckDB).
NOTE_TOKEN_STRIP = r"\[note:[^\]]*\] "
TOOL_TOKEN_SUMMARY = (r"\[tool:([a-z]+)\]", r"<op:\1>")


def redacted_docs(sf_dir: str) -> Dataset:
    """M6 detail path: the redacted document text itself — bookkeeping
    tokens dropped, payload tokens replaced by in-place summaries."""
    ev = _mask_batches(
        event_dataset(sf_dir, with_text=True),
        lambda t: pc.and_(
            pc.is_in(t.column("op_class"), value_set=pa.array(["u", "c"])),
            pc.equal(t.column("event_seq"), 0),
        ),
    )

    def redact(t: pa.Table) -> pa.Table:
        txt = pc.replace_substring_regex(
            t.column("text"), NOTE_TOKEN_STRIP, ""
        )
        txt = pc.replace_substring_regex(txt, *TOOL_TOKEN_SUMMARY)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "redacted_text": txt,
            }
        )

    return ev.map_batches(redact, batch_format="pyarrow").sort(
        ["conv_id", "turn_idx"]
    )
