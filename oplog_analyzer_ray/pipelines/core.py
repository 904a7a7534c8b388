"""Core transcript pipelines: read → parse → enrich → aggregate/route.

Each public function is one query from the driver contract
(``__ray_entry__.queries()``), matched 1:1 by oracle SQL in ``oracle.py``.
All column names are identical on both sides (driver hashes values under
sorted column names).

Shape (SURVEY.md §3.4): ``read_parquet`` (column-pruned) →
``map_batches(parse_classify, batch_format="pyarrow")`` (stateless tasks) →
broadcast-lookup enrichment (task variant with per-worker cached state by
default; ``EnrichStage`` actor pool via ``use_actors=True``) →
partial-preaggregated groupbys (pipelines/agg.py) / per-sink routing.
Filters are vectorized pyarrow masks inside ``map_batches`` — never
row-by-row ``Dataset.filter(fn)``.  The parsed event Dataset is
materialized once per session and shared across queries.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Sum

from ..stages.enrich import EnrichStage, make_enrich_fn, put_lookups
from ..stages.parse import parse_classify
from ..synth import ensure_transcripts
from .agg import GroupSpec, grouped, topk

def ENRICH_CONCURRENCY() -> tuple[int, int]:
    """Actor-pool width for the enrichment stage: pre-start half the
    cluster's CPUs (autoscaling from 1 wastes several seconds of ramp-up on
    short jobs) and autoscale up to the full count, leaving headroom for the
    downstream write tasks.  Sized at call time, not import time."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (max(2, cpus // 2), max(4, cpus))


# ------------------------------------------------------------------ sources
def read_transcripts(sf_dir: str) -> Dataset:
    """S1/S3: parquet scan over the (generated-once) transcript shards."""
    path = ensure_transcripts(sf_dir)
    return ray.data.read_parquet(path)


# parsed-event cache: (sf_dir, with_text) -> materialized Dataset, valid for
# one Ray session (job id).  The driver and the test session run MANY queries
# over the same corpus; re-running read+parse+enrich per query would be the
# single biggest cost of the whole contract.  Objects live in the object
# store (spillable); cache is invalidated when the Ray session changes.
_EVENT_CACHE: dict = {}


def _session_token() -> str:
    return ray.get_runtime_context().get_job_id() if ray.is_initialized() else ""


# materializing the parsed events pins ~corpus-size in the (spillable)
# object store; right for a many-query sweep over a small corpus, wrong for
# a 100 TB one.  Gate on the on-disk corpus size (env-overridable).
# int(float(...)) so scientific notation ("8e9") works in the env override,
# matching the sibling gates (agg.EXCHANGE_GATE / dedup.CHAIN_CACHE)
EVENT_CACHE_MAX_BYTES = int(
    float(__import__("os").environ.get("OPLOG_EVENT_CACHE_MAX_BYTES", 8e9))
)


def _corpus_bytes(sf_dir: str) -> int:
    import os

    d = ensure_transcripts(sf_dir)
    return sum(
        e.stat().st_size for e in os.scandir(d) if e.name.endswith(".parquet")
    )


def event_dataset(
    sf_dir: str, with_text: bool = False, use_actors: bool = False
) -> Dataset:
    key = (sf_dir, with_text, use_actors, _session_token())
    cached = _EVENT_CACHE.get(key)
    if cached is not None:
        return cached
    ds = _event_dataset_uncached(sf_dir, with_text, use_actors)
    if _corpus_bytes(sf_dir) > EVENT_CACHE_MAX_BYTES:
        return ds  # too big to pin: stream it, let each query re-scan
    ds = ds.materialize()
    while len(_EVENT_CACHE) > 4:  # keep at most a few corpora pinned —
        # evict OLDEST only (insertion order): clearing everything would
        # also drop the active corpus's sibling with_text/actor variants
        # and re-pay the full read+parse+enrich pass per following query
        _EVENT_CACHE.pop(next(iter(_EVENT_CACHE)))
    _EVENT_CACHE[key] = ds
    return ds


def _event_dataset_uncached(
    sf_dir: str, with_text: bool = False, use_actors: bool = False
) -> Dataset:
    """parse/classify/flatten + broadcast-lookup enrichment → event rows.

    ``with_text=False`` drops the wide ``text`` column immediately after
    parse so aggregation pipelines never shuffle or spill payload bytes.

    Enrichment state (the broadcast lookup tables) is loaded once per worker
    either way; ``use_actors=True`` runs it as an explicit actor pool
    (``EnrichStage``), the default runs it as tasks with per-worker cached
    state — identical semantics, but tasks reuse warm worker processes, so
    short jobs skip the actor-pool spawn latency.
    """
    ds = read_transcripts(sf_dir)
    ds = ds.map_batches(parse_classify, batch_format="pyarrow", zero_copy_batch=True)
    if not with_text:
        ds = ds.map_batches(
            lambda t: t.drop_columns(["text"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ref = put_lookups()
    if use_actors:
        return ds.map_batches(
            EnrichStage,
            fn_constructor_kwargs={"lookups_ref": ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=ENRICH_CONCURRENCY(),
        )
    return ds.map_batches(
        make_enrich_fn(ref), batch_format="pyarrow", zero_copy_batch=True
    )


def _mask_batches(ds: Dataset, mask_fn) -> Dataset:
    """Vectorized filter: mask_fn(pa.Table) -> boolean array."""
    return ds.map_batches(
        lambda t: t.filter(mask_fn(t)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _ok(t: pa.Table):
    return pc.not_equal(t.column("op_class"), "x")


# ------------------------------------------------------------------ queries
def sink_counts(sf_dir: str) -> Dataset:
    """A1/A4/A8: per-(sink,ns,op_class) count/total/min/max/avg — the
    exact-match north-rule target (EntryAccumulator.java:41-71)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(
        ev,
        GroupSpec(
            keys=("sink", "ns", "op_class"),
            sum_cols=("size",),
            min_cols=("size",),
            max_cols=("size",),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        total = t.column("sum_size")
        cnt = t.column("cnt")
        return pa.table(
            {
                "sink": t.column("sink"),
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "cnt": cnt,
                "total": total,
                "min_size": t.column("min_size"),
                "max_size": t.column("max_size"),
                # integer floor division, matching SUM(size) // COUNT(*)
                "avg_size": pc.divide(total, cnt),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(
        ["total", "ns", "op_class"], descending=[True, False, False]
    )


def bucket_histogram(sf_dir: str) -> Dataset:
    """A2: threshold-bucket histogram via pre-computed gt_* columns."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(
        ev, GroupSpec(keys=("ns", "op_class"), sum_cols=("gt_512", "gt_4096"))
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "cnt": t.column("cnt"),
                "cnt_gt_512": t.column("sum_gt_512"),
                "cnt_gt_4096": t.column("sum_gt_4096"),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["ns", "op_class"])


def hot_keys_topk(sf_dir: str, k: int = 20) -> Dataset:
    """A5/A6: hot-conversation stats, top-K by count desc, deterministic
    tie-break (ns, conv_id) (IdStatisticsManager.java:100-103 graft)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(
        ev,
        GroupSpec(
            keys=("ns", "conv_id"),
            sum_cols=("size",),
            min_cols=("size",),
            max_cols=("size",),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "cnt": t.column("cnt"),
                "total_size": t.column("sum_size"),
                "min_size": t.column("min_size"),
                "max_size": t.column("max_size"),
            }
        )

    return topk(
        g.map_batches(post, batch_format="pyarrow"),
        k,
        [("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")],
    )


def events_flatten(sf_dir: str) -> Dataset:
    """M4: the exploded inner tool-invocation events (applyOps analogue)."""
    ev = _mask_batches(
        event_dataset(sf_dir), lambda t: pc.greater(t.column("event_seq"), 0)
    )
    return ev.map_batches(
        lambda t: t.select(
            ["conv_id", "turn_idx", "event_seq", "ns", "op_class", "size", "tool"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["conv_id", "turn_idx", "event_seq"])


def rejects(sf_dir: str) -> Dataset:
    """F10: parse-failure rows routed to the reject sink."""
    ev = _mask_batches(
        event_dataset(sf_dir), lambda t: pc.equal(t.column("op_class"), "x")
    )
    return ev.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "ns", "size"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["conv_id", "turn_idx"])


def global_scalars(sf_dir: str) -> pd.DataFrame:
    """A9: global counters (total events/bytes, largest event, distinct convs)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    slim = ev.map_batches(
        lambda t: t.select(["conv_id", "size"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = slim.aggregate(Count(), Sum("size"), Max("size"))
    # distinct conv count via the bucketed exact merge (NOT Ray's per-key
    # groupby reduce); distinct = row count of the grouped result
    n_convs = grouped(slim, GroupSpec(keys=("conv_id",), count=False)).count()
    return pd.DataFrame(
        {
            "n_events": [agg["count()"]],
            "total_bytes": [agg["sum(size)"]],
            "max_size": [agg["max(size)"]],
            "n_convs": [n_convs],
        }
    )


def diff_stats(sf_dir: str) -> Dataset:
    """M5/A3: update-diff statistics over parent update/command rows.

    Averages follow the reference's positive-only semantics
    (EntryAccumulator.java:56-63: ``documentsWithDiff``/``WithElements``
    increment only when the count is > 0, so zero-diff docs are excluded
    from the denominators; empty denominators → null, the 'N/A' analogue)."""
    ev = _mask_batches(
        event_dataset(sf_dir),
        lambda t: pc.and_(
            pc.is_in(t.column("op_class"), value_set=pa.array(["u", "c"])),
            pc.equal(t.column("event_seq"), 0),
        ),
    )

    def precols(t: pa.Table) -> pa.Table:
        has_d = pc.greater(pc.fill_null(t.column("diff_fields"), 0), 0)
        has_e = pc.greater(pc.fill_null(t.column("total_elements"), 0), 0)
        return pa.table(
            {
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "diff_fields": t.column("diff_fields"),
                "total_elements": t.column("total_elements"),
                "has_diff": pc.cast(has_d, pa.int64()),
                "has_elements": pc.cast(has_e, pa.int64()),
            }
        )

    g = grouped(
        ev.map_batches(precols, batch_format="pyarrow"),
        GroupSpec(
            keys=("ns", "op_class"),
            count=False,
            sum_cols=("diff_fields", "total_elements", "has_diff", "has_elements"),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        sum_d = pc.cast(t.column("sum_diff_fields"), pa.float64())
        sum_e = pc.cast(t.column("sum_total_elements"), pa.float64())
        n_d = pc.cast(t.column("sum_has_diff"), pa.float64())
        n_e = pc.cast(t.column("sum_has_elements"), pa.float64())
        null_f = pa.scalar(None, pa.float64())
        trunc = lambda x: pc.divide(pc.floor(pc.multiply(x, 1e6)), 1e6)  # noqa: E731
        return pa.table(
            {
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "sum_diff_fields": pc.cast(t.column("sum_diff_fields"), pa.int64()),
                "sum_total_elements": pc.cast(
                    t.column("sum_total_elements"), pa.int64()
                ),
                "docs_with_diff": pc.cast(t.column("sum_has_diff"), pa.int64()),
                "docs_with_elements": pc.cast(
                    t.column("sum_has_elements"), pa.int64()
                ),
                "avg_diff_fields": pc.if_else(
                    pc.greater(n_d, 0.0), trunc(pc.divide(sum_d, n_d)), null_f
                ),
                "avg_elements": pc.if_else(
                    pc.greater(n_e, 0.0), trunc(pc.divide(sum_e, n_e)), null_f
                ),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["ns", "op_class"])


def category_counts(sf_dir: str) -> Dataset:
    """J2: enrichment-join rollup per (category, sink)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(ev, GroupSpec(keys=("category", "sink"), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "category": t.column("category"),
                "sink": t.column("sink"),
                "cnt": t.column("cnt"),
                "total": t.column("sum_size"),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(
        ["cnt", "category", "sink"], descending=[True, False, False]
    )


def per_shard_stats(sf_dir: str) -> Dataset:
    """A8: per-(ns,op) stats restricted to data namespaces (bucket*)."""
    ev = _mask_batches(
        event_dataset(sf_dir),
        lambda t: pc.and_(_ok(t), pc.starts_with(t.column("ns"), "bucket")),
    )
    g = grouped(ev, GroupSpec(keys=("ns", "op_class"), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "op_class": t.column("op_class"),
                "cnt": t.column("cnt"),
                "total": t.column("sum_size"),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["ns", "op_class"])


def update_freq(sf_dir: str) -> Dataset:
    """A14: per-ns update frequency — two-level aggregate: first collapse to
    (ns, conv_id) [the hot-key grain], then roll up to ns.  COUNT DISTINCT
    becomes "count rows of the first level" — no distinct shuffle needed."""
    ev = _mask_batches(
        event_dataset(sf_dir), lambda t: pc.equal(t.column("op_class"), "u")
    )
    lvl1 = grouped(ev, GroupSpec(keys=("ns", "conv_id"), sum_cols=("size",)))
    lvl2 = grouped(
        lvl1.map_batches(
            lambda t: pa.table(
                {
                    "ns": t.column("ns"),
                    "upd": t.column("cnt"),
                    "bytes": t.column("sum_size"),
                }
            ),
            batch_format="pyarrow",
        ),
        GroupSpec(keys=("ns",), sum_cols=("upd", "bytes")),
    )

    def post(t: pa.Table) -> pa.Table:
        tot = pc.cast(t.column("sum_upd"), pa.int64())
        uniq = t.column("cnt")
        return pa.table(
            {
                "ns": t.column("ns"),
                "total_updates": tot,
                "unique_ids": uniq,
                "updates_per_id": pc.divide(
                    pc.cast(tot, pa.float64()), pc.cast(uniq, pa.float64())
                ),
                "total_bytes": pc.cast(t.column("sum_bytes"), pa.int64()),
            }
        )

    return lvl2.map_batches(post, batch_format="pyarrow").sort(
        ["total_updates", "ns"], descending=[True, False]
    )


def collection_patterns(sf_dir: str) -> Dataset:
    """A11: per-ns workload pattern labels (AnalyzeCommand.java:439-457
    thresholds preserved exactly)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(ev, GroupSpec(keys=("ns",), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt")
        avg = pc.divide(t.column("sum_size"), cnt)
        pattern = pc.case_when(
            pc.make_struct(
                pc.greater(avg, 5000),
                pc.and_(pc.greater(cnt, 10000), pc.less(avg, 1000)),
            ),
            "heavy-updates",
            "frequent-small",
            "mixed",
        )
        return pa.table(
            {"ns": t.column("ns"), "cnt": cnt, "avg_size": avg, "pattern": pattern}
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["ns"])


def routed_text(sf_dir: str) -> Dataset:
    """North-rule routed-row / per-turn text equality surface: every parent
    row with its sink, under stable sort (conv_id, turn_idx)."""
    ev = _mask_batches(
        event_dataset(sf_dir, with_text=True),
        lambda t: pc.equal(t.column("event_seq"), 0),
    )
    return ev.map_batches(
        lambda t: t.select(["sink", "conv_id", "turn_idx", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["conv_id", "turn_idx"])


FILTER_TS_BOUND = _dt.datetime(2025, 1, 1, 0, 5, 0)
# F7 upper bound (the -e/--endTime graft, ScanCommand.java:50,259-267): the
# reference replays a CLOSED window [start, end]; round 3 pushed only the
# lower bound
FILTER_TS_UPPER = _dt.datetime(2025, 1, 1, 1, 0, 0)


def filtered_transcript_scan(
    sf_dir: str, start_ts=None, end_ts=None
) -> Dataset:
    """S1/F7: the raw scan with the CLOSED time-range predicate pushed into
    ``read_parquet`` itself (ScanCommand.java:259-267's --startTs/--endTime
    seek contract).  Row groups whose ts statistics fall wholly outside
    [start, end] never leave storage — at 100 TB with a narrow window this
    is the difference between scanning everything and scanning a sliver."""
    import pyarrow.dataset as pads

    start = FILTER_TS_BOUND if start_ts is None else start_ts
    end = FILTER_TS_UPPER if end_ts is None else end_ts
    path = ensure_transcripts(sf_dir)
    return ray.data.read_parquet(
        path,
        filter=(pads.field("ts") >= start) & (pads.field("ts") <= end),
    )


def filtered_events(sf_dir: str) -> Dataset:
    """F2/F3/F4/F7 combined: CLOSED time range pushed down into the parquet
    scan (``filtered_transcript_scan``), then op allow-list ∧ ns allow-list
    ∧ size range as one vectorized post-parse mask.

    Source selection: if this session already pinned the parsed event cache
    (a many-query sweep), filtering the cached events beats re-reading; on
    a cold corpus the pushdown scan parses only the time-pruned slice —
    the S1 seek contract, and at 100 TB with a narrow window the only
    viable plan.  Both paths produce identical rows."""

    def mask(t: pa.Table):
        size = t.column("size")
        return pc.and_(
            pc.and_(
                pc.is_in(t.column("op_class"), value_set=pa.array(["i", "u"])),
                pc.starts_with(t.column("ns"), "bucket3."),
            ),
            pc.and_(pc.greater_equal(size, 64), pc.less_equal(size, 2048)),
        )

    cached = _EVENT_CACHE.get((sf_dir, False, False, _session_token()))
    if cached is not None:
        ds = _mask_batches(
            cached,
            lambda t: pc.and_(
                pc.greater_equal(
                    t.column("ts"),
                    pa.scalar(FILTER_TS_BOUND, pa.timestamp("us")),
                ),
                pc.less_equal(
                    t.column("ts"),
                    pa.scalar(FILTER_TS_UPPER, pa.timestamp("us")),
                ),
            ),
        )
    else:
        ds = filtered_transcript_scan(sf_dir).map_batches(
            parse_classify, batch_format="pyarrow", zero_copy_batch=True
        )
    ev = _mask_batches(ds, mask)
    return ev.map_batches(
        lambda t: t.select(
            ["conv_id", "turn_idx", "event_seq", "ns", "op_class", "size"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["conv_id", "turn_idx", "event_seq"])


FIRST_EVENTS_N = 100


def first_events(sf_dir: str, n: int = FIRST_EVENTS_N) -> Dataset:
    """F9 ``--limit`` contract query: the first ``n`` kept events under the
    total order (conv_id, turn_idx, event_seq).

    A bare ``sort().limit(n)`` would range-partition the whole corpus for n
    rows; instead each block prunes to its local first-n and only
    blocks × n rows reach the final tiny sort (``agg.topk``) — the same
    shape as the hot-key top-K, which is what F9 means at 100 TB.
    """
    ev = _mask_batches(event_dataset(sf_dir), _ok).map_batches(
        lambda t: t.select(
            ["conv_id", "turn_idx", "event_seq", "ns", "op_class", "size"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    order = [
        ("conv_id", "ascending"),
        ("turn_idx", "ascending"),
        ("event_seq", "ascending"),
    ]
    return topk(ev, n, order)


ALERT_THRESHOLD = 4096  # F5 --threshold analogue
ID_STATS_THRESHOLD = 2048  # F6 --idStatsThreshold analogue


def threshold_alerts(sf_dir: str) -> Dataset:
    """F5: the debug-threshold side output — events whose size exceeds the
    alert threshold, with their identity (BaseOplogCommand.java:152-165's
    log line as a routed sub-stream instead of stdout)."""
    ev = _mask_batches(
        event_dataset(sf_dir),
        lambda t: pc.and_(_ok(t), pc.greater_equal(t.column("size"), ALERT_THRESHOLD)),
    )
    return ev.map_batches(
        lambda t: t.select(["ns", "conv_id", "turn_idx", "op_class", "size"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort(["conv_id", "turn_idx"])


def threshold_alerts_full(sf_dir: str) -> Dataset:
    """F5 + M6 composed: the ``--fullDocument`` alert detail — each
    threshold-exceeding PARENT event carries its redacted document text as
    the alert payload (TailCommand.java:86 wires fullDocument into the
    threshold log line; 1179-1254 is the redactor it runs through).  Child
    (flattened) events have no document of their own, so the full-document
    surface is the event_seq=0 rows; redaction reuses the exact
    ``redacted_docs`` token contract."""
    from .analyze import NOTE_TOKEN_STRIP, TOOL_TOKEN_SUMMARY

    ev = _mask_batches(
        event_dataset(sf_dir, with_text=True),
        lambda t: pc.and_(
            pc.and_(
                _ok(t), pc.greater_equal(t.column("size"), ALERT_THRESHOLD)
            ),
            pc.equal(t.column("event_seq"), 0),
        ),
    )

    def redact(t: pa.Table) -> pa.Table:
        txt = pc.replace_substring_regex(t.column("text"), NOTE_TOKEN_STRIP, "")
        txt = pc.replace_substring_regex(txt, *TOOL_TOKEN_SUMMARY)
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "op_class": t.column("op_class"),
                "size": t.column("size"),
                "redacted_text": txt,
            }
        )

    return ev.map_batches(redact, batch_format="pyarrow").sort(
        ["conv_id", "turn_idx"]
    )


# exact percentile levels for the per-ns size distribution report
SIZE_PCTS = (50, 90, 99)


def size_percentiles(sf_dir: str) -> Dataset:
    """Per-ns size percentiles (p50/p90/p99) — the distribution detail the
    reference's min/max/avg report (EntryAccumulator.java:41-71) cannot
    show, computed EXACTLY via a mergeable counting histogram:

    each block collapses to (ns, size) → count partials (``grouped()``, the
    same bounded-shuffle shape as every A-family stat — the histogram is
    mergeable by construction), then one tiny per-ns task sorts its distinct
    sizes and reads the percentiles off the cumulative counts.  The shuffle
    moves ns × distinct-sizes rows — bounded by the VALUE RANGE, not the
    corpus — which is why exact percentiles are still cheap at 100 TB where
    a sort-based quantile would be an all-to-all of every event.

    Percentile convention (integer math on both engines): ``p`` is the
    smallest size whose cumulative count satisfies ``cum * 100 >= n * p``
    (= cum ≥ ceil(n·p/100) for integer cum)."""
    import numpy as np

    ev = _mask_batches(event_dataset(sf_dir), _ok)
    pre = ev.map_batches(
        lambda t: t.select(["ns", "size"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    g = grouped(pre, GroupSpec(keys=("ns", "size")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("size")
        cum = df["cnt"].to_numpy().cumsum()
        size = df["size"].to_numpy()
        n = int(cum[-1])
        out = {"ns": [df["ns"].iloc[0]], "n_events": np.array([n], np.int64)}
        for p in SIZE_PCTS:
            idx = int(np.searchsorted(cum * 100, n * p, side="left"))
            out[f"p{p}"] = np.array([size[idx]], np.int64)
        return pd.DataFrame(out)

    return (
        g.groupby("ns")
        .map_groups(finish, batch_format="pandas")
        .sort(["ns"])
    )


def hot_keys_thresholded(sf_dir: str, k: int = 20) -> Dataset:
    """F6 + A5/A6: hot-key stats restricted to events at or above the
    id-stats threshold (filter BEFORE the groupby, mirroring the
    pre-insert check in IdStatisticsManager.java:70-72)."""
    ev = _mask_batches(
        event_dataset(sf_dir),
        lambda t: pc.and_(
            _ok(t), pc.greater_equal(t.column("size"), ID_STATS_THRESHOLD)
        ),
    )
    g = grouped(ev, GroupSpec(keys=("ns", "conv_id"), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "cnt": t.column("cnt"),
                "total_size": t.column("sum_size"),
            }
        )

    return topk(
        g.map_batches(post, batch_format="pyarrow"),
        k,
        [("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")],
    )


def bucket_histogram_custom(
    sf_dir: str, buckets: tuple[int, ...] = (256, 1024, 8192)
) -> Dataset:
    """A2 with user-supplied bucket bounds (the --thresholdBuckets option,
    TailCommand.java:116-117): gt_* columns are derived at query time from
    ``size`` in the partial stage, so any bucket list works without
    re-parsing — strict '>' semantics preserved."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)

    def add_buckets(t: pa.Table) -> pa.Table:
        out = t.select(["ns", "op_class"])
        for b in buckets:
            out = out.append_column(
                f"gt_{b}", pc.cast(pc.greater(t.column("size"), b), pa.int8())
            )
        return out

    ev = ev.map_batches(add_buckets, batch_format="pyarrow")
    g = grouped(
        ev,
        GroupSpec(
            keys=("ns", "op_class"), sum_cols=tuple(f"gt_{b}" for b in buckets)
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        cols = {
            "ns": t.column("ns"),
            "op_class": t.column("op_class"),
            "cnt": t.column("cnt"),
        }
        for b in buckets:
            cols[f"cnt_gt_{b}"] = t.column(f"sum_gt_{b}")
        return pa.table(cols)

    return g.map_batches(post, batch_format="pyarrow").sort(["ns", "op_class"])


def hot_keys_docsize_external(sf_dir: str, k: int = 20) -> Dataset:
    """ST1 dynamic variant: hot-key doc-size stats where doc sizes come from
    a LIVE external store via actor-pool point lookups (micro-batched ``IN``
    with per-actor cache + miss fallback to the event's own size) instead of
    the static broadcast table — the full ``fetchDocSizes`` contract
    (TailCommand.java:398-463).  See ``stages/external.py``."""
    from ..stages.external import ExternalDocSizeStage, ensure_store

    db = ensure_store(sf_dir)
    ev = _mask_batches(event_dataset(sf_dir), _ok).map_batches(
        ExternalDocSizeStage,
        fn_constructor_kwargs={"db_path": db},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    g = grouped(
        ev,
        GroupSpec(
            keys=("ns", "conv_id"),
            sum_cols=("size", "ext_doc_size", "store_hit"),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "cnt": t.column("cnt"),
                "total_size": t.column("sum_size"),
                "ext_doc_size": pc.cast(t.column("sum_ext_doc_size"), pa.int64()),
                "store_hits": pc.cast(t.column("sum_store_hit"), pa.int64()),
            }
        )

    return topk(
        g.map_batches(post, batch_format="pyarrow"),
        k,
        [("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")],
    )


def hot_keys_docsize(sf_dir: str, k: int = 20) -> Dataset:
    """A5 full contract: hot-key stats over BOTH the oplog-size analogue and
    the looked-up doc_size, with unknown doc sizes as nulls excluded from
    count/avg (the reference's -1 sentinel exclusion,
    TailCommand.java:176-181; IdStatisticsManager.java:38-90)."""
    ev = _mask_batches(event_dataset(sf_dir), _ok)
    g = grouped(
        ev,
        GroupSpec(
            keys=("ns", "conv_id"),
            sum_cols=("size", "doc_size"),
            min_cols=("doc_size",),
            max_cols=("doc_size",),
            count_valid=("doc_size",),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        known = pc.cast(pc.fill_null(t.column("cntv_doc_size"), 0), pa.int64())
        sum_doc = pc.cast(t.column("sum_doc_size"), pa.float64())
        avg = pc.if_else(
            pc.greater(known, 0),
            pc.divide(
                pc.floor(
                    pc.multiply(
                        pc.divide(sum_doc, pc.cast(known, pa.float64())), 1e6
                    )
                ),
                1e6,
            ),
            pa.scalar(None, pa.float64()),
        )
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "cnt": t.column("cnt"),
                "total_oplog_size": t.column("sum_size"),
                "total_doc_size": pc.cast(t.column("sum_doc_size"), pa.int64()),
                "min_doc_size": t.column("min_doc_size"),
                "max_doc_size": t.column("max_doc_size"),
                "doc_size_known": known,
                "avg_doc_size": avg,
            }
        )

    return topk(
        g.map_batches(post, batch_format="pyarrow"),
        k,
        [("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")],
    )


def conv_profiles(sf_dir: str) -> Dataset:
    """Per-conversation profile over the RAW transcript turns — the
    conversation-level filter inputs a chat-model training pipeline needs
    (turn counts by role, tool-call rate, size, wall-clock span) before
    deciding which conversations to keep.

    Scale shape: one vectorized pyarrow pass derives int indicator columns,
    then :func:`~.agg.grouped` merges conv_id-keyed partials (each block
    pre-collapses to one row per conversation present, so the exchange is
    bounded at blocks × convs-per-block rows and the text column never
    shuffles — it is dropped before the exchange)."""

    def partial(t: pa.Table) -> pa.Table:
        role = t.column("role")

        def ind(mask) -> pa.Array:
            return pc.cast(mask, pa.int64())

        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "is_user": ind(pc.equal(role, "user")),
                "is_assistant": ind(pc.equal(role, "assistant")),
                "is_tool": ind(pc.equal(role, "tool")),
                "is_system": ind(pc.equal(role, "system")),
                "tool_call": ind(pc.not_equal(t.column("tool"), "none")),
                "n_chars": pc.cast(
                    pc.utf8_length(t.column("text")), pa.int64()
                ),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    g = grouped(
        read_transcripts(sf_dir).map_batches(partial, batch_format="pyarrow"),
        GroupSpec(
            keys=("conv_id",),
            count=True,
            sum_cols=("is_user", "is_assistant", "is_tool", "is_system",
                      "tool_call", "n_chars"),
            min_cols=("ts_us",),
            max_cols=("ts_us",),
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_turns": t.column("cnt"),
                "n_user": t.column("sum_is_user"),
                "n_assistant": t.column("sum_is_assistant"),
                "n_tool": t.column("sum_is_tool"),
                "n_system": t.column("sum_is_system"),
                "tool_calls": t.column("sum_tool_call"),
                "total_chars": t.column("sum_n_chars"),
                "span_us": pc.subtract(
                    t.column("max_ts_us"), t.column("min_ts_us")
                ),
            }
        )

    return g.map_batches(post, batch_format="pyarrow")


# curated-conversation keep gates (agentic chat-training selection): drop
# degenerate short and runaway long conversations, require real multi-turn
# assistant participation and at least one tool call
CONV_MIN_TURNS = 4
CONV_MAX_TURNS = 64
CONV_MIN_ASSISTANT = 2
CONV_MIN_TOOL_CALLS = 1


def curated_conversations(sf_dir: str) -> Dataset:
    """The conversation keep-list for agentic chat training: every
    :func:`conv_profiles` row passing the turn-range / assistant-count /
    tool-use gates.  Same decision-table contract as ``curated_corpus`` —
    the keep-list is the deliverable; the transcript rows themselves are
    fetched by joining it back (broadcast or bucketed, both cheap because
    the keep-list carries only conv_id + small ints).  Adds no pass over
    the corpus beyond conv_profiles' single one."""

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("n_turns"), CONV_MIN_TURNS),
                pc.less_equal(t.column("n_turns"), CONV_MAX_TURNS),
            ),
            pc.and_(
                pc.greater_equal(
                    t.column("n_assistant"), CONV_MIN_ASSISTANT
                ),
                pc.greater_equal(
                    t.column("tool_calls"), CONV_MIN_TOOL_CALLS
                ),
            ),
        )
        return t.filter(keep)

    return conv_profiles(sf_dir).map_batches(gate, batch_format="pyarrow")
