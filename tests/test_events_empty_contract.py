"""Empty-input contract for every events-table operator.

Two degenerate corpora that real ingestion produces all the time:
- a fully EMPTY events table (fresh deployment, filtered shard);
- a CLICK-ONLY table (no purchases/views), which empties the
  filter-to-grouped() pipelines of the KPI operators.

Contract: every operator returns a schema-correct (possibly zero-row)
result — never a crash, never a schema-less dataset that breaks a
downstream sort/select.  These exact shapes crashed 19 (empty) / 4
(click-only) operators before the ``final_empty``/``_pin_schema``
hardening; this file pins the fix.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oplog_analyzer_ray.pipelines import events as ev

_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)

# operator -> expected output column names (the documented surface)
_OPS = {
    "sessionization": ["user_id", "session_id", "n_events", "start_ts",
                       "end_ts", "sum_value"],
    "tumbling_window": ["event_type", "day", "cnt", "sum_value"],
    "sliding_window": ["event_type", "window_start", "cnt", "sum_value"],
    "purchase_attribution": ["event_id", "user_id", "ts", "value",
                             "click_event_id", "click_ts", "gap_us"],
    "funnel": ["stage", "event_type", "users", "conv_from_first"],
    "retention_cohorts": ["cohort_week", "week_offset", "users", "retention"],
    "approx_distinct_users": ["k", "n_seen", "kth_hash", "est_distinct"],
    "approx_distinct_users_by_type": ["event_type", "k", "n_seen",
                                      "kth_hash", "est_distinct"],
    "daily_active_users": ["day", "dau", "n_events"],
    "props_value_stats": ["event_type", "cnt", "sum_k", "min_k", "max_k"],
    "event_type_cooccurrence": ["type_a", "type_b", "n_users"],
    "daily_anomalies": ["event_type", "day", "cnt", "z"],
    "hourly_activity": ["event_type", "hour", "cnt", "sum_value"],
    "power_users": ["user_id", "n_events"],
    "session_stats": ["n_sessions", "n_bounces", "avg_events",
                      "avg_duration_s", "sum_value"],
    "top_event_paths": ["path", "n_users"],
    "inter_event_gaps": ["event_type", "n_gaps", "avg_gap_s", "max_gap_s"],
    "concurrent_sessions": ["hour", "n_sessions", "n_users"],
    "trending_event_types": ["day", "rnk", "event_type", "cnt"],
    "rolling_wau": ["window_start", "wau"],
    "value_percentiles": ["event_type", "n_events", "p50", "p90", "p99"],
    "session_duration_percentiles": ["n_sessions", "p50_s", "p90_s", "p99_s"],
    "repeat_purchase_rate": ["buyers", "repeat_buyers", "repeat_rate"],
    "conversion_lag_stats": ["n_users", "avg_lag_s", "max_lag_s"],
    "event_transitions": ["from_type", "to_type", "cnt"],
    "user_churn": ["user_id", "last_ts", "days_inactive"],
    "bounce_rate": ["day", "n_sessions", "n_bounces"],
}

# ops whose result is non-empty even for a zero-row corpus (fixed-shape
# reports: the 3-stage funnel of zeros, the one-row KMV sketch)
_NONZERO_ON_EMPTY = {"funnel": 3, "approx_distinct_users": 1}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ev_empty")
    pq.write_table(_SCHEMA.empty_table(), os.path.join(d, "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def clickonly_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ev_clicks")
    t = pa.table(
        {
            "event_id": list(range(20)),
            "ts": pd.date_range("2024-01-01", periods=20, freq="h"),
            "user_id": [i % 5 for i in range(20)],
            "event_type": ["click"] * 20,
            "value": [0.0] * 20,
            "props": ['{"x": "y"}'] * 20,
        },
        schema=_SCHEMA,
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


@pytest.mark.parametrize("op", sorted(_OPS))
def test_empty_corpus_yields_typed_result(ray_session, empty_dir, op):
    ds = getattr(ev, op)(empty_dir)
    schema = ds.schema()
    assert schema is not None and schema.names == _OPS[op]
    assert ds.count() == _NONZERO_ON_EMPTY.get(op, 0)


@pytest.mark.parametrize(
    "op",
    # the filter-to-empty KPI family (no purchases / no views / no "k"
    # props / single event type) — zero rows out, schema intact
    ["repeat_purchase_rate", "conversion_lag_stats", "props_value_stats",
     "event_type_cooccurrence", "purchase_attribution", "user_churn"],
)
def test_clickonly_corpus_keeps_schema(ray_session, clickonly_dir, op):
    ds = getattr(ev, op)(clickonly_dir)
    schema = ds.schema()
    assert schema is not None and schema.names == _OPS[op]
    assert ds.count() == 0
