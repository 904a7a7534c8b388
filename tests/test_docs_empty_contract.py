"""Empty-input contract for the documents/embeddings operators.

Companion to ``test_events_empty_contract.py``: two degenerate corpora —
a fully EMPTY corpus dir (all three tables zero rows) and a SHORT corpus
(eight sub-3-token docs, one vector) whose dedup chain legitimately
produces ZERO candidate pairs and whose knn graph has no edges.

Contract: every registered query either returns a usable (possibly
zero-row) result or raises the documented "not an sf dir" contract error
(the transcript-pipeline ops, which require the synthetic transcript
corpus).  Before the ``final_empty``/``_pin_schema`` hardening, 38 ops
crashed on EMPTY and 17 on SHORT.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

_DOC = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
     ("source", pa.string()), ("n_chars", pa.int64())]
)
_EMB = pa.schema(
    [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
     ("label", pa.int32())]
)
_EV = pa.schema(
    [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
     ("user_id", pa.int64()), ("event_type", pa.string()),
     ("value", pa.float64()), ("props", pa.string())]
)

# events ops have their own contract file; transcript ops require an sf dir
_SKIP = {
    "sessionization", "tumbling_window", "sliding_window",
    "purchase_attribution", "funnel", "retention_cohorts",
    "approx_distinct_users", "approx_distinct_users_by_type",
    "daily_active_users", "props_value_stats", "event_type_cooccurrence",
    "daily_anomalies", "hourly_activity", "power_users", "session_stats",
    "top_event_paths", "inter_event_gaps", "concurrent_sessions",
    "trending_event_types", "rolling_wau", "value_percentiles",
    "session_duration_percentiles", "repeat_purchase_rate",
    "conversion_lag_stats", "event_transitions", "user_churn",
    "bounce_rate", "filtered_events", "first_events",
}


def _mk(tmp, docs=None, embs=None) -> str:
    pq.write_table(
        docs if docs is not None else _DOC.empty_table(),
        os.path.join(tmp, "documents.parquet"),
    )
    pq.write_table(
        embs if embs is not None else _EMB.empty_table(),
        os.path.join(tmp, "embeddings.parquet"),
    )
    pq.write_table(_EV.empty_table(), os.path.join(tmp, "events.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return _mk(tmp_path_factory.mktemp("docs_empty"))


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    texts = ["hi there", "ok", "a b", "x", "yes no", "one", "two words",
             "z z"]
    docs = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": [len(t) for t in texts],
        },
        schema=_DOC,
    )
    embs = pa.table(
        {"vec_id": [0], "embedding": [np.ones(8, np.float32)],
         "label": [0]},
        schema=_EMB,
    )
    return _mk(tmp_path_factory.mktemp("docs_short"), docs, embs)


def _doc_queries():
    return sorted(set(entrymod.queries()) - _SKIP)


@pytest.mark.parametrize("op", _doc_queries())
def test_empty_corpus_never_crashes(ray_session, empty_dir, op):
    _run(op, empty_dir)


@pytest.mark.parametrize("op", _doc_queries())
def test_shingle_free_corpus_never_crashes(ray_session, short_dir, op):
    # 8 short docs → zero LSH candidate pairs, 1 vector → zero knn edges:
    # the dedup/similarity chains must propagate typed empties end to end
    _run(op, short_dir)


def _run(op, d):
    import ray.data

    try:
        r = entrymod.queries()[op](d)
    except ValueError as ex:
        # the transcript-pipeline ops document this contract error for
        # non-sf-dir inputs; anything else is a real failure
        assert "not an sf dir" in str(ex), (op, str(ex)[:200])
        return
    if isinstance(r, ray.data.Dataset):
        r.count()  # executing the plan is half the assertion: no crash
        # the other half: the TYPED-schema contract survives even when
        # every block empties out (Ray drops the schema of all-empty map
        # outputs and sort drops empty blocks — every report surface pins
        # a typed zero-row block so downstream sort/select keep working)
        schema = r.schema()
        assert schema is not None and len(schema.names) > 0, op
