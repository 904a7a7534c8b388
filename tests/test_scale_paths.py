"""Scale-path behaviors: partitioning must be an execution detail (results
invariant to bucket counts) and predicate pushdown must actually prune the
scan (the S1/F7 contract, ScanCommand.java:259-267)."""

import pandas as pd

import ray.data

from oplog_analyzer_ray.pipelines.core import (
    filtered_transcript_scan,
    read_transcripts,
)
from oplog_analyzer_ray.pipelines.events import sessionization, session_buckets

SF_DIR = "/root/testdata/sf0.001"


def test_sessionization_bucket_invariant():
    a = sessionization(SF_DIR, n_buckets=8).to_pandas()
    b = sessionization(SF_DIR, n_buckets=256).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_session_buckets_scale_with_input():
    # floor = 2×cluster CPUs at tiny inputs; grows once rows exceed the
    # per-bucket ceiling
    from oplog_analyzer_ray.pipelines import events as ev

    assert session_buckets(SF_DIR) >= 2
    orig = ev.SESSION_ROWS_PER_BUCKET
    try:
        ev.SESSION_ROWS_PER_BUCKET = 10
        assert session_buckets(SF_DIR) >= ev._events_rows(SF_DIR) // 10
    finally:
        ev.SESSION_ROWS_PER_BUCKET = orig


def test_grouped_bucket_invariant(monkeypatch):
    """The final-merge plan (single-task small merge vs bucketed exchange
    at any width) is pure execution detail: grouped() must produce
    identical stats under every plan."""
    import numpy as np

    from oplog_analyzer_ray.pipelines import agg
    from oplog_analyzer_ray.pipelines.agg import GroupSpec, grouped

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 5000).astype(str),
            "v": rng.integers(0, 1000, 5000),
        }
    )
    spec = GroupSpec(keys=("k",), sum_cols=("v",), min_cols=("v",), max_cols=("v",))
    outs = []
    # small-merge plan (default threshold) …
    ds = ray.data.from_pandas(df).repartition(8)
    outs.append(
        grouped(ds, spec).to_pandas().sort_values("k").reset_index(drop=True)
    )
    # … and the bucketed exchange, forced, at several widths
    monkeypatch.setattr(agg, "SMALL_MERGE_ROWS", 0)
    for b in (2, 64, 333):
        ds = ray.data.from_pandas(df).repartition(8)
        out = grouped(ds, spec, buckets=b).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)


def test_route_start_ts_pushdown(tmp_path):
    """route(start_ts=...) seeks into the stream at the scan: fewer events
    land in every sink, and the watermark semantics are untouched."""
    import datetime as dt

    from oplog_analyzer_ray.pipelines.route import route

    full = route(SF_DIR, str(tmp_path / "full"))
    part = route(
        SF_DIR,
        str(tmp_path / "seek"),
        start_ts=dt.datetime(2025, 1, 1, 0, 7, 0),  # mid-corpus seek
    )
    tf, tp = full.sink_totals(), part.sink_totals()
    assert 0 < sum(tp.values()) < sum(tf.values())
    assert part.watermark() == full.watermark()  # max_ts unaffected by seek


def test_sliding_window_covers_each_event_seven_times():
    """Every event lands in exactly WINDOW/STEP windows: total cnt over the
    sliding result is 7x the event count, and each tumbling day aggregates
    into exactly the 7 windows covering it."""
    from oplog_analyzer_ray.pipelines.events import (
        _events_rows,
        sliding_window,
        tumbling_window,
    )

    slide = sliding_window(SF_DIR).to_pandas()
    assert slide["cnt"].sum() == 7 * _events_rows(SF_DIR)
    tumb = tumbling_window(SF_DIR).to_pandas()
    # per event_type: sliding total value == 7x tumbling total value
    s = slide.groupby("event_type")["sum_value"].sum().round(2)
    t = (tumb.groupby("event_type")["sum_value"].sum() * 7).round(2)
    pd.testing.assert_series_equal(s, t, check_names=False)


def test_filtered_scan_pushdown_prunes_rows():
    """The ts-range predicate runs inside read_parquet: the scan yields
    strictly fewer rows than the corpus (rows before the bound are planted
    by synth), and nothing downstream re-reads the pruned slice."""
    total = read_transcripts(SF_DIR).count()
    pushed = filtered_transcript_scan(SF_DIR).count()
    assert 0 < pushed < total


def test_route_end_ts_pushdown(tmp_path):
    """route(end_ts=...) caps the replay window at the scan (the
    -e/--endTime graft): fewer events land in every sink and the committed
    watermark stops at the bound instead of the corpus tail."""
    import datetime as dt

    from oplog_analyzer_ray.pipelines.route import route

    full = route(SF_DIR, str(tmp_path / "full"))
    part = route(
        SF_DIR,
        str(tmp_path / "cap"),
        end_ts=dt.datetime(2025, 1, 1, 0, 7, 0),  # mid-corpus cap
    )
    tf, tp = full.sink_totals(), part.sink_totals()
    assert 0 < sum(tp.values()) < sum(tf.values())
    assert part.watermark() < full.watermark()  # end bound caps max_ts
    assert part.watermark() <= "2025-01-01T00:07:00"


def test_filtered_scan_upper_bound_prunes_rows():
    """The UPPER ts bound also runs inside read_parquet: an early end bound
    with a no-op start bound yields strictly fewer rows than the corpus —
    row groups wholly after the bound never leave storage."""
    import datetime as dt

    total = read_transcripts(SF_DIR).count()
    capped = filtered_transcript_scan(
        SF_DIR,
        start_ts=dt.datetime(2024, 1, 1),  # before the corpus: no-op
        end_ts=dt.datetime(2025, 1, 1, 0, 7, 0),
    ).count()
    assert 0 < capped < total


def test_pack_sequences_range_invariant():
    """Sequence packing is a prefix scan: the (seq_id, seq_off) assignment
    must be invariant to how many range partitions the scan uses."""
    from oplog_analyzer_ray.pipelines.text import pack_sequences

    a = pack_sequences(SF_DIR, n_ranges=2).to_pandas()
    b = pack_sequences(SF_DIR, n_ranges=97).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # the running total is exclusive: first doc starts at (0, 0)
    assert a.iloc[0]["seq_id"] == 0 and a.iloc[0]["seq_off"] == 0


def test_substring_dedup_layout_invariant(tmp_path):
    """substring_dedup results are invariant to the corpus FILE layout
    (single documents.parquet vs a documents/ directory of shards) —
    windows never span documents, so block boundaries cannot change the
    (whash, doc_id) stream, only its batching."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.dedup import substring_dedup

    rows = []
    words = ["aa", "bb", "cc", "dd"]
    for d in range(24):
        toks = [words[(d * 7 + i) % 4] for i in range(5 + d % 6)]
        rows.append((d, " ".join(toks)))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()
            ),
        }
    )
    single = tmp_path / "single"
    single.mkdir()
    pq.write_table(t, single / "documents.parquet")
    multi = tmp_path / "multi"
    (multi / "documents").mkdir(parents=True)
    for i in range(3):
        pq.write_table(
            t.slice(i * 8, 8), multi / "documents" / f"part-{i}.parquet"
        )

    a = substring_dedup(str(single)).to_pandas()
    b = substring_dedup(str(multi)).to_pandas()
    assert len(a) > 0  # the tiny vocab guarantees shared windows
    assert a.values.tolist() == b.values.tolist()
