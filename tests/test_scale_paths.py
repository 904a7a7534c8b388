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


def test_grouped_bucket_invariant():
    """The bucketed exchange width (dyn_buckets) is pure execution detail:
    grouped() must produce identical stats at any width."""
    import numpy as np

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
    for b in (2, 64, 333):
        ds = ray.data.from_pandas(df).repartition(8)
        out = grouped(ds, spec, buckets=b).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_filtered_scan_pushdown_prunes_rows():
    """The ts-range predicate runs inside read_parquet: the scan yields
    strictly fewer rows than the corpus (rows before the bound are planted
    by synth), and nothing downstream re-reads the pruned slice."""
    total = read_transcripts(SF_DIR).count()
    pushed = filtered_transcript_scan(SF_DIR).count()
    assert 0 < pushed < total
