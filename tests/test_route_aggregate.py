"""Fused route+aggregate (one-scan write + report partials).

Pins that ``route_aggregate`` is EXACTLY route() + grouped_multi(read back):
same manifest sink totals, same routed rows on disk, same aggregate tables —
fresh AND resumed — so the fused fast path can never drift from the two-pass
reference semantics.
"""

import shutil

import pyarrow.compute as pc
import pytest

from oplog_analyzer_ray.pipelines.agg import GroupSpec, grouped_multi
from oplog_analyzer_ray.pipelines.route import (
    read_routed,
    route,
    route_aggregate,
)

from .util import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"

SPECS = [
    GroupSpec(
        keys=("sink", "ns", "op_class"),
        sum_cols=("size",),
        min_cols=("size",),
        max_cols=("size",),
    ),
    GroupSpec(keys=("ns", "conv_id"), sum_cols=("size",)),
]


@pytest.fixture()
def roots(tmp_path):
    a, b = str(tmp_path / "classic"), str(tmp_path / "fused")
    yield a, b
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


def _sorted_df(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)


def _classic(root):
    import ray.data

    manifest = route(SF_DIR, root)
    import os

    routed = ray.data.read_parquet(
        os.path.join(root, "data"),
        columns=["sink", "ns", "op_class", "size", "conv_id"],
    )
    return manifest, grouped_multi(routed, SPECS)


def test_fused_equals_classic(roots):
    classic_root, fused_root = roots
    m_c, (c_sink, c_hot) = _classic(classic_root)
    m_f, (f_sink, f_hot) = route_aggregate(SF_DIR, fused_root, SPECS)

    assert m_f.sink_totals() == m_c.sink_totals()
    assert_frames_match(
        _sorted_df(f_sink, ["sink", "ns", "op_class"]),
        _sorted_df(c_sink, ["sink", "ns", "op_class"]),
        "fused sink spec",
    )
    assert_frames_match(
        _sorted_df(f_hot, ["ns", "conv_id"]),
        _sorted_df(c_hot, ["ns", "conv_id"]),
        "fused hot spec",
    )

    # the routed BYTES are equivalent too: same rows under the total order
    cols = ["conv_id", "turn_idx", "event_seq", "sink", "ns", "size", "text"]
    key = ["conv_id", "turn_idx", "event_seq"]
    df_c = read_routed(classic_root).select_columns(cols).to_pandas()
    df_f = read_routed(fused_root).select_columns(cols).to_pandas()
    assert_frames_match(
        df_f.sort_values(key).reset_index(drop=True),
        df_c.sort_values(key).reset_index(drop=True),
        "fused routed rows",
    )


def test_fused_resume_identical_to_fresh(roots):
    classic_root, fused_root = roots
    # crash after the first commit group (3 of 8 units)...
    m1 = route(SF_DIR, fused_root, units_per_commit=3, max_commits=1)
    assert len(m1.finished()) == 3
    # ...resume through the FUSED path: committed units' partials come from
    # the column-pruned read-back, new units from the fused write scan
    m2, (f_sink, f_hot) = route_aggregate(SF_DIR, fused_root, SPECS)
    assert len(m2.finished()) == 8

    m_c, (c_sink, c_hot) = _classic(classic_root)
    assert m2.sink_totals() == m_c.sink_totals()
    assert_frames_match(
        _sorted_df(f_sink, ["sink", "ns", "op_class"]),
        _sorted_df(c_sink, ["sink", "ns", "op_class"]),
        "resumed fused sink spec",
    )
    assert_frames_match(
        _sorted_df(f_hot, ["ns", "conv_id"]),
        _sorted_df(c_hot, ["ns", "conv_id"]),
        "resumed fused hot spec",
    )


def test_fused_write_is_retry_idempotent(tmp_path):
    """Re-running the fused write stage over the same block must overwrite,
    not duplicate (the content-hashed basename contract)."""
    import numpy as np
    import pyarrow as pa

    from oplog_analyzer_ray.pipelines.agg import union_plan
    from oplog_analyzer_ray.pipelines.route import _write_and_partial

    plan = union_plan([GroupSpec(keys=("sink",), sum_cols=("size",))])
    batch = pa.table(
        {
            "part": pa.array(["p0"] * 4),
            "sink": pa.array(["ops_i", "ops_i", "ops_u", "ops_u"]),
            "conv_id": pa.array(["c1", "c1", "c2", "c2"]),
            "turn_idx": pa.array(np.arange(4, dtype=np.int64)),
            "size": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    d = str(tmp_path / "data")
    p1 = _write_and_partial(batch, d, plan)
    p2 = _write_and_partial(batch, d, plan)  # the "retry"
    assert p1.equals(p2)
    import ray.data

    ds = ray.data.read_parquet(d)
    assert ds.count() == 4  # still 4 rows, not 8


def test_fused_basename_no_collision_on_equal_endpoints(tmp_path):
    """Two DISTINCT batches whose key-span endpoints and row counts coincide
    (a hot (conv_id, turn_idx) group split across batches) must write two
    distinct files — round 3 hashed only endpoints + count, so the second
    batch silently overwrote the first under overwrite_or_ignore."""
    import glob

    import pyarrow as pa

    from oplog_analyzer_ray.pipelines.route import _write_and_partial

    class _Plan:
        @staticmethod
        def multi_partial(batch):
            return batch.select(["part", "sink"])

    def mk(seqs):
        n = len(seqs)
        return pa.table(
            {
                "part": pa.array(["p0"] * n),
                "sink": pa.array(["s"] * n),
                "conv_id": pa.array(["c1"] * n),
                "turn_idx": pa.array([7] * n, pa.int64()),
                "event_seq": pa.array(seqs, pa.int64()),
            }
        )

    d = str(tmp_path / "data")
    _write_and_partial(mk([0, 1, 2, 3]), d, _Plan)
    _write_and_partial(mk([0, 5, 6, 3]), d, _Plan)  # same endpoints + count
    files = glob.glob(f"{d}/part=p0/sink=s/*.parquet")
    assert len(files) == 2
    import pyarrow.parquet as pq

    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 8


def test_fused_rerun_after_full_completion(tmp_path):
    """A second route_aggregate over a fully-committed root (the idempotent
    rerun the docstring promises) previously crashed with range(0, 0, 0)
    (review finding); it must recover the partials from the routed layout
    and produce identical reports."""
    root = str(tmp_path / "fused")
    _, first = route_aggregate(SF_DIR, root, SPECS)
    first_dfs = [
        _sorted_df(d, list(s.keys)) for d, s in zip(first, SPECS)
    ]
    _, again = route_aggregate(SF_DIR, root, SPECS)
    for f, a, s in zip(first_dfs, again, SPECS):
        assert_frames_match(a, f, f"rerun[{s.keys}]")


def test_route_refuses_resume_under_different_window(tmp_path):
    """The manifest records the row-filter window; resuming a windowed root
    with a different (or no) window must raise instead of silently
    returning routed output that lacks the out-of-window rows (review
    finding: every unit read as finished, no error, incomplete data)."""
    import pyarrow.parquet as pq
    import glob as _glob
    import os

    from oplog_analyzer_ray.pipelines.route import ensure_transcripts

    src = ensure_transcripts(SF_DIR)
    f0 = sorted(_glob.glob(os.path.join(src, "*.parquet")))[0]
    ts = pq.read_table(f0, columns=["ts"]).column("ts").to_pylist()
    mid = sorted(ts)[len(ts) // 2]

    root = str(tmp_path / "windowed")
    route(SF_DIR, root, start_ts=mid)  # commit every unit, window-filtered
    with pytest.raises(ValueError, match="filter window"):
        route(SF_DIR, root)  # wider window over the same root
    # same window resumes fine (no-op: everything committed)
    m = route(SF_DIR, root, start_ts=mid)
    assert len(m.finished()) > 0
