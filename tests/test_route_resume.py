"""Routing + manifest + resume (SURVEY.md §5.3, north_rule).

- per-sink counts from the manifest equal the DuckDB oracle's sink counts;
- a run killed after K commits, then resumed, yields byte-identical
  sink counts and row data to a fresh full run;
- routed rows read back equal the oracle's event rows (text equality under
  stable sort by (conv_id, turn_idx) — the north-rule per-turn check).
"""

import os
import shutil

import pyarrow.compute as pc
import pytest

from oplog_analyzer_ray import oracle
from oplog_analyzer_ray.pipelines.route import read_routed, route
from oplog_analyzer_ray.synth import ensure_transcripts

from .util import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def out_root(tmp_path):
    d = str(tmp_path / "routed")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _oracle_sink_counts(duck):
    ensure_transcripts(SF_DIR)
    sql = oracle.events_cte(SF_DIR) + "SELECT sink, COUNT(*) AS n FROM events GROUP BY sink"
    return dict(duck.execute(sql).fetchall())


def test_route_full_run_counts_match_oracle(duck, out_root):
    manifest = route(SF_DIR, out_root)
    assert manifest.sink_totals() == _oracle_sink_counts(duck)
    assert len(manifest.finished()) == 8  # all input shards committed
    ent = next(iter(manifest.units.values()))
    assert ent["max_ts"] and ent["output_files"] and ent["sink_counts"]


def test_route_resume_identical_to_fresh(duck, out_root):
    # crash after the first commit group (3 of 8 units)
    m1 = route(SF_DIR, out_root, units_per_commit=3, max_commits=1)
    assert len(m1.finished()) == 3
    # resume: only remaining units processed; totals match a fresh run
    m2 = route(SF_DIR, out_root)
    assert len(m2.finished()) == 8
    assert m2.sink_totals() == _oracle_sink_counts(duck)


def test_routed_rows_text_equality(duck, out_root):
    route(SF_DIR, out_root)
    ds = read_routed(out_root)
    got = (
        ds.map_batches(
            lambda t: t.filter(pc.equal(t["event_seq"], 0)).select(
                ["sink", "conv_id", "turn_idx", "text"]
            ),
            batch_format="pyarrow",
        )
        .sort(["conv_id", "turn_idx"])
    )
    want = duck.execute(
        oracle.events_cte(SF_DIR) + oracle.ROUTED_TEXT
    ).fetchdf()
    assert_frames_match(got, want, "routed_text_roundtrip")


def test_tail_new_files_processed_incrementally(tmp_path, duck):
    """S2 graft (SURVEY.md §2.1): the tailable stream becomes
    watermark-advancing batch ingest — when a NEW input shard appears after
    a completed run, re-running route() processes only that shard and the
    manifest watermark advances (TailCommand.java:534-552 semantics without
    the restart-at-latest data loss)."""
    import shutil as _sh

    from oplog_analyzer_ray.synth import ensure_transcripts

    src = ensure_transcripts(SF_DIR)
    live_src = tmp_path / "live_src"
    live_src.mkdir()
    shards = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
    for p in shards[:-1]:
        _sh.copy(os.path.join(src, p), live_src / p)

    out_root = str(tmp_path / "routed")
    # route() over an explicit directory: reuse the cache_root trick — point
    # a fake sf dir at our live corpus via monkeypatched ensure
    import oplog_analyzer_ray.pipelines.route as route_mod

    orig = route_mod.ensure_transcripts
    route_mod.ensure_transcripts = lambda _sf: str(live_src)
    try:
        m1 = route_mod.route(SF_DIR, out_root)
        assert len(m1.finished()) == len(shards) - 1
        wm1 = m1.watermark()

        # the stream advances: a new shard lands
        _sh.copy(os.path.join(src, shards[-1]), live_src / shards[-1])
        m2 = route_mod.route(SF_DIR, out_root)
    finally:
        route_mod.ensure_transcripts = orig

    assert len(m2.finished()) == len(shards)
    assert m2.watermark() > wm1  # watermark advanced, no gap lost
    assert m2.sink_totals() == _oracle_sink_counts(duck)


def test_tail_follow_longpoll_picks_up_midstream_shard(tmp_path, duck):
    """S2/§2.10 TailableAwait graft: tail_follow() blocks in a long-poll
    loop and ingests a shard that lands WHILE it is polling (written by a
    concurrent producer thread), then exits after idle_polls quiet polls
    with the full corpus committed."""
    import shutil as _sh
    import threading
    import time as _time

    from oplog_analyzer_ray.synth import ensure_transcripts

    src = ensure_transcripts(SF_DIR)
    live_src = tmp_path / "live_src"
    live_src.mkdir()
    shards = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
    for p in shards[:-1]:
        _sh.copy(os.path.join(src, p), live_src / p)

    def producer():
        _time.sleep(0.8)  # land mid-poll, after the first route pass
        _sh.copy(os.path.join(src, shards[-1]), live_src / shards[-1])

    out_root = str(tmp_path / "routed")
    import oplog_analyzer_ray.pipelines.route as route_mod

    orig = route_mod.ensure_transcripts
    route_mod.ensure_transcripts = lambda _sf: str(live_src)
    t = threading.Thread(target=producer)
    t.start()
    try:
        m = route_mod.tail_follow(
            SF_DIR, out_root, poll_secs=0.3, idle_polls=3, max_polls=40
        )
    finally:
        t.join()
        route_mod.ensure_transcripts = orig

    assert len(m.finished()) == len(shards)
    assert m.sink_totals() == _oracle_sink_counts(duck)
