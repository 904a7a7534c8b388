"""CLI smoke tests, declarative pipeline builder, and format utils
(SURVEY.md §2.11 extension surface, M7/M8)."""

import pandas as pd
import pyarrow.compute as pc

from oplog_analyzer_ray.functions.format import (
    byte_display,
    max_width,
    truncate_middle,
)
from oplog_analyzer_ray.pipelines.config import build_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_format_utils():
    assert byte_display(512) == "512 B"
    assert byte_display(2048) == "2.0 KB"
    assert byte_display(5 * (1 << 20) + (1 << 19)) == "5.5 MB"
    assert byte_display(3 << 30) == "3.0 GB"
    assert truncate_middle("bucket3.ingest", 50) == "bucket3.ingest"
    t = truncate_middle("a" * 30 + "Z" + "b" * 30, 21)
    assert len(t) == 21 and "..." in t and t.startswith("a") and t.endswith("b")
    assert max_width(["abc", "defgh"], "ns") == 5
    assert max_width([], "ns") == 2


def test_declarative_pipeline_matches_handwritten():
    import datetime as dt

    steps = [
        {"op": "parse"},
        {"op": "drop_text"},
        {"op": "enrich"},
        {"op": "filter_ops", "values": ["i", "u"]},
        {"op": "filter_ns", "prefix": "bucket3."},
        {"op": "filter_size", "min": 64, "max": 2048},
        {"op": "filter_time", "gte": dt.datetime(2025, 1, 1, 0, 5, 0)},
        {"op": "select",
         "columns": ["conv_id", "turn_idx", "event_seq", "ns", "op_class", "size"]},
    ]
    built = build_pipeline(SF_DIR, steps).to_pandas()
    from oplog_analyzer_ray.pipelines.core import filtered_events

    want = filtered_events(SF_DIR).to_pandas()
    got = built.sort_values(list(built.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert got.equals(want)


def test_declarative_group_and_topk_match_handwritten():
    """The builder's group_stats/topk steps run through the same grouped()/
    topk() engine as the built-in queries — results must be identical to
    the handwritten hot_keys_topk pipeline."""
    steps = [
        {"op": "parse"},
        {"op": "drop_text"},
        {"op": "exclude_rejects"},
        {"op": "group_stats", "keys": ["ns", "conv_id"],
         "sum": ["size"], "min": ["size"], "max": ["size"]},
        {"op": "topk", "k": 20,
         "sort": [["cnt", "descending"], ["ns", "ascending"],
                  ["conv_id", "ascending"]]},
    ]
    built = build_pipeline(SF_DIR, steps).to_pandas()
    from oplog_analyzer_ray.pipelines.core import hot_keys_topk

    want = hot_keys_topk(SF_DIR).to_pandas()
    got = built.rename(
        columns={"sum_size": "total_size"}
    )[["ns", "conv_id", "cnt", "total_size", "min_size", "max_size"]]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_pipeline_rejects_unknown_step():
    import pytest

    with pytest.raises(ValueError, match="unknown pipeline step"):
        build_pipeline(SF_DIR, [{"op": "nope"}])


def test_cli_report_and_analyze(capsys):
    from oplog_analyzer_ray.__main__ import cmd_analyze, cmd_report

    class A:
        sf_dir = SF_DIR
        top = 3

    cmd_report(A())
    out = capsys.readouterr().out
    assert "top conversations" in out and "bucket" in out

    cmd_analyze(A())
    out = capsys.readouterr().out
    assert "shard workloads" in out and "skew" in out
    # S4/J4: the analyze report consults the shard-key catalog and shows
    # the per-shard update-frequency comparison (A14 second level)
    assert "shard key recommendations" in out
    assert "per-shard update frequency" in out


def test_cli_route_and_sample(tmp_path, capsys):
    from oplog_analyzer_ray.__main__ import cmd_route, cmd_sample

    class R:
        sf_dir = SF_DIR
        out = str(tmp_path / "routed")
        units_per_commit = None
        shard_indexes = [0, 2]

    cmd_route(R())
    out = capsys.readouterr().out
    assert "2 partitions" in out and "watermark" in out

    class S:
        sf_dir = SF_DIR
        k = 3

    cmd_sample(S())
    out = capsys.readouterr().out
    assert "membership" in out


def test_shard_key_catalog_and_sample_out(tmp_path, capsys):
    """S4 full contract: the shard-key metadata table is prepended to the
    sample output (SampleCommand.java:452-475) and the catalog covers every
    sharded namespace (config.* excluded, like config.collections)."""
    import json
    import os

    import pyarrow.parquet as pq

    from oplog_analyzer_ray.__main__ import cmd_sample
    from oplog_analyzer_ray.schema import NUM_BUCKETS, ROLE_CHANNELS
    from oplog_analyzer_ray.state.shardkeys import shard_key_catalog

    cat = shard_key_catalog()
    assert cat.num_rows == NUM_BUCKETS * len(set(ROLE_CHANNELS.values()))
    ns = cat.column("ns").to_pylist()
    assert all(not n.startswith("config.") for n in ns)
    assert cat.equals(shard_key_catalog())  # deterministic

    class S:
        sf_dir = SF_DIR
        k = 2
        out = str(tmp_path / "sample")

    cmd_sample(S())
    capsys.readouterr()
    written = pq.read_table(os.path.join(S.out, "shard_keys.parquet"))
    assert written.equals(cat)
    stats = json.load(open(os.path.join(S.out, "sample_stats.json")))
    assert next(iter(stats)) == "shard_keys"  # keys lead the stats report
    assert stats["shard_keys"]["bucket0.ingest"]["is_hashed"] is True
    assert stats["shard_keys"]["bucket1.ingest"]["is_hashed"] is False


def test_shard_key_recommendations_consult_patterns():
    """AnalyzeCommand.java:523-532: heavy-updates namespaces with a shard
    key get the distribution warning; everything else stays silent."""
    from oplog_analyzer_ray.pipelines.analyze import shard_key_recommendations
    from oplog_analyzer_ray.pipelines.core import collection_patterns

    recs = shard_key_recommendations(SF_DIR)
    heavy = {
        r.ns
        for r in collection_patterns(SF_DIR).to_pandas().itertuples()
        if r.pattern == "heavy-updates" and not r.ns.startswith("config.")
    }
    assert {r["ns"] for r in recs} == heavy
    for r in recs:
        assert "may not distribute large docs evenly" in r["recommendation"]
        assert r["key_fields"] in ("[conv_id]", "[ts, conv_id]")


def test_media_stage_stub_fails_fast():
    import pytest

    from oplog_analyzer_ray.stages.media import (
        MediaFeatureStage,
        MediaFrameSampleStage,
    )

    with pytest.raises(NotImplementedError, match="codec"):
        MediaFeatureStage(codec="libjpeg")
    with pytest.raises(NotImplementedError, match="codec"):
        MediaFrameSampleStage(codec="ffmpeg")


def test_cli_analyze_csv_export(tmp_path, capsys):
    import os

    from oplog_analyzer_ray.__main__ import cmd_analyze

    class A:
        sf_dir = SF_DIR
        csv_out = str(tmp_path / "report")

    cmd_analyze(A())
    out = capsys.readouterr().out
    assert "4 report tables" in out
    files = sorted(os.listdir(A.csv_out))
    assert files == ["collection_patterns.csv", "shard_skew.csv",
                     "shard_workloads.csv", "update_freq_by_shard.csv"]
    head = open(os.path.join(A.csv_out, "shard_workloads.csv")).readline()
    assert head.strip() == "shard,total_ops,total_bytes,avg_bytes_per_op,workload_group"


def test_cli_sample_export(tmp_path, capsys):
    import json
    import os

    from oplog_analyzer_ray.__main__ import cmd_sample

    class S:
        sf_dir = SF_DIR
        k = 3
        out = str(tmp_path / "sample")

    cmd_sample(S())
    assert "wrote sample" in capsys.readouterr().out
    stats = json.load(open(os.path.join(S.out, "sample_stats.json")))
    assert stats["k"] == 3 and stats["followed_events"] > 0
    assert os.path.exists(os.path.join(S.out, "membership.parquet"))
    # partitioned by ns
    assert any(d.startswith("ns=") for d in os.listdir(os.path.join(S.out, "events")))
