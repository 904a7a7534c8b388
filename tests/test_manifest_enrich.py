"""Unit tests: manifest atomicity/rollups and enrichment lookup fallback."""

import json
import os

import pyarrow as pa
import ray

from oplog_analyzer_ray.stages.enrich import EnrichStage, put_lookups
from oplog_analyzer_ray.state.manifest import Manifest


def test_manifest_atomic_commit_and_reload(tmp_path):
    p = str(tmp_path / "m" / "manifest.json")
    m = Manifest(p)
    m.commit([
        {"unit": "part-000", "rows": 10, "sink_counts": {"ops_i": 7, "rejects": 3},
         "max_ts": "2025-01-01T00:10:00"},
    ])
    m.commit([
        {"unit": "part-001", "rows": 5, "sink_counts": {"ops_i": 5},
         "max_ts": "2025-01-01T00:20:00"},
    ])
    # no stray tmp file; valid JSON on disk
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
    data = json.load(open(p))
    assert len(data["units"]) == 2

    # reload sees both; rollups correct; re-commit of a unit overwrites
    m2 = Manifest(p)
    assert m2.finished() == {"part-000", "part-001"}
    assert m2.sink_totals() == {"ops_i": 12, "rejects": 3}
    assert m2.watermark() == "2025-01-01T00:20:00"
    m2.commit([{"unit": "part-000", "rows": 11,
                "sink_counts": {"ops_i": 11}, "max_ts": "2025-01-01T00:30:00"}])
    assert Manifest(p).sink_totals() == {"ops_i": 16}


def test_enrich_fallback_for_unknown_keys():
    ref = put_lookups()
    stage = EnrichStage(ref)
    t = pa.table(
        {
            "tool": pa.array(["search", "quantum_widget", None], pa.string()),
            "op_class": pa.array(["i", "z", "u"], pa.string()),
        }
    )
    out = stage(t)
    # miss → fallback, mirroring TailCommand.java:447's fallback-on-miss
    assert out.column("category").to_pylist() == ["retrieval", "unknown", "unknown"]
    assert out.column("sink").to_pylist() == ["ops_i", "rejects", "ops_u"]
