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


def test_external_store_stage_cache_and_fallback(tmp_path):
    """ST1 dynamic variant: per-actor cache (no re-query for seen keys),
    micro-batched IN lookups, store-miss falls back to the event size."""
    import sqlite3

    from oplog_analyzer_ray.stages.external import ExternalDocSizeStage

    db = str(tmp_path / "store.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE doc_sizes (conv_id TEXT PRIMARY KEY, doc_size INTEGER)")
    con.executemany(
        "INSERT INTO doc_sizes VALUES (?, ?)",
        [("conv1", 1000), ("conv2", 2000), ("conv3", 3000)],
    )
    con.commit()
    con.close()

    stage = ExternalDocSizeStage(db, in_chunk=2)
    b1 = pa.table(
        {"conv_id": pa.array(["conv1", "conv2", "conv9", "conv1"]),
         "size": pa.array([10, 20, 30, 40], pa.int64())}
    )
    out1 = stage(b1)
    # conv9 absent from the store -> falls back to its own size
    assert out1.column("ext_doc_size").to_pylist() == [1000, 2000, 30, 1000]
    assert out1.column("store_hit").to_pylist() == [1, 1, 0, 1]
    # 3 distinct keys at in_chunk=2 -> exactly 2 IN(...) roundtrips
    assert stage.store_queries == 2

    # second batch: all keys already cached (incl. the confirmed miss) ->
    # ZERO further store roundtrips; only conv5 is new
    b2 = pa.table(
        {"conv_id": pa.array(["conv2", "conv9", "conv5"]),
         "size": pa.array([5, 6, 7], pa.int64())}
    )
    out2 = stage(b2)
    assert out2.column("ext_doc_size").to_pylist() == [2000, 6, 7]
    assert stage.store_queries == 3  # one micro-batch for the single new key


def test_ensure_store_matches_formula(tmp_path):
    """The synthesized store must equal the oracle's inline formula."""
    import sqlite3

    from oplog_analyzer_ray.stages.external import (
        _store_doc_size,
        ensure_store,
    )

    db = ensure_store("/root/testdata/sf0.001")
    con = sqlite3.connect(f"file:{db}?mode=ro", uri=True)
    rows = dict(con.execute("SELECT conv_id, doc_size FROM doc_sizes").fetchall())
    assert rows, "store is empty"
    for cid, v in list(rows.items())[:50]:
        assert v == _store_doc_size(int(cid[4:]))
    # absent keys really are the n % 10 == 7 convs
    assert all(int(cid[4:]) % 10 != 7 for cid in rows)
