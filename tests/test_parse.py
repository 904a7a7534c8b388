"""Unit tests for the parse/classify/flatten stage on hand-built tiny tables
(SURVEY.md §5.1): classification rules, applyOps-style flatten with integer
size split (ScanCommand.java:384 semantics), config exclusion, reject tagging,
threshold pre-columns, and null-over-sentinel diff stats."""

import pyarrow as pa
import pyarrow.compute as pc

from oplog_analyzer_ray.stages.parse import parse_classify


def _tbl(rows):
    cols = {
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([1_000_000 * r[1] for r in rows], pa.timestamp("us")),
    }
    return pa.table(cols)


def _by_key(out):
    d = {}
    for row in out.to_pylist():
        d[(row["conv_id"], row["turn_idx"], row["event_seq"])] = row
    return d


def test_classification_rules():
    out = parse_classify(
        _tbl(
            [
                ("conv00000001", 0, "user", "hello there", "none"),
                ("conv00000001", 1, "assistant", "[tool:search] looking", "search"),
                ("conv00000001", 2, "assistant", "plain reply", "none"),
                ("conv00000001", 3, "tool", "result body", "search"),
                ("conv00000001", 4, "system", "sys note", "none"),
                ("conv00000001", 5, "system", "[config] housekeeping", "none"),
                ("conv00000001", 6, "user", "[corrupt] garbage", "none"),
            ]
        )
    )
    d = _by_key(out)
    assert d[("conv00000001", 0, 0)]["op_class"] == "i"
    assert d[("conv00000001", 1, 0)]["op_class"] == "u"
    assert d[("conv00000001", 2, 0)]["op_class"] == "n"
    assert d[("conv00000001", 3, 0)]["op_class"] == "d"
    assert d[("conv00000001", 4, 0)]["op_class"] == "c"
    assert ("conv00000001", 5, 0) not in d  # config rows dropped (F1)
    assert d[("conv00000001", 6, 0)]["op_class"] == "x"  # reject path
    # namespace shape: bucket<conv%8>.<channel>
    assert d[("conv00000001", 0, 0)]["ns"] == "bucket1.ingest"
    assert d[("conv00000001", 3, 0)]["ns"] == "bucket1.exec"


def test_multi_token_flatten_integer_size_split():
    text = "[tool:search] [tool:code] [tool:calc] body"  # 3 inner events
    out = parse_classify(_tbl([("conv00000002", 0, "assistant", text, "search")]))
    d = _by_key(out)
    parent = d[("conv00000002", 0, 0)]
    assert parent["op_class"] == "c"  # multi-event command; parent counted too
    assert parent["size"] == len(text)
    inners = [d[("conv00000002", 0, s)] for s in (1, 2, 3)]
    assert [r["op_class"] for r in inners] == ["u", "u", "u"]
    assert [r["tool"] for r in inners] == ["search", "code", "calc"]
    assert all(r["size"] == len(text) // 3 for r in inners)  # integer division
    assert parent["diff_fields"] == 3 and parent["total_elements"] == 3
    assert inners[0]["diff_fields"] is None  # null, not a -1 sentinel


def test_threshold_precolumns_strict_gt():
    big = "x" * 513
    out = parse_classify(_tbl([("conv00000003", 0, "user", big, "none"),
                               ("conv00000003", 1, "user", "x" * 512, "none")]))
    d = _by_key(out)
    assert d[("conv00000003", 0, 0)]["gt_512"] == 1
    assert d[("conv00000003", 1, 0)]["gt_512"] == 0  # strict '>'


def test_output_longer_than_input_and_sizes_conserved_per_turn():
    t = _tbl(
        [
            ("conv00000004", 0, "assistant", "[tool:search] [tool:code] ab", "code"),
            ("conv00000004", 1, "user", "plain", "none"),
        ]
    )
    out = parse_classify(t)
    assert out.num_rows == 4  # 2 parents + 2 inners
    sizes = pc.sum(out.filter(pc.greater(out["event_seq"], 0))["size"]).as_py()
    assert sizes == 2 * (28 // 2)


def test_jsonl_source_equals_parquet_source(tmp_path):
    """The JSONL wire format normalizes to the same canonical schema: the
    parse output over JSONL-roundtripped rows equals the Parquet path."""
    import glob
    import json

    import pyarrow.parquet as pq

    from oplog_analyzer_ray.sources import read_transcripts_jsonl
    from oplog_analyzer_ray.synth import ensure_transcripts

    src = ensure_transcripts("/root/testdata/sf0.001")
    f = sorted(glob.glob(src + "/*.parquet"))[0]
    t = pq.read_table(f)
    rows = t.to_pylist()[:500]
    p = tmp_path / "turns.jsonl"
    with open(p, "w") as fh:
        for r in rows:
            r["ts"] = r["ts"].isoformat()
            fh.write(json.dumps(r) + "\n")

    via_jsonl = (
        read_transcripts_jsonl(str(p))
        .map_batches(parse_classify, batch_format="pyarrow")
        .to_pandas()
    )
    import ray.data

    via_parquet = (
        ray.data.from_arrow(t.slice(0, 500))
        .map_batches(parse_classify, batch_format="pyarrow")
        .to_pandas()
    )
    cols = sorted(via_jsonl.columns)
    a = via_jsonl[cols].sort_values(cols).reset_index(drop=True)
    b = via_parquet[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
