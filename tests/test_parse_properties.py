"""Property-based tests (hypothesis): the parse stage must be total — any
text/role/tool input parses without error, conserves per-turn identity, and
obeys the size/flatten invariants (SURVEY.md §5.5)."""

import hypothesis.strategies as st
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings

from oplog_analyzer_ray.stages.parse import parse_classify

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)
role_st = st.sampled_from(["user", "assistant", "system", "tool"])
tool_st = st.sampled_from(["search", "code", "browser", "calc", "none"])


@st.composite
def transcript_table(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    rows = [
        (
            f"conv{draw(st.integers(0, 99)):08d}",
            i,
            draw(role_st),
            draw(text_st),
            draw(tool_st),
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([1_000_000 * r[1] for r in rows], pa.timestamp("us")),
        }
    )


@settings(max_examples=200, deadline=None)
@given(transcript_table())
def test_parse_is_total_and_invariant(t):
    out = parse_classify(t)
    # never loses a non-config turn; never crashes on arbitrary text
    parents = out.filter(pc.equal(out["event_seq"], 0))
    n_config = sum(
        1
        for r, x in zip(t["role"].to_pylist(), t["text"].to_pylist())
        if r == "system" and x.startswith("[config]")
    )
    assert parents.num_rows == t.num_rows - n_config
    # parent size == byte length of text (ASCII input)
    sizes = {
        (r["conv_id"], r["turn_idx"]): r["size"] for r in parents.to_pylist()
    }
    for r in t.to_pylist():
        key = (r["conv_id"], r["turn_idx"])
        if key in sizes:
            assert sizes[key] == len(r["text"].encode())
    # op_class domain
    assert set(out["op_class"].to_pylist()) <= {"i", "u", "d", "c", "n", "x"}
    # inner rows only from multi-token assistant turns; size = parent//k
    inners = out.filter(pc.greater(out["event_seq"], 0))
    for r in inners.to_pylist():
        parent = [
            p
            for p in parents.to_pylist()
            if (p["conv_id"], p["turn_idx"]) == (r["conv_id"], r["turn_idx"])
        ][0]
        assert parent["op_class"] == "c"
        assert r["size"] == parent["size"] // parent["diff_fields"]
