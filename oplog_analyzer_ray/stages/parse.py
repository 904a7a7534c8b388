"""Vectorized parse / classify / flatten stage (SURVEY.md §2.2 M1-M5, §2.3 F1).

One zero-copy ``map_batches(parse_classify, batch_format="pyarrow")`` stage
that grafts the reference's per-document tokenize/classify loop
(BaseOplogCommand.java:91-95, TailCommand.java:562-580) into Arrow kernels:

- M1 entry parser/classifier: ``size = binary_length(text)`` (the
  ``byteBuffer.remaining()`` analogue, BaseOplogCommand.java:92), derived
  ``ns`` and ``op_class`` columns.
- M2/M3 id extraction: ``conv_id`` is the document identity (the _id graft);
  see functions/ids.py for the type-dispatched canonicalizer.
- M4 applyOps flattener (ScanCommand.java:361-393, TailCommand.java:637-669):
  an assistant turn whose text embeds >=2 ``[tool:name]`` tokens is a
  multi-event "command" — it emits the PARENT row (op_class 'c', full size;
  the reference counts the parent too, ScanCommand.java:392) plus one inner
  row per token with op_class 'u' and ``size = parent_size // k`` (integer
  division, ScanCommand.java:384).
- M5 update diff statistics (TailCommand.java:1272-1332): ``diff_fields`` =
  tool-token count, ``total_elements`` = all bracketed op-like tokens; only
  populated for update/command parent rows, Arrow-null otherwise (the
  reference's -1 unknown sentinel becomes null — TailCommand.java:176-181).
- F1 system-namespace exclusion (TailCommand.java:566-568): system
  housekeeping turns map to ``config.<channel>`` namespaces and are dropped.
- F10 reject routing (AnalyzeCommand.java:265-287 shape-sniff analogue):
  corrupt rows are tagged op_class 'x' and kept for the reject sink.
- A2 threshold pre-columns: ``gt_512``/``gt_4096`` (strict '>' per
  EntryAccumulator.java:67), summed later by the grouped aggregate.

All classification logic is mirrored 1:1 by the DuckDB oracle SQL in
``oracle.py``. The hot path is pure pyarrow.compute (no Python-object
conversions); only the small multi-token fraction (~1-2% of rows) takes a
pandas ``str.findall`` detour to extract inner token lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import (
    ANY_TOKEN_REGEX,
    CONFIG_PREFIX,
    CORRUPT_PREFIX,
    NUM_BUCKETS,
    ROLE_CHANNELS,
    TOOL_TOKEN_REGEX,
)

assert NUM_BUCKETS & (NUM_BUCKETS - 1) == 0, "NUM_BUCKETS must be a power of two"

_NULL_I32 = pa.scalar(None, pa.int32())


def _map_values(arr, mapping: dict[str, str], default: str):
    """Vectorized dict lookup with fallback (no per-row Python)."""
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array(list(mapping.values()) + [default], pa.string())
    idx = pc.index_in(arr, value_set=keys)
    return pc.take(vals, pc.fill_null(idx, len(mapping)))


_INPUT_COLS = frozenset({"conv_id", "turn_idx", "role", "text", "tool", "ts"})


def parse_classify(batch: pa.Table) -> pa.Table:
    """pa.Table(transcript rows) -> pa.Table(event rows); len(out) >= len(in).

    Extra (non-input-schema) columns — e.g. the ``part`` lineage column the
    routing stage adds from the input file path — pass through unchanged
    (replicated onto exploded inner rows).
    """
    passthrough = [c for c in batch.column_names if c not in _INPUT_COLS]
    text = batch.column("text")
    role = batch.column("role")
    tool = batch.column("tool")
    conv = batch.column("conv_id")

    size = pc.cast(pc.binary_length(text), pa.int64())
    n_tok = pc.cast(pc.count_substring_regex(text, TOOL_TOKEN_REGEX), pa.int64())
    n_any = pc.cast(pc.count_substring_regex(text, ANY_TOKEN_REGEX), pa.int32())

    corrupt = pc.starts_with(text, CORRUPT_PREFIX)
    is_config = pc.and_(pc.equal(role, "system"), pc.starts_with(text, CONFIG_PREFIX))
    not_corrupt = pc.invert(corrupt)
    is_assistant = pc.equal(role, "assistant")
    multi = pc.and_(pc.and_(is_assistant, pc.greater_equal(n_tok, 2)), not_corrupt)

    # first true condition wins (mirrors the CASE order in oracle.py)
    op_class = pc.case_when(
        pc.make_struct(
            corrupt,
            multi,
            pc.equal(role, "user"),
            pc.and_(is_assistant, pc.not_equal(tool, "none")),
            is_assistant,
            pc.equal(role, "tool"),
            pc.equal(role, "system"),
        ),
        "x", "c", "i", "u", "n", "d", "c", "n",
    )

    channel = _map_values(role, ROLE_CHANNELS, "exec")
    bkt = pc.bit_wise_and(
        pc.cast(pc.utf8_slice_codeunits(conv, 4), pa.int64()), NUM_BUCKETS - 1
    )
    ns = pc.if_else(
        is_config,
        pc.binary_join_element_wise("config.", channel, ""),
        pc.binary_join_element_wise(
            "bucket", pc.cast(bkt, pa.string()), ".", channel, ""
        ),
    )

    has_diff = pc.and_(pc.is_in(op_class, value_set=pa.array(["u", "c"])), not_corrupt)
    diff_fields = pc.if_else(has_diff, pc.cast(n_tok, pa.int32()), _NULL_I32)
    total_elements = pc.if_else(has_diff, n_any, _NULL_I32)

    n = batch.num_rows
    full = pa.table(
        {
            "conv_id": conv,
            "turn_idx": batch.column("turn_idx"),
            "event_seq": pa.array(np.zeros(n, dtype=np.int32)),
            "ns": ns,
            "op_class": op_class,
            "size": size,
            "tool": tool,
            "diff_fields": diff_fields,
            "total_elements": total_elements,
            "gt_512": pc.cast(pc.greater(size, 512), pa.int8()),
            "gt_4096": pc.cast(pc.greater(size, 4096), pa.int8()),
            "ts": batch.column("ts"),
            "text": text,
        }
    )
    for c in passthrough:
        full = full.append_column(c, batch.column(c))
    keep = pc.invert(is_config)
    parents = full.filter(keep)

    # M4: explode inner tool events for multi-token command turns (small slice)
    expl_mask = pc.and_(multi, keep)
    if pc.any(expl_mask).as_py():
        sub = full.filter(expl_mask)
        toks = pd.Series(sub.column("text").to_pandas()).str.findall(TOOL_TOKEN_REGEX)
        k = toks.str.len().to_numpy().astype(np.int64)
        rep = np.repeat(np.arange(len(k)), k)
        rep_idx = pa.array(rep)
        seq = np.concatenate([np.arange(1, c + 1, dtype=np.int32) for c in k])
        in_size = pc.floor(
            pc.divide(
                pc.cast(pc.take(sub.column("size"), rep_idx), pa.float64()),
                pa.array(np.repeat(k, k), pa.float64()),
            )
        )
        in_size = pc.cast(in_size, pa.int64())
        inners = pa.table(
            {
                "conv_id": pc.take(sub.column("conv_id"), rep_idx),
                "turn_idx": pc.take(sub.column("turn_idx"), rep_idx),
                "event_seq": pa.array(seq),
                "ns": pc.take(sub.column("ns"), rep_idx),
                "op_class": pa.array(["u"] * len(rep), pa.string()),
                "size": in_size,
                "tool": pa.array(np.concatenate(toks.to_numpy()), pa.string())
                if len(rep)
                else pa.array([], pa.string()),
                "diff_fields": pa.array([None] * len(rep), pa.int32()),
                "total_elements": pa.array([None] * len(rep), pa.int32()),
                "gt_512": pc.cast(pc.greater(in_size, 512), pa.int8()),
                "gt_4096": pc.cast(pc.greater(in_size, 4096), pa.int8()),
                "ts": pc.take(sub.column("ts"), rep_idx),
                "text": pa.array([None] * len(rep), pa.string()),
            }
        )
        for c in passthrough:
            inners = inners.append_column(c, pc.take(sub.column(c), rep_idx))
        return pa.concat_tables([parents, inners])
    return parents
