"""Schemas, lookup tables, and classification constants.

The transcript input schema is fixed by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``.

The classification constants below are the graft of the reference's oplog
conventions (SURVEY.md §1.4):

- ``op_class`` (i/u/d/c/n) mirrors the oplog ``op`` field
  (reference: BaseOplogCommand.java:94, TailCommand.java:563-564).
- ``ns`` ("bucketN.channel" / "config.channel") mirrors the oplog ``ns``
  "db.collection" namespace (BaseOplogCommand.java:93); system rows get a
  ``config.`` prefix so the reference's config-namespace exclusion filter
  (TailCommand.java:566-568) grafts 1:1.
- The lookup tables mirror the reference's broadcast-style classification
  maps / fetchDocSizes lookup join (TailCommand.java:398-463).

Every constant here is mirrored EXACTLY in the DuckDB oracle SQL
(__ray_entry__.py) — change both together.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- input schema
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "code", "browser", "calc", "none")

# ------------------------------------------------------------- classification
# role -> channel (the "collection" half of the namespace).
ROLE_CHANNELS = {
    "user": "ingest",
    "assistant": "reply",
    "system": "control",
    "tool": "exec",
}

# role(/tool) -> op_class, the oplog op-type analogue (i/u/d/c/n):
#   user                     -> 'i'  (insert: new content enters)
#   assistant & tool!='none' -> 'u'  (update: acts via a tool)
#   assistant & tool=='none' -> 'n'  (noop/info)
#   tool                     -> 'd'  (tool result; delete-slot analogue)
#   system                   -> 'c'  (command)
#   assistant & >=2 tool tokens in text -> 'c' (multi-event command,
#       the applyOps analogue — see stages/parse.py and ScanCommand.java:361-393)

# tool -> category (enrichment lookup table; fallback 'unknown' mirrors the
# reference's fallback-to-oplog-size on lookup miss, TailCommand.java:447).
TOOL_CATEGORIES = {
    "search": "retrieval",
    "code": "execution",
    "browser": "web",
    "calc": "math",
    "none": "none",
}
TOOL_CATEGORY_FALLBACK = "unknown"

# tool -> typical document size (the fetchDocSizes graft: the reference
# fetches ACTUAL doc sizes from the live collection and records -1 when the
# lookup misses, excluding those from averages — TailCommand.java:176-181,
# 432-459).  Here the lookup table is the broadcast side; tools without an
# entry (and 'none') yield NULL doc_size (the -1 sentinel becomes null).
TOOL_DOC_SIZES = {
    "search": 1400,
    "code": 2200,
    "browser": 3100,
    "calc": 300,
}

# number of conv_id hash buckets in the namespace ("db" half).
NUM_BUCKETS = 8

# op_class -> sink (routing fan-out key; per-sink parquet dirs / counts).
OP_SINKS = {
    "i": "ops_i",
    "u": "ops_u",
    "d": "ops_d",
    "c": "ops_c",
    "n": "ops_n",
    "x": "rejects",
}

# size-threshold histogram buckets (strict '>' per EntryAccumulator.java:67).
SIZE_BUCKETS = (512, 4096)

# markers recognised by the parser (mirrored in synth.py + oracle SQL)
TOOL_TOKEN_REGEX = r"\[tool:([a-z]+)\]"  # extracts tool-invocation events
ANY_TOKEN_REGEX = r"\[[a-z]+:[^\]]*\]"  # any bracketed op-like token
CORRUPT_PREFIX = "[corrupt]"  # parse-failure rows -> reject sink
CONFIG_PREFIX = "[config]"  # system housekeeping -> config.* namespace

# ---------------------------------------------------------------- event schema
# Output of the parse/classify/flatten stage (FIXTURES.md F3).
EVENT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("event_seq", pa.int32()),  # 0 = parent/plain row; 1..k = exploded inner
        ("ns", pa.string()),
        ("op_class", pa.string()),
        ("size", pa.int64()),
        ("tool", pa.string()),
        ("diff_fields", pa.int32()),
        ("total_elements", pa.int32()),
        ("gt_512", pa.int8()),
        ("gt_4096", pa.int8()),
        ("ts", pa.timestamp("us")),
    ]
)
