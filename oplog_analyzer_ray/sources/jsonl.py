"""Newline-delimited-JSON transcript source (S3 alternate wire format).

The reference ingests the same records from two containers — a live
capped-collection tail and framed BSON dump files (BaseOplogCommand.java's
reader vs SampleCommand's file writer).  The engine's analogue: the same
transcript rows as Parquet (columnar, the fast path) or JSONL (the
interchange path most log shippers emit).  Both normalize to
``schema.TRANSCRIPT_SCHEMA`` so every downstream stage is
format-oblivious.

Normalization is vectorized arrow casts — ISO-8601 ``ts`` strings cast
straight to ``timestamp[us]`` (arrow parses ISO natively; no Python
datetime loop).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..schema import TRANSCRIPT_SCHEMA


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        col = t.column(field.name)
        if field.name == "ts" and pa.types.is_string(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        elif col.type != field.type:
            col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols, schema=TRANSCRIPT_SCHEMA)


def read_transcripts_jsonl(path: str) -> Dataset:
    """Read JSONL transcript files (dir or glob) and normalize to the
    canonical transcript schema; drop-in replacement for the Parquet
    source in front of ``parse_classify``."""
    ds = ray.data.read_json(path)
    return ds.map_batches(_normalize, batch_format="pyarrow")
