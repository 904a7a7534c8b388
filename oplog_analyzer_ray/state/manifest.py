"""Checkpoint manifest: per-partition lineage + metrics for exact resume.

The reference has no checkpointing at all — ``tail`` restarts at the *latest*
oplog ts, silently losing the gap (TailCommand.java:1476-1482), and the only
artifact "checkpoint" is the lossy stats-JSON reload
(AnalyzeCommand.java:811-816).  The north_rule mandates the opposite: lossless
per-partition lineage so a resumed run skips finished partitions and produces
byte-identical sink counts.

Design:
- checkpoint unit = one input shard (parquet file).  Units are committed in
  groups (one streaming Dataset job per group); a group's manifest entries are
  appended ATOMICALLY (write tmp + ``os.replace``), so a crash leaves either
  no trace of the group or the complete entries.
- each entry records: input file, rows written, per-sink row counts, max event
  ``ts`` (the watermark), output files, and wall seconds — the "per-partition
  lineage and row-count metrics" of the north_rule.
- metrics are derived from the WRITTEN parquet footers (row counts + column
  statistics), not from a second pass over the data: exact, and free.
"""

from __future__ import annotations

import json
import os
from typing import Any


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self._entries: dict[str, dict[str, Any]] = {}
        self._meta: dict[str, Any] = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            self._entries = {e["unit"]: e for e in data["units"]}
            self._meta = data.get("meta", {})

    def ensure_meta(self, meta: dict[str, Any]) -> None:
        """Record the run's row-filter window (start_ts/end_ts) and refuse
        to RESUME under a different one: committed units contain only
        in-window rows, so a rerun with a wider (or no) window would see
        every unit as finished and silently return routed output that
        permanently lacks the out-of-window rows.  A pre-meta manifest
        (older runs) adopts the current window without complaint."""
        if self._entries and self._meta and self._meta != meta:
            raise ValueError(
                f"manifest at {self.path} was committed under filter window "
                f"{self._meta}, but this run uses {meta} — committed units "
                "hold only the old window's rows, so resuming would produce "
                "incomplete output; use a fresh out_root for a new window"
            )
        self._meta = meta

    @property
    def units(self) -> dict[str, dict[str, Any]]:
        return dict(self._entries)

    def finished(self) -> set[str]:
        return set(self._entries)

    def commit(self, entries: list[dict[str, Any]]) -> None:
        """Atomically append a group of finished-unit entries."""
        for e in entries:
            self._entries[e["unit"]] = e
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": 1,
                    "meta": self._meta,
                    "units": list(self._entries.values()),
                },
                f,
                indent=1,
            )
        os.replace(tmp, self.path)

    # ------------------------------------------------------------- rollups
    def sink_totals(self) -> dict[str, int]:
        tot: dict[str, int] = {}
        for e in self._entries.values():
            for sink, n in e["sink_counts"].items():
                tot[sink] = tot.get(sink, 0) + n
        return tot

    def watermark(self) -> str | None:
        """max event ts over finished units (the resume watermark, the
        graft of the reference's 'latest ts' anchor — but lossless)."""
        marks = [e["max_ts"] for e in self._entries.values() if e.get("max_ts")]
        return max(marks) if marks else None
