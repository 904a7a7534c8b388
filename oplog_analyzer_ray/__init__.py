"""Ray-Data-native log/transcript processing engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``mhelmstetter/oplog-analyzer`` (see SURVEY.md), re-expressed
Ray-Data-first over Parquet tables of multi-turn conversation/agent
transcripts: ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  schema     — input/derived schemas, lookup tables, classify constants
  synth      — deterministic transcript corpus generator (test/bench input)
  sources    — parquet readers with pruning/pushdown (SURVEY §2.1)
  stages     — parse/classify/flatten, enrichment actors, routing (§2.2-2.5)
  pipelines  — flagship pipeline + aggregate queries (§2.6, §3.4)
  functions  — id canonicalization, text analysis, dedup, similarity (§2.9+)
  state      — checkpoint manifest + resume (§2.10, north_rule)
"""

__version__ = "0.1.0"
