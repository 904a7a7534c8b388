"""Ray-Data-native log/transcript processing engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``mhelmstetter/oplog-analyzer`` (see SURVEY.md), re-expressed
Ray-Data-first over Parquet tables of multi-turn conversation/agent
transcripts: ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  schema     — input/derived schemas, lookup tables, classify constants
  synth      — deterministic transcript corpus generator (test/bench input)
  sources    — parquet reader API (column-pruned reads; SURVEY §2.1)
  stages     — parse/classify/flatten, enrichment (actors + task variant),
               multimodal payload stage (§2.2-2.5)
  pipelines  — core queries, agg engine (grouped/topk), routing + manifest,
               sampling, analyze reports, dedup, similarity, text analysis,
               windowed events, declarative builder (§2.6-2.11, §3.4)
  functions  — report formatting utilities (M7/M8)
  state      — checkpoint manifest + resume (§2.10, north_rule)
"""

__version__ = "0.1.0"
