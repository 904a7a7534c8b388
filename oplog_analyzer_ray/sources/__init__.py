"""Source readers (SURVEY.md §2.1).

All inputs are Parquet via ``ray.data.read_parquet`` with column pruning;
the transcript corpus reader also owns the deterministic generate-once cache
(synth.py).  Re-exported here as the engine's source API surface.
"""

from ..pipelines.core import filtered_transcript_scan, read_transcripts
from ..pipelines.events import read_events
from ..pipelines.route import read_routed
from ..pipelines.similarity import read_embeddings
from ..pipelines.text import read_documents
from .jsonl import read_transcripts_jsonl

__all__ = [
    "read_transcripts",
    "read_transcripts_jsonl",
    "filtered_transcript_scan",
    "read_documents",
    "read_events",
    "read_embeddings",
    "read_routed",
]
