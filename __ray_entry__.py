"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→aggregate pipeline on sf0.001.
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (run by the driver
at sf=0.01; row-count + schema + order-insensitive value-hash must match).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from oplog_analyzer_ray import oracle
from oplog_analyzer_ray.pipelines import core
from oplog_analyzer_ray.synth import ensure_transcripts

_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline (parse → enrich → per-sink grouped stats) @ sf0.001."""
    return core.sink_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- transcript log pipeline (SURVEY.md §2; north-rule surface) ---
        "sink_counts": core.sink_counts,  # A1/A4/A8 exact-match target
        "bucket_histogram": core.bucket_histogram,  # A2
        "hot_keys_topk": core.hot_keys_topk,  # A5/A6
        "events_flatten": core.events_flatten,  # M4
        "rejects": core.rejects,  # F10
        "global_scalars": core.global_scalars,  # A9
        "diff_stats": core.diff_stats,  # M5/A3
        "category_counts": core.category_counts,  # J2/ST1
        "per_shard_stats": core.per_shard_stats,  # A8
        "update_freq": core.update_freq,  # A14
        "collection_patterns": core.collection_patterns,  # A11
        "routed_text": core.routed_text,  # north-rule text equality
        "filtered_events": core.filtered_events,  # F2/F3/F4/F7
    }


def oracle_sql() -> dict[str, str]:
    # the oracle reads the same deterministic transcript corpus the Ray side
    # reads; generate it (idempotent, cached) so the SQL paths resolve.
    ensure_transcripts(_ORACLE_SF_DIR)
    cte = oracle.events_cte(_ORACLE_SF_DIR)
    return {
        "sink_counts": cte + oracle.SINK_COUNTS,
        "bucket_histogram": cte + oracle.BUCKET_HISTOGRAM,
        "hot_keys_topk": cte + oracle.HOT_KEYS_TOPK,
        "events_flatten": cte + oracle.EVENTS_FLATTEN,
        "rejects": cte + oracle.REJECTS,
        "global_scalars": cte + oracle.GLOBAL_SCALARS,
        "diff_stats": cte + oracle.DIFF_STATS,
        "category_counts": cte + oracle.CATEGORY_COUNTS,
        "per_shard_stats": cte + oracle.PER_SHARD_STATS,
        "update_freq": cte + oracle.UPDATE_FREQ,
        "collection_patterns": cte + oracle.COLLECTION_PATTERNS,
        "routed_text": cte + oracle.ROUTED_TEXT,
        "filtered_events": oracle.filters_sql(_ORACLE_SF_DIR),
    }
