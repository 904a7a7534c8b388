"""End-to-end parity: every queries() entry vs its DuckDB oracle (SURVEY.md §5.2).

Runs at sf0.001 for speed; the driver repeats the same comparison at sf0.01.
"""

import duckdb
import pytest

import __ray_entry__ as entrymod
from oplog_analyzer_ray import oracle
from oplog_analyzer_ray.synth import ensure_transcripts

from .util import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"

_BODIES = {
    "sink_counts": oracle.SINK_COUNTS,
    "bucket_histogram": oracle.BUCKET_HISTOGRAM,
    "hot_keys_topk": oracle.HOT_KEYS_TOPK,
    "events_flatten": oracle.EVENTS_FLATTEN,
    "rejects": oracle.REJECTS,
    "global_scalars": oracle.GLOBAL_SCALARS,
    "diff_stats": oracle.DIFF_STATS,
    "category_counts": oracle.CATEGORY_COUNTS,
    "per_shard_stats": oracle.PER_SHARD_STATS,
    "update_freq": oracle.UPDATE_FREQ,
    "collection_patterns": oracle.COLLECTION_PATTERNS,
    "routed_text": oracle.ROUTED_TEXT,
}


def _oracle_sql_for(name: str) -> str:
    ensure_transcripts(SF_DIR)
    if name == "filtered_events":
        return oracle.filters_sql(SF_DIR)
    return oracle.events_cte(SF_DIR) + _BODIES[name]


@pytest.mark.parametrize("name", sorted(list(_BODIES) + ["filtered_events"]))
def test_query_matches_oracle(name, duck):
    fn = entrymod.queries()[name]
    got = fn(SF_DIR)
    want = duck.execute(_oracle_sql_for(name)).fetchdf()
    assert_frames_match(got, want, name)


def test_oracle_sql_keys_cover_queries():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) == set(qs)
