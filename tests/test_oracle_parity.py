"""End-to-end parity: every queries() entry vs its DuckDB oracle (SURVEY.md §5.2).

Runs at sf0.001 for speed; the driver repeats the same comparison at sf0.01.
Queries over the testdata tables (documents/events/embeddings) get those
views registered, mirroring the driver's pre-registered views.
"""

import duckdb
import pytest

import __ray_entry__ as entrymod
from oplog_analyzer_ray import oracle
from oplog_analyzer_ray.synth import ensure_transcripts

from .util import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"

_TRANSCRIPT_BODIES = {
    "sink_counts": oracle.SINK_COUNTS,
    "bucket_histogram": oracle.BUCKET_HISTOGRAM,
    "bucket_histogram_custom": oracle.bucket_histogram_custom_sql(),
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
    "first_events": oracle.FIRST_EVENTS,
    "threshold_alerts": oracle.THRESHOLD_ALERTS,
    "threshold_alerts_full": oracle.THRESHOLD_ALERTS_FULL,
    "size_percentiles": oracle.SIZE_PERCENTILES,
    "hot_keys_thresholded": oracle.HOT_KEYS_THRESHOLDED,
    "hot_keys_docsize": oracle.HOT_KEYS_DOCSIZE,
    "hot_keys_docsize_external": oracle.EXT_DOCSIZE_HOT_KEYS,
    "sample_membership": oracle.SAMPLE_MEMBERSHIP,
    "sampled_events": oracle.SAMPLED_EVENTS,
    "shard_workloads": oracle.SHARD_WORKLOADS,
    "shard_skew": oracle.SHARD_SKEW,
    "redacted_summaries": oracle.REDACTED_SUMMARIES,
    "redacted_docs": oracle.REDACTED_DOCS,
}

_TABLE_SQL = {
    "token_counts": oracle.TOKEN_COUNTS,
    "pack_sequences": oracle.PACK_SEQUENCES,
    "quality_budget_selection": oracle.QUALITY_BUDGET_SELECTION,
    "train_val_split": oracle.TRAIN_VAL_SPLIT,
    "tfidf_topk": oracle.TFIDF_TOPK,
    "decontaminate": oracle.DECONTAMINATE,
    "repetition_scores": oracle.REPETITION_SCORES,
    "source_mixture": oracle.SOURCE_MIXTURE,
    "token_rarity": oracle.TOKEN_RARITY,
    "token_counts_bpe": oracle.TOKEN_COUNTS_BPE,
    "ngram_topk": oracle.NGRAM_TOPK,
    "boilerplate_ngrams": oracle.BOILERPLATE_NGRAMS,
    "stratified_sample": oracle.STRATIFIED_SAMPLE,
    "rolling_fingerprints": oracle.ROLLING_FINGERPRINTS,
    "quality_scores": oracle.QUALITY_SCORES,
    "lang_id": oracle.LANG_ID,
    "doc_fingerprints": oracle.DOC_FINGERPRINTS,
    "exact_dedup": oracle.EXACT_DEDUP,
    "minhash_signatures": oracle.MINHASH_SIGNATURES,
    "simhash64": oracle.SIMHASH64,
    "simhash_near_dups": oracle.SIMHASH_NEAR_DUPS,
    "lsh_candidate_pairs": oracle.LSH_CANDIDATE_PAIRS,
    "near_dup_jaccard": oracle.NEAR_DUP_JACCARD,
    "containment_scores": oracle.CONTAINMENT_SCORES,
    "mutual_knn_pairs": oracle.MUTUAL_KNN_PAIRS,
    "concurrent_sessions": oracle.CONCURRENT_SESSIONS,
    "lang_confusion": oracle.LANG_CONFUSION,
    "dedup_clusters": oracle.DEDUP_CLUSTERS,
    "dedup_keep_best": oracle.DEDUP_KEEP_BEST,
    "dedup_cluster_sizes": oracle.DEDUP_CLUSTER_SIZES,
    "semantic_dedup": oracle.SEMANTIC_DEDUP,
    "knn_graph": oracle.KNN_GRAPH,
    "source_budget_allocation": oracle.SOURCE_BUDGET_ALLOCATION,
    "split_leakage_report": oracle.SPLIT_LEAKAGE_REPORT,
    "doc_length_percentiles": oracle.DOC_LENGTH_PERCENTILES,
    "curated_corpus": oracle.CURATED_CORPUS,
    "knn_bruteforce": oracle.KNN_BRUTEFORCE,
    "embedding_near_dups": oracle.EMBEDDING_NEAR_DUPS,
    "embedding_outlier_scores": oracle.EMBEDDING_OUTLIER_SCORES,
    "sessionization": oracle.SESSIONIZATION,
    "funnel": oracle.FUNNEL,
    "retention_cohorts": oracle.RETENTION_COHORTS,
    "approx_distinct_users": oracle.APPROX_DISTINCT_USERS,
    "approx_distinct_users_by_type": oracle.APPROX_DISTINCT_USERS_BY_TYPE,
    "purchase_attribution": oracle.PURCHASE_ATTRIBUTION,
    "tumbling_window": oracle.TUMBLING_WINDOW,
    "daily_active_users": oracle.DAILY_ACTIVE_USERS,
    "props_value_stats": oracle.PROPS_VALUE_STATS,
    "event_type_cooccurrence": oracle.EVENT_TYPE_COOCCURRENCE,
    "daily_anomalies": oracle.DAILY_ANOMALIES,
    "top_docs_per_source": oracle.TOP_DOCS_PER_SOURCE,
    "label_centroid_similarity": oracle.LABEL_CENTROID_SIMILARITY,
    "sliding_window": oracle.SLIDING_WINDOW,
    "media_features": oracle.MEDIA_FEATURES,
    "media_frame_sample": oracle.MEDIA_FRAME_SAMPLE,
    "media_resize": oracle.MEDIA_RESIZE,
    "kmeans_assign": oracle.KMEANS_ASSIGN,
    "power_users": oracle.POWER_USERS,
    "session_stats": oracle.SESSION_STATS,
    "top_event_paths": oracle.TOP_EVENT_PATHS,
    "inter_event_gaps": oracle.INTER_EVENT_GAPS,
    "hourly_activity": oracle.HOURLY_ACTIVITY,
    "doc_ttr": oracle.DOC_TTR,
    "zipf_slope": oracle.ZIPF_SLOPE,
    "dup_rate_by_source": oracle.DUP_RATE_BY_SOURCE,
    "near_dup_source_matrix": oracle.NEAR_DUP_SOURCE_MATRIX,
    "importance_sample": oracle.IMPORTANCE_SAMPLE,
    "eval_overlap_by_source": oracle.EVAL_OVERLAP_BY_SOURCE,
    "repeat_purchase_rate": oracle.REPEAT_PURCHASE_RATE,
    "conversion_lag_stats": oracle.CONVERSION_LAG_STATS,
    "trending_event_types": oracle.TRENDING_EVENT_TYPES,
    "rolling_wau": oracle.ROLLING_WAU,
    "value_percentiles": oracle.VALUE_PERCENTILES,
    "quality_deciles_by_source": oracle.QUALITY_DECILES_BY_SOURCE,
    "text_near_dup_search": oracle.TEXT_NEAR_DUP_SEARCH,
    "session_duration_percentiles": oracle.SESSION_DURATION_PERCENTILES,
    "substring_dedup": oracle.SUBSTRING_DEDUP,
    "prefix_dup_groups": oracle.PREFIX_DUP_GROUPS,
    "bigram_pmi": oracle.BIGRAM_PMI,
    "minhash_est_error": oracle.MINHASH_EST_ERROR,
    "event_transitions": oracle.EVENT_TRANSITIONS,
    "user_churn": oracle.USER_CHURN,
    "bounce_rate": oracle.BOUNCE_RATE,
}

# round-3: the ANN family now has exact SQL oracles (index artifacts
# embedded as literals, search re-derived in SQL) — nothing is rows-only
NO_ORACLE: set[str] = set()

# sf-parameterized SQL builders (the embedded plane/centroid literals are
# derived from the sf dir's embeddings table)
_SF_SQL = {
    "knn_lsh": oracle.knn_lsh_sql,
    "knn_ivf": oracle.knn_ivf_sql,
    "embedding_near_dups_lsh": oracle.embedding_near_dups_lsh_sql,
    "semantic_dedup_lsh": oracle.semantic_dedup_lsh_sql,
    "ann_recall_report": oracle.ann_recall_sql,
    "kmeans_refine": oracle.kmeans_refine_sql,
}


@pytest.fixture(scope="session")
def duck_views(duck):
    for t in ("documents", "events", "embeddings"):
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return duck


def _oracle_sql_for(name: str) -> str:
    if name == "filtered_events":
        ensure_transcripts(SF_DIR)
        return oracle.filters_sql(SF_DIR)
    if name == "conv_profiles":
        ensure_transcripts(SF_DIR)
        return oracle.conv_profiles_sql(SF_DIR)
    if name == "curated_conversations":
        ensure_transcripts(SF_DIR)
        return oracle.curated_conversations_sql(SF_DIR)
    if name == "update_freq_by_shard":
        ensure_transcripts(SF_DIR)
        return (
            oracle.events_cte(SF_DIR, with_part=True)
            + oracle.UPDATE_FREQ_BY_SHARD
        )
    if name in _TRANSCRIPT_BODIES:
        ensure_transcripts(SF_DIR)
        return oracle.events_cte(SF_DIR) + _TRANSCRIPT_BODIES[name]
    if name in _SF_SQL:
        return _SF_SQL[name](SF_DIR)
    return _TABLE_SQL[name]


_ALL = sorted(
    list(_TRANSCRIPT_BODIES)
    + ["filtered_events", "update_freq_by_shard", "conv_profiles",
       "curated_conversations"]
    + list(_TABLE_SQL)
    + list(_SF_SQL)
)


@pytest.mark.parametrize("name", _ALL)
def test_query_matches_oracle(name, duck_views):
    fn = entrymod.queries()[name]
    got = fn(SF_DIR)
    want = duck_views.execute(_oracle_sql_for(name)).fetchdf()
    assert_frames_match(got, want, name)


def test_oracle_sql_keys_cover_queries():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) == set(qs) - NO_ORACLE
    assert NO_ORACLE <= set(qs)
