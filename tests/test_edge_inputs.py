"""Degenerate-input behavior: empty blocks, single rows, no-match corpora.

These paths appear constantly at 100 TB (a filtered row group, an empty
shard, a sink with no rows) and are where vectorized kernels usually break
first (zero-length arrays, schema loss)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from oplog_analyzer_ray.pipelines.agg import GroupSpec, grouped
from oplog_analyzer_ray.schema import TRANSCRIPT_SCHEMA
from oplog_analyzer_ray.stages.parse import parse_classify


def test_parse_classify_empty_block_keeps_schema():
    out = parse_classify(TRANSCRIPT_SCHEMA.empty_table())
    assert out.num_rows == 0
    assert "op_class" in out.column_names and "ns" in out.column_names


def test_grouped_with_empty_blocks_mixed_in():
    t = pa.table(
        {"k": pa.array(["a", "b", "a"]), "v": pa.array([1, 2, 3], pa.int64())}
    )
    ds = ray.data.from_arrow(t).repartition(8)  # most blocks empty
    out = (
        grouped(ds, GroupSpec(keys=("k",), sum_cols=("v",)))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["cnt"].tolist() == [2, 1]
    assert out["sum_v"].tolist() == [4, 2]


def test_sessionization_single_event_user(tmp_path):
    from oplog_analyzer_ray.pipelines.events import sessionization

    t = pa.table(
        {
            "user_id": pa.array(["solo"]),
            "ts": pa.array([np.datetime64("2024-01-01T00:00:00", "us")]),
            "value": pa.array([1.25]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = sessionization(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["session_id"] == 0 and out.iloc[0]["n_events"] == 1
    assert out.iloc[0]["sum_value"] == 1.25


def test_lsh_pairs_all_unique_corpus(tmp_path):
    from oplog_analyzer_ray.pipelines.dedup import (
        lsh_candidate_pairs,
        near_dup_jaccard,
    )

    texts = [f"totally unique document number {i} " + "x" * i for i in range(40)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pairs = lsh_candidate_pairs(str(tmp_path)).to_pandas()
    # docs this distinct share no minhash band: candidate set must be empty
    # (or at most accidental collisions, which the jaccard verify rejects)
    jac = near_dup_jaccard(str(tmp_path)).to_pandas()
    assert len(jac) <= len(pairs)
    assert (jac["jaccard"] >= 0.05).all() if len(jac) else True


def test_media_frame_sample_empty_payload(tmp_path):
    from oplog_analyzer_ray.stages.media import media_frame_sample

    pq.write_table(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array([""])}
        ),
        tmp_path / "documents.parquet",
    )
    out = media_frame_sample(str(tmp_path)).to_pandas()
    # empty payload still yields its frame-0 row (n_frames = 0//1024 + 1)
    assert len(out) == 1 and out.iloc[0]["frame_bytes"] == 0


def test_empty_doc_text_parity(tmp_path, duck):
    """Empty documents must agree between the Ray kernels and the SQL
    oracles: rolling fingerprint (0, 0, 1) and punct density 0.0 — the two
    places where 0/0 used to diverge (NaN/empty-sum vs NULL)."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import (
        quality_scores,
        rolling_fingerprints,
        token_counts_bpe,
    )
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "lang": pa.array(["en", "en", "fr"]),
                "text": pa.array(["", "short", "the quick brown fox ran."]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    for fn, sql in [
        (rolling_fingerprints, oracle.ROLLING_FINGERPRINTS),
        (quality_scores, oracle.QUALITY_SCORES),
        (token_counts_bpe, oracle.TOKEN_COUNTS_BPE),
    ]:
        got = fn(str(tmp_path)).to_pandas().sort_values("doc_id")
        want = duck.execute(sql).fetchdf().sort_values("doc_id")
        assert_frames_match(
            got.reset_index(drop=True),
            want.reset_index(drop=True),
            fn.__name__,
        )
    fp = rolling_fingerprints(str(tmp_path)).to_pandas()
    row = fp[fp.doc_id == 1].iloc[0]
    assert (row.min_whash, row.max_whash, row.distinct_windows) == (0, 0, 1)


def test_decontaminate_tiny_corpus_parity(tmp_path, duck):
    """Eval-overlap flagging on a corpus with an exact copy (3 shared
    5-grams), a partial overlap (1), a short doc and an empty doc — and the
    SQL oracle agrees on every row (short/empty docs produce no grams on
    either side)."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import decontaminate
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 20, 21, 22, 23], pa.int64()),
                "lang": pa.array(["en"] * 6),
                "text": pa.array(
                    [
                        "a b c d e f g",      # eval: 3 distinct 5-grams
                        "x y",                 # eval: too short, no grams
                        "q b c d e f q",      # shares "b c d e f" -> 1 hit
                        "a b c d e f g",      # exact copy -> 3 hits
                        "p q r",               # short, clean
                        "",                    # empty, clean
                    ]
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = decontaminate(str(tmp_path)).to_pandas().sort_values("doc_id")
    want = duck.execute(oracle.DECONTAMINATE).fetchdf().sort_values("doc_id")
    assert_frames_match(
        got.reset_index(drop=True), want.reset_index(drop=True), "decontaminate"
    )
    hits = dict(zip(got.doc_id, got.eval_gram_hits))
    assert hits == {20: 1, 21: 3, 22: 0, 23: 0}
    flags = dict(zip(got.doc_id, got.contaminated))
    assert flags == {20: 1, 21: 1, 22: 0, 23: 0}


def test_repetition_scores_tiny_corpus_parity(tmp_path, duck):
    """Repetition fractions on the degenerate shapes: an all-one-gram doc
    (both fractions -> 1 - 1/total and 1.0), clean prose (dup 0), a
    single-token doc and an empty doc (no 2-grams -> all zeros)."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import repetition_scores
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "lang": pa.array(["en"] * 4),
                "text": pa.array(
                    [
                        "spam spam spam spam spam",  # one distinct 2-gram x4
                        "a b c d e",                  # 4 distinct 2-grams
                        "lonely",                      # no 2-grams
                        "",                            # empty
                    ]
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = repetition_scores(str(tmp_path)).to_pandas().sort_values("doc_id")
    want = duck.execute(oracle.REPETITION_SCORES).fetchdf().sort_values("doc_id")
    assert_frames_match(
        got.reset_index(drop=True), want.reset_index(drop=True), "repetition"
    )
    r = got.set_index("doc_id")
    assert r.loc[1, "n_2grams"] == 4 and r.loc[1, "top_2gram_frac"] == 1.0
    assert r.loc[1, "dup_2gram_frac"] == 0.75
    assert r.loc[2, "dup_2gram_frac"] == 0.0
    assert (r.loc[3] == 0).all() and (r.loc[4] == 0).all()


def test_source_mixture_skewed_corpus_parity(tmp_path, duck):
    """Token-weighted mixture on a 3:1 skew: the heavy source gets weight
    total/(n_src*tokens) < 1, the light one > 1, shares sum to 1."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import source_mixture
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["web", "web", "web", "books"]),
                "text": pa.array(["a b", "c d", "e f", "g h"]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = source_mixture(str(tmp_path)).to_pandas().sort_values("source")
    want = duck.execute(oracle.SOURCE_MIXTURE).fetchdf().sort_values("source")
    assert_frames_match(
        got.reset_index(drop=True), want.reset_index(drop=True), "source_mixture"
    )
    m = got.set_index("source")
    assert m.loc["web", "n_tokens"] == 6 and m.loc["books", "n_tokens"] == 2
    assert m.loc["web", "sample_weight"] < 1.0 < m.loc["books", "sample_weight"]
    assert abs(got["token_share"].sum() - 1.0) < 2e-6


def test_token_rarity_tiny_corpus_parity(tmp_path, duck):
    """Rarity signal on a corpus with one common token and hapaxes: the
    boilerplate doc scores higher commonness than the hapax-heavy doc, the
    hapax doc's rarest_token_count clamps to CNT_FLOOR (the bounded-vocab
    contract: counts ≤ the floor carry no dict entry), and the SQL oracle
    agrees."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import token_rarity
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "lang": pa.array(["en"] * 3),
                "text": pa.array(
                    [
                        "the the the the",   # boilerplate: all-common
                        "zx qv wk the",      # three hapaxes + one common
                        "the the mm",        # mixed
                    ]
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = token_rarity(str(tmp_path)).to_pandas().sort_values("doc_id")
    want = duck.execute(oracle.TOKEN_RARITY).fetchdf().sort_values("doc_id")
    assert_frames_match(
        got.reset_index(drop=True), want.reset_index(drop=True), "token_rarity"
    )
    from oplog_analyzer_ray.pipelines.text import CNT_FLOOR

    r = got.set_index("doc_id")
    assert r.loc[1, "commonness"] > r.loc[2, "commonness"]
    # hapaxes (true count 1) clamp to the floor — the broadcast dict holds
    # only tokens with count > CNT_FLOOR, so a miss means "≤ floor"
    assert r.loc[2, "rarest_token_count"] == CNT_FLOOR
    assert r.loc[1, "rarest_token_count"] == 7  # 'the' appears 7x (> floor)


def test_funnel_strict_ordering_and_bucket_invariance(tmp_path, duck):
    """Funnel counts only strictly-later steps: u1 converts fully, u2's
    purchase precedes its click (stage 3 not reached), u3's click shares
    the view timestamp (strict > excludes it), u4 never views.  The result
    is bucket-count invariant and matches the SQL oracle."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import funnel
    from .util import assert_frames_match

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        # u1: view -> click -> purchase (reaches all 3)
        (1, s(0), "view"), (1, s(10), "click"), (1, s(20), "purchase"),
        # u2: purchase BEFORE click -> stage 3 not reached
        (2, s(0), "view"), (2, s(5), "purchase"), (2, s(10), "click"),
        # u3: click at the SAME ts as view -> strict > excludes stage 2
        (3, s(0), "view"), (3, s(0), "click"),
        # u4: clicks without ever viewing -> reaches nothing
        (4, s(0), "click"), (4, s(1), "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    want = duck.execute(oracle.FUNNEL).fetchdf()
    for nb in (1, 7):
        got = funnel(str(tmp_path), n_buckets=nb).to_pandas()
        assert_frames_match(got, want, f"funnel[buckets={nb}]")
    assert list(want["users"]) == [3, 2, 1]


def test_retention_cohorts_tiny_corpus_parity(tmp_path, duck):
    """Cohort math on a hand-computable fixture: user A (cohort week 0,
    active weeks 0/1/3 — twice in week 1 counts once), user B (cohort
    week 1, active weeks 1/2).  Bucket-count invariant and oracle-exact."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import retention_cohorts
    from .util import assert_frames_match

    t0 = dt.datetime(2024, 1, 1)
    wk = lambda w, h=0: t0 + dt.timedelta(weeks=w, hours=h)
    rows = [(1, wk(0)), (1, wk(1)), (1, wk(1, 5)), (1, wk(3)),
            (2, wk(1)), (2, wk(2))]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    want = duck.execute(oracle.RETENTION_COHORTS).fetchdf()
    for nb in (1, 5):
        got = retention_cohorts(str(tmp_path), n_buckets=nb).to_pandas()
        assert_frames_match(got, want, f"retention[buckets={nb}]")
    cells = {(r.cohort_week, r.week_offset): r.users for r in want.itertuples()}
    assert cells == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_approx_distinct_sketch_branch_accuracy(tmp_path, duck):
    """KMV sketch branch (n >> k): estimate matches the SQL oracle
    bit-for-bit and lands within the expected ~1/sqrt(k) error band of the
    true cardinality (loose 40% bound; the estimate is deterministic so
    this can never flake)."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import approx_distinct_users
    from .util import assert_frames_match

    n_users = 5000
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_users), pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(seconds=i) for i in range(n_users)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(range(n_users), pa.int64()),
                "event_type": pa.array(["view"] * n_users),
                "value": pa.array([1.0] * n_users),
                "props": pa.array(["{}"] * n_users),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    got = approx_distinct_users(str(tmp_path)).to_pandas()
    want = duck.execute(oracle.APPROX_DISTINCT_USERS).fetchdf()
    assert_frames_match(got, want, "approx_distinct_users")
    est = int(got["est_distinct"].iloc[0])
    assert got["n_seen"].iloc[0] == 64  # sketch branch, not the exact one
    assert abs(est - n_users) / n_users < 0.4


def test_documents_dir_corpus_layout_parity(tmp_path, duck):
    """A multi-file documents/ directory corpus (what real scale produces)
    must give the same answers as the single-file layout for the new
    document-side ops — the round-2 lesson was that single-file assumptions
    hide exactly this breakage."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import (
        decontaminate,
        repetition_scores,
        source_mixture,
        token_rarity,
    )
    from .util import assert_frames_match

    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array(["en"] * 30),
            "source": pa.array(["web" if i % 3 else "books" for i in range(30)]),
            "text": pa.array(
                [f"tok{i} a b c d e f common tail {'a b c d e f' if i % 4 == 0 else 'x' + str(i)}"
                 for i in range(30)]
            ),
        }
    )
    d = tmp_path / "documents"
    d.mkdir()
    pq.write_table(docs.slice(0, 13), d / "part-0.parquet")
    pq.write_table(docs.slice(13), d / "part-1.parquet")
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/*.parquet')"
    )
    for fn, sql in [
        (decontaminate, oracle.DECONTAMINATE),
        (repetition_scores, oracle.REPETITION_SCORES),
        (source_mixture, oracle.SOURCE_MIXTURE),
        (token_rarity, oracle.TOKEN_RARITY),
    ]:
        # assert_frames_match canonicalizes row/column order itself
        assert_frames_match(
            fn(str(tmp_path)), duck.execute(sql).fetchdf(), fn.__name__
        )


def test_events_dir_corpus_layout_invariance(tmp_path):
    """A multi-file events/ directory corpus gives identical results to the
    single-file layout for the events ops — including the KMV sketch, whose
    estimate must be invariant to how blocks split (distinct-union merge)."""
    from oplog_analyzer_ray.pipelines.events import (
        approx_distinct_users,
        funnel,
        retention_cohorts,
        sessionization,
    )
    from .util import assert_frames_match

    src = "/root/testdata/sf0.001/events.parquet"
    t = pq.read_table(src)
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(), (many / "events").mkdir(parents=True)
    pq.write_table(t, one / "events.parquet")
    third = t.num_rows // 3
    pq.write_table(t.slice(0, third), many / "events" / "p0.parquet")
    pq.write_table(t.slice(third, third), many / "events" / "p1.parquet")
    pq.write_table(t.slice(2 * third), many / "events" / "p2.parquet")
    for fn in (approx_distinct_users, funnel, retention_cohorts,
               sessionization):
        assert_frames_match(
            fn(str(many)), fn(str(one)).to_pandas(), f"{fn.__name__}[dir]"
        )


def test_embeddings_dir_corpus_layout_invariance(tmp_path):
    """A multi-file embeddings/ directory corpus gives identical results to
    the single-file layout for the ANN family (query loading, IVF centroid
    sampling and row counting all iterate the file list)."""
    from oplog_analyzer_ray.pipelines.similarity import (
        embedding_near_dups,
        knn_bruteforce,
        knn_ivf,
    )
    from .util import assert_frames_match

    src = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(src)
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(), (many / "embeddings").mkdir(parents=True)
    pq.write_table(t, one / "embeddings.parquet")
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), many / "embeddings" / "p0.parquet")
    pq.write_table(t.slice(half), many / "embeddings" / "p1.parquet")
    for fn in (knn_bruteforce, knn_ivf, embedding_near_dups):
        a, b = fn(str(many)), fn(str(one))
        assert_frames_match(
            a, b.to_pandas() if hasattr(b, "to_pandas") else b,
            f"{fn.__name__}[dir]",
        )


def test_retention_pre_anchor_event_floor_division_parity(tmp_path, duck):
    """Events BEFORE the cohort anchor must land in negative weeks on BOTH
    sides: numpy // floors, and the oracle emulates floored division
    (DuckDB's native // truncates toward zero, which would collapse
    up-to-7-days-pre-anchor events into week 0)."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import retention_cohorts
    from .util import assert_frames_match

    rows = [(1, dt.datetime(2023, 12, 28)),   # 4 days pre-anchor: week -1
            (1, dt.datetime(2024, 1, 2)),      # week 0
            (2, dt.datetime(2023, 12, 1))]     # week -5
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    got = retention_cohorts(str(tmp_path)).to_pandas()
    want = duck.execute(oracle.RETENTION_COHORTS).fetchdf()
    assert_frames_match(got, want, "retention[pre-anchor]")
    assert set(got["cohort_week"]) == {-1, -5}
    # user 1: cohort -1, active weeks -1 and 0 -> offsets {0, 1}
    u1 = got[got.cohort_week == -1].set_index("week_offset")["users"]
    assert dict(u1) == {0: 1, 1: 1}


def test_funnel_no_view_corpus_parity(tmp_path, duck):
    """A corpus with zero stage-1 events still yields the 3-row funnel with
    users=0 and conv_from_first=0.0 on BOTH sides (no 0/0 NULL, no
    missing rows)."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import funnel
    from .util import assert_frames_match

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["click", "purchase"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    got = funnel(str(tmp_path)).to_pandas()
    want = duck.execute(oracle.FUNNEL).fetchdf()
    assert_frames_match(got, want, "funnel[no-view]")
    assert list(got["users"]) == [0, 0, 0]
    assert list(got["conv_from_first"]) == [0.0, 0.0, 0.0]


def test_media_dir_corpus_layout_invariance(tmp_path):
    """A multi-file documents/ directory corpus gives identical results to
    the single-file layout for the media pipelines (round-3 VERDICT: these
    were the last three queries still hardcoding documents.parquet)."""
    from oplog_analyzer_ray.stages.media import (
        media_features,
        media_frame_sample,
        media_resize,
    )
    from .util import assert_frames_match

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src)
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(), (many / "documents").mkdir(parents=True)
    pq.write_table(t, one / "documents.parquet")
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), many / "documents" / "p0.parquet")
    pq.write_table(t.slice(half), many / "documents" / "p1.parquet")
    for fn in (media_features, media_frame_sample, media_resize):
        assert_frames_match(
            fn(str(many)), fn(str(one)).to_pandas(), f"{fn.__name__}[dir]"
        )


def test_ann_oracle_builders_on_dir_corpus_layout(tmp_path):
    """The ANN oracle SQL builders must resolve the embeddings/ directory
    layout like the engine does (round-3 ADVICE: _emb_dim hardcoded the
    single-file path and raised FileNotFoundError on directory corpora)."""
    from oplog_analyzer_ray import oracle

    src = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(src)
    (tmp_path / "embeddings").mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), tmp_path / "embeddings" / "p0.parquet")
    pq.write_table(t.slice(half), tmp_path / "embeddings" / "p1.parquet")
    for builder in (
        oracle.knn_lsh_sql,
        oracle.knn_ivf_sql,
        oracle.embedding_near_dups_lsh_sql,
    ):
        sql = builder(str(tmp_path))
        assert isinstance(sql, str) and len(sql) > 100


def test_purchase_attribution_equal_ts_click_ties_parity(tmp_path, duck):
    """Multiple clicks at the IDENTICAL (user_id, ts) must attribute the
    same click on both engines: the max event_id per (user, ts) is
    canonicalized before the as-of join (round-3 ADVICE — pandas merge_asof
    picks the last duplicate, DuckDB's ASOF tie choice is undefined)."""
    import datetime as dt

    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.events import purchase_attribution
    from .util import assert_frames_match

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 20, 30], pa.int64()),
                "ts": pa.array([t0, t0, t0, t0 + dt.timedelta(minutes=5),
                                t0 - dt.timedelta(minutes=1)],
                               pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 1, 1], pa.int64()),
                "event_type": pa.array(
                    ["click", "click", "click", "purchase", "click"]
                ),
                "value": pa.array([0.0, 0.0, 0.0, 9.99, 0.0]),
                "props": pa.array(["{}"] * 5),
            }
        ),
        tmp_path / "events.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    got = purchase_attribution(str(tmp_path)).to_pandas()
    want = duck.execute(oracle.PURCHASE_ATTRIBUTION).fetchdf()
    assert_frames_match(got, want, "purchase_attribution[ties]")
    assert list(got["click_event_id"]) == [12]  # max event_id among the tie


def test_quality_budget_selection_boundary_ties_parity(tmp_path, duck):
    """When the token budget cuts through a run of SAME-quality documents,
    both engines must break the tie by doc_id: the kept set is the doc_id
    prefix of the boundary quality level (the per-level prefix scan vs the
    SQL window must agree exactly)."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import quality_budget_selection
    from .util import assert_frames_match

    # 8 identical docs (one quality level, 8 tokens each, 64 total tokens):
    # budget = 64 * 250 // 1000 = 16 tokens -> exactly the 2 lowest doc_ids
    same = "alpha beta gamma delta epsilon zeta eta theta"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "lang": pa.array(["en"] * 8),
                "source": pa.array(["web"] * 8),
                "text": pa.array([same] * 8),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = quality_budget_selection(str(tmp_path)).to_pandas()
    want = duck.execute(oracle.QUALITY_BUDGET_SELECTION).fetchdf()
    assert_frames_match(got, want, "quality_budget_selection[ties]")
    assert list(got["doc_id"]) == [0, 1]
    assert list(got["cum_excl"]) == [0, 8]


def test_bounded_vocab_prunes_at_floor(tmp_path):
    """The broadcast dict holds ONLY tokens with count strictly above the
    floor — the structural guarantee that no driver/worker dict grows with
    open-web vocabulary (hapaxes and near-hapaxes clamp via dict-miss)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.text import (
        _bounded_vocab,
        _unigram_counts,
        _vocab_total,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "lang": pa.array(["en", "en"]),
                "text": pa.array(["aa aa aa bb bb cc", "aa dd"]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    vd = _unigram_counts(str(tmp_path))
    # exact total is computed WITHOUT the dict (scalar partial sums)
    assert _vocab_total(vd) == 8
    # floor=2: only tokens with count > 2 get entries (aa=4); bb (=2),
    # cc/dd (=1) are pruned and clamp to the floor on lookup miss
    assert _bounded_vocab(vd, 2) == {"aa": 4}
    assert _bounded_vocab(vd, 1) == {"aa": 4, "bb": 2}


def test_boilerplate_tiny_corpus_parity(tmp_path, duck):
    """Boilerplate fraction on a corpus where a fixed 3-gram chrome block
    repeats across most docs, plus a short (<3-token) doc and an empty doc
    (both count their whole text as the single shingle) — floor resolves to
    BOILER_DF_MIN since n_docs // BOILER_DF_DIVISOR is 0 here."""
    from oplog_analyzer_ray import oracle
    from oplog_analyzer_ray.pipelines.text import boilerplate_ngrams
    from .util import assert_frames_match

    chrome = "copyright acme corp all rights reserved"
    texts = [f"{chrome} doc{i} unique words here {i}" for i in range(6)] + [
        "short one",
        "",
        "totally organic prose with no repeats at all",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp_path / "documents.parquet",
    )
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    got = boilerplate_ngrams(str(tmp_path)).to_pandas().sort_values("doc_id")
    want = duck.execute(oracle.BOILERPLATE_NGRAMS).fetchdf()
    assert_frames_match(
        got.reset_index(drop=True), want.reset_index(drop=True),
        "boilerplate_ngrams",
    )
    # the chrome block's interior 3-grams (df=6 > 4) must be flagged in
    # every chrome doc, and the organic/short/empty docs must score 0
    by_id = got.set_index("doc_id")
    assert (by_id.loc[range(6), "n_boiler"] > 0).all()
    assert (by_id.loc[[6, 7, 8], "n_boiler"] == 0).all()
    assert (by_id.loc[[6, 7], "n_shingles"] == 1).all()  # whole-text shingle


def test_knn_single_vector_corpus_keeps_schema(tmp_path):
    """A single-vector embeddings corpus passes the qids guard (vec_id 0 IS
    a query) but excludes itself everywhere, so every candidate block is
    0-row — the knn family must still surface its documented 3-column
    schema, not a zero-column dataset (review finding: Ray drops the schema
    of all-empty map outputs and _knn_finish's UDF never runs)."""
    from oplog_analyzer_ray.pipelines.similarity import (
        knn_bruteforce,
        knn_graph,
        knn_lsh,
    )

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[0.1, 0.2, 0.3]], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    for fn, names in (
        (knn_bruteforce, ["query_id", "neighbor_id", "cos"]),
        (knn_lsh, ["query_id", "neighbor_id", "cos"]),
        (knn_graph, ["vec_id", "neighbor_id", "rank", "cos"]),
    ):
        out = fn(str(tmp_path))
        # dataset-level contract: typed schema even though every block is
        # 0-row (Ray's to_pandas drops columns on fully-empty datasets, so
        # schema() is where the contract is observable)
        assert out.schema().names == names, fn.__name__
        assert len(out.to_pandas()) == 0, fn.__name__


def test_importance_sample_all_filtered_keeps_schema(tmp_path):
    """A corpus where every document draws hash_permille above its quality
    permille keeps NOTHING (doc_ids 9/138/393 have salted permille
    997/996/997 under IMP_SALT; empty texts score q_int ≈ 753906, permille
    753); the sorted surface must still carry the documented 4 columns
    (review finding: unpinned sort over all-empty map outputs)."""
    from oplog_analyzer_ray.pipelines.text import (
        IMP_SALT,
        _salted_permille,
        importance_sample,
    )

    ids = [9, 138, 393]
    # pinned precondition: these ids really do draw ≥ 990 under IMP_SALT
    assert (_salted_permille(pd.Series(ids, dtype="int64"), IMP_SALT)
            >= 990).all()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["", "", ""]),
                "source": pa.array(["a", "b", "a"]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = importance_sample(str(tmp_path))
    assert out.schema().names == [
        "doc_id", "source", "q_int", "hash_permille",
    ]
    assert len(out.to_pandas()) == 0
