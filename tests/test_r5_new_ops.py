"""Contract tests for the final round-5 operator batch (beyond the SQL
oracle parity, which pins the fixed corpus):

- containment_scores / verify_candidates(score="containment"): kernel
  equals a per-pair Python set reference on an arbitrary candidate set,
  and a doc fully contained in another scores 1.0 where Jaccard doesn't.
- mutual_knn_pairs: exactly the reciprocal edges of knn_graph, carrying
  the graph's cosine.
- concurrent_sessions: equals a pandas interval-explode reference over
  the sessionization table.
- lang_confusion: equals the crosstab of lang_id's per-doc output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(tmpdir, texts) -> str:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmpdir}/documents.parquet",
    )
    return str(tmpdir)


def test_containment_kernel_matches_set_reference(tmp_path):
    from oplog_analyzer_ray.pipelines.dedup import _shingles, verify_candidates

    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(words),  # doc 0: the long doc
        " ".join(words[5:15]),  # doc 1: fully contained in doc 0
        " ".join(words[:8] + ["zz", "yy"] + words[20:28]),  # partial overlap
        "completely different tokens here nothing shared at all",
    ]
    sf = _write_docs(tmp_path, texts)
    cands = pa.table(
        {
            "doc_a": pa.array([0, 0, 0, 1, 1, 2], pa.int64()),
            "doc_b": pa.array([1, 2, 3, 2, 3, 3], pa.int64()),
        }
    )
    got = (
        verify_candidates(
            sf, ray.data.from_arrow(cands), threshold=0.0, score="containment"
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sets = [set(_shingles(t)) for t in texts]
    ref = []
    for a, b in zip(cands["doc_a"].to_pylist(), cands["doc_b"].to_pylist()):
        c = len(sets[a] & sets[b]) / min(len(sets[a]), len(sets[b]))
        ref.append((a, b, np.floor(c * 1e6) / 1e6))
    ref_df = pd.DataFrame(ref, columns=["doc_a", "doc_b", "containment"])
    pd.testing.assert_frame_equal(got, ref_df, check_dtype=False)
    # the asymmetric case containment exists for: full inclusion scores 1.0
    assert got.loc[0, "containment"] == 1.0  # pair (0, 1)
    jac = (
        verify_candidates(
            sf, ray.data.from_arrow(cands), threshold=0.0, score="jaccard"
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert jac.loc[0, "jaccard"] < 0.5  # Jaccard under-scores the same pair


def test_local_topk_tie_break_keeps_smallest_ids(tmp_path):
    """Boundary-tie regression for the kNN family's LOCAL prunes: with
    more bitwise-duplicate vectors than k, every local top-k must keep the
    id-SMALLEST tied neighbors (the global (cos DESC, id ASC) order), not
    an arbitrary argpartition subset — and the graph must not vary with
    n_chunks."""
    from oplog_analyzer_ray.pipelines.similarity import (
        K_GRAPH,
        _top_take,
        knn_graph,
    )

    # direct kernel pin: 5 candidates tied at cos=1.0, take 3 → ids 0,1,2
    col = np.array([1.0, 1.0, 0.5, 1.0, 1.0, 1.0])
    ids = np.array([7, 3, 9, 5, 0, 1])
    sel = _top_take(col, ids, 3)
    assert sorted(ids[sel].tolist()) == [0, 1, 3]

    # end-to-end: K_GRAPH+3 copies of one vector + a few distinct others
    dup = np.array([1.0, 0.0, 0.0, 0.0])
    others = np.eye(4)[1:]  # orthogonal to dup
    vecs = [dup] * (K_GRAPH + 3) + list(others)
    n = len(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    for n_chunks in (1, 3):
        g = knn_graph(str(tmp_path), n_chunks=n_chunks).to_pandas()
        for vid in range(K_GRAPH + 3):
            nbrs = g[g["vec_id"] == vid]["neighbor_id"].tolist()
            # every duplicate's neighbors = the K_GRAPH id-smallest OTHER
            # duplicates (cos 1.0 beats the orthogonal others' 0.0)
            want = [
                i for i in range(K_GRAPH + 3) if i != vid
            ][:K_GRAPH]
            assert nbrs == want, (n_chunks, vid, nbrs)


def test_verify_scores_hypothesis(tmp_path_factory):
    """Random corpora: BOTH score projections of the shared triple join
    equal the per-pair Python set reference over every (i<j) candidate,
    and jaccard ≤ containment holds pairwise (|A∪B| ≥ min(|A|,|B|)) —
    pins the triple-table refactor (one join, two projections)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from oplog_analyzer_ray.pipelines.dedup import _shingles, verify_candidates

    vocab = ["aa", "bb", "cc", "dd"]
    docs_st = st.lists(
        st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs_st)
    def check(docs):
        texts = [" ".join(d) for d in docs]
        sf = _write_docs(tmp_path_factory.mktemp("vs"), texts)
        n = len(texts)
        pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
        cands = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                    "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )
        sets = [set(_shingles(t)) for t in texts]
        got = {}
        for score in ("jaccard", "containment"):
            df = verify_candidates(sf, cands, threshold=0.0, score=score)
            df = df.to_pandas().sort_values(["doc_a", "doc_b"])
            got[score] = dict(
                zip(zip(df["doc_a"], df["doc_b"]), df[score])
            )
        for a, b in pairs:
            inter = len(sets[a] & sets[b])
            j = np.floor(inter / len(sets[a] | sets[b]) * 1e6) / 1e6
            c = np.floor(
                inter / min(len(sets[a]), len(sets[b])) * 1e6
            ) / 1e6
            assert got["jaccard"][(a, b)] == j, (a, b)
            assert got["containment"][(a, b)] == c, (a, b)
            assert got["jaccard"][(a, b)] <= got["containment"][(a, b)]

    check()


def test_mutual_knn_pairs_are_reciprocal_graph_edges():
    from oplog_analyzer_ray.pipelines.similarity import (
        knn_graph,
        mutual_knn_pairs,
    )

    g = knn_graph(SF_DIR).to_pandas()
    directed = set(zip(g["vec_id"], g["neighbor_id"]))
    cos_of = dict(zip(zip(g["vec_id"], g["neighbor_id"]), g["cos"]))
    want = sorted(
        (a, b)
        for (a, b) in directed
        if a < b and (b, a) in directed
    )
    got = mutual_knn_pairs(SF_DIR).to_pandas()
    assert list(zip(got["vec_a"], got["vec_b"])) == want
    for _, r in got.iterrows():
        assert r["cos"] == cos_of[(r["vec_a"], r["vec_b"])]
        assert r["cos"] == cos_of[(r["vec_b"], r["vec_a"])]


def test_concurrent_sessions_matches_pandas_explode():
    from oplog_analyzer_ray.pipelines.events import (
        concurrent_sessions,
        sessionization,
    )

    s = sessionization(SF_DIR).to_pandas()
    rows = []
    for _, r in s.iterrows():
        h = r["start_ts"].floor("h")
        end = r["end_ts"].floor("h")
        while h <= end:
            rows.append((h, r["user_id"]))
            h += pd.Timedelta(hours=1)
    ref = (
        pd.DataFrame(rows, columns=["hour", "user_id"])
        .groupby("hour")
        .agg(n_sessions=("user_id", "size"), n_users=("user_id", "nunique"))
        .reset_index()
    )
    got = concurrent_sessions(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_session_stats_empty_corpus_yields_zero_rows(tmp_path):
    """Empty events corpus: the oracle's HAVING COUNT(*) > 0 yields zero
    rows, so the engine must too (not a single 0/0 = NaN row)."""
    from oplog_analyzer_ray.pipelines.events import session_stats

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = session_stats(str(tmp_path)).to_pandas()
    assert len(got) == 0


def test_lang_confusion_is_lang_id_crosstab():
    from oplog_analyzer_ray.pipelines.text import lang_confusion, lang_id

    per_doc = lang_id(SF_DIR).to_pandas()
    ref = (
        per_doc.groupby(["labelled_lang", "pred_lang"])
        .size()
        .reset_index(name="n_docs")
        .rename(columns={"labelled_lang": "lang"})
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
    got = lang_confusion(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert got["n_docs"].sum() == len(per_doc)


def test_top_take_empty_candidates_and_single_row_corpus(tmp_path):
    """take=0 regression: a block holding ONLY the query row leaves zero
    candidates after self-exclusion — _top_take must return an empty
    selection (np.partition(kth=-1) on an empty array raised), and
    knn_bruteforce over a 1-vector corpus must yield an empty result
    instead of killing the job."""
    from oplog_analyzer_ray.pipelines.similarity import (
        _top_take,
        knn_bruteforce,
    )

    sel = _top_take(np.array([], np.float64), np.array([], np.int64), 0)
    assert sel.size == 0

    t = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array(
                [np.array([1.0, 0.0], np.float32)], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = knn_bruteforce(str(tmp_path)).to_pandas()
    assert len(out) == 0
