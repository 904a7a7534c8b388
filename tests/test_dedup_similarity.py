"""Property tests for the non-SQL-expressible ops (SURVEY.md §5.5):
SimHash similarity behavior and LSH-ANN recall vs the brute-force baseline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from oplog_analyzer_ray.pipelines.dedup import simhash64
from oplog_analyzer_ray.pipelines.similarity import (
    embedding_near_dups,
    embedding_near_dups_lsh,
    knn_bruteforce,
    knn_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_simhash_deterministic_and_discriminative(tmp_path):
    out1 = {r["doc_id"]: r["simhash"] for r in simhash64(SF_DIR).take_all()}
    out2 = {r["doc_id"]: r["simhash"] for r in simhash64(SF_DIR).take_all()}
    assert out1 == out2  # deterministic across runs

    # identical text -> identical simhash; near-identical -> small hamming;
    # unrelated -> large hamming (property check on crafted docs)
    from oplog_analyzer_ray.pipelines import dedup

    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base + "extra tail token"
    far = "completely different vocabulary about databases and sharding " * 6

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([base, base, near, far], pa.string()),
        }
    )
    p = tmp_path / "documents.parquet"
    import pyarrow.parquet as pq

    pq.write_table(t, p)
    sims = {
        r["doc_id"]: r["simhash"] for r in simhash64(str(tmp_path)).take_all()
    }
    assert sims[1] == sims[2]
    assert _hamming(sims[1], sims[3]) <= 16
    assert _hamming(sims[1], sims[4]) >= 20


def test_band_work_items_bounded_on_hot_band():
    """A hot band (one key shared by many docs) must be sub-chunked: no
    work item may exceed BAND_CHUNK ids per side, and the expanded pair set
    must still be exactly all C(n,2) unordered pairs."""
    from oplog_analyzer_ray.pipelines.dedup import (
        BAND_CHUNK,
        _band_work_items,
        _expand_items,
    )

    n_hot = 600
    df = pd.DataFrame(
        {
            "doc_id": list(range(n_hot)) + [1000, 1001, 2000],
            "band_idx": [0] * n_hot + [1, 1, 2],
            "band_key": ["HOT"] * n_hot + ["p", "p", "solo"],
        }
    )
    items = _band_work_items(df.sample(frac=1, random_state=7))  # order-proof
    for row in items.to_pylist():
        assert len(row["ids_a"]) <= BAND_CHUNK
        assert row["ids_b"] is None or len(row["ids_b"]) <= BAND_CHUNK
    pairs = _expand_items(items).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    want = {
        (a, b) for a in range(n_hot) for b in range(a + 1, n_hot)
    } | {(1000, 1001)}
    assert got == want
    assert (pairs["doc_a"] < pairs["doc_b"]).all()


def test_lsh_pairs_dup_heavy_corpus(tmp_path):
    """1000 identical docs: every pair shares all 8 bands; the pipeline must
    produce all C(1000,2) pairs without any task materializing the whole
    quadratic pair table (structurally bounded by _band_work_items +
    the small expand batch size)."""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.dedup import LSH_BANDS, lsh_candidate_pairs

    n = 1000
    text = "all work and no play makes jack a dull boy " * 4
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)) + [9999], pa.int64()),
            "text": pa.array([text] * n + ["one completely different document"]),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = lsh_candidate_pairs(str(tmp_path))
    counts = out.to_pandas()
    assert len(counts) == n * (n - 1) // 2
    assert (counts["n_shared_bands"] == LSH_BANDS).all()


def test_embedding_near_dups_chunk_invariant():
    """The triangle join must produce identical pairs for any chunk count
    (partitioning is an execution detail, not a semantic one)."""
    a = embedding_near_dups(SF_DIR, n_chunks=2).to_pandas()
    b = embedding_near_dups(SF_DIR, n_chunks=5).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_embedding_near_dups_lsh_recall():
    """Multi-probe LSH candidates + exact kernel: radius-2 probing catches
    pairs whose buckets differ by ≤4 of 6 planes — ~0.97 expected recall at
    the marginal cos≈0.4 threshold pairs this corpus has.  Every reported
    pair must carry the exact score (no approximation in the kernel)."""
    exact = embedding_near_dups(SF_DIR).to_pandas()
    approx = embedding_near_dups_lsh(SF_DIR).to_pandas()
    want = set(zip(exact["vec_a"], exact["vec_b"]))
    got = set(zip(approx["vec_a"], approx["vec_b"]))
    assert got <= want  # no false positives: same threshold, exact kernel
    assert len(got & want) / len(want) >= 0.9
    merged = approx.merge(exact, on=["vec_a", "vec_b"], suffixes=("_a", "_e"))
    assert (merged["cos_a"] == merged["cos_e"]).all()


def _reference_near_dups(docs: dict[int, str]):
    """Independent single-process reimplementation of the whole
    minhash→bands→candidates→jaccard chain (plain Python, no numpy
    vectorization, no Ray) — catches batch/vectorization bugs in the
    distributed path."""
    import hashlib

    from oplog_analyzer_ray.pipelines.dedup import (
        JACCARD_THRESHOLD,
        LSH_BANDS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_K,
        MINHASH_P,
        _shingles,
    )

    sigs = {}
    for d, text in docs.items():
        sh = _shingles(text)
        hs = [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
            for s in sh
        ]
        sigs[d] = [
            min((MINHASH_A[i] * h + MINHASH_B[i]) % MINHASH_P for h in hs)
            for i in range(MINHASH_K)
        ]
    cands = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = sum(
                sigs[a][2 * k : 2 * k + 2] == sigs[b][2 * k : 2 * k + 2]
                for k in range(LSH_BANDS)
            )
            if shared:
                cands[(a, b)] = shared
    jac = {}
    for (a, b) in cands:
        sa, sb = set(_shingles(docs[a])), set(_shingles(docs[b]))
        j = len(sa & sb) / len(sa | sb)
        if j >= JACCARD_THRESHOLD:
            jac[(a, b)] = np.floor(j * 1e6) / 1e6
    return sigs, cands, jac


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_dedup_chain_matches_reference_impl(tmp_path, seed):
    """Distributed minhash/LSH/jaccard == the plain-Python reference on a
    random small corpus with planted near-dups."""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        near_dup_jaccard,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for d in range(24):
        n = int(rng.integers(1, 30))
        docs[d] = " ".join(rng.choice(vocab, size=n))
    # plant near-dups: copies with a small tail perturbation
    docs[100] = docs[0]
    docs[101] = docs[0] + " extra"
    ids = sorted(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs[i] for i in ids]),
            }
        ),
        tmp_path / "documents.parquet",
    )
    want_sigs, want_cands, want_jac = _reference_near_dups(docs)

    got_sigs = minhash_signatures(str(tmp_path)).to_pandas()
    for r in got_sigs.itertuples():
        assert [getattr(r, f"mh_{i:02d}") for i in range(16)] == want_sigs[r.doc_id]

    got_cands = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in lsh_candidate_pairs(str(tmp_path)).to_pandas().itertuples()
    }
    assert got_cands == want_cands

    got_jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_jaccard(str(tmp_path)).to_pandas().itertuples()
    }
    assert got_jac == want_jac
    assert (100, 101) in got_cands or (0, 100) in got_cands  # dups surfaced


def test_knn_ivf_recall_vs_bruteforce():
    from oplog_analyzer_ray.pipelines.similarity import knn_ivf

    brute = knn_bruteforce(SF_DIR).to_pandas()
    approx = knn_ivf(SF_DIR).to_pandas()
    recalls = []
    for qid, bg in brute.groupby("query_id"):
        got = set(approx[approx["query_id"] == qid]["neighbor_id"].tolist())
        want = set(bg["neighbor_id"].tolist())
        recalls.append(len(got & want) / len(want))
    # 4-of-16 learned clusters probed: expect a solid share of true
    # neighbors; exact value is corpus-dependent, bound loosely
    assert np.mean(recalls) >= 0.4, recalls
    merged = approx.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_a", "_b")
    )
    assert (merged["cos_a"] == merged["cos_b"]).all()  # exact kernel


def test_knn_lsh_recall_vs_bruteforce():
    brute = knn_bruteforce(SF_DIR).to_pandas()
    approx = knn_lsh(SF_DIR).to_pandas()
    recalls = []
    for qid, bg in brute.groupby("query_id"):
        got = set(
            approx[approx["query_id"] == qid]["neighbor_id"].tolist()
        )
        want = set(bg["neighbor_id"].tolist())
        recalls.append(len(got & want) / len(want))
    # multi-probe LSH over 6 planes should recover a solid share of true
    # neighbors; exact value is corpus-dependent, bound it loosely
    assert np.mean(recalls) >= 0.4, recalls
    # and every reported neighbor's score must match brute-force's score
    merged = approx.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_a", "_b")
    )
    assert (merged["cos_a"] == merged["cos_b"]).all()


def test_query_loader_prunes_row_groups(tmp_path):
    """The knn query loader must decode only the row groups whose vec_id
    min-statistic admits ``vec_id < N_QUERIES`` — on a 4-row-group sorted
    corpus that is exactly one group, never the table (round-2 finding:
    full-table driver read to fetch 5 rows)."""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.similarity import (
        N_QUERIES,
        _load_queries,
        _query_row_groups,
    )

    rng = np.random.default_rng(7)
    n, dim, rg = 400, 8, 100
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(rng.normal(size=(n, dim)).astype(np.float32)),
                pa.list_(pa.float32()),
            ),
        }
    )
    path = tmp_path / "embeddings.parquet"
    pq.write_table(t, path, row_group_size=rg)
    assert pq.ParquetFile(path).metadata.num_row_groups == 4
    assert _query_row_groups(str(path), N_QUERIES) == [0]

    qids, qmat = _load_queries(str(tmp_path))
    assert qids.tolist() == list(range(N_QUERIES))
    assert qmat.shape == (N_QUERIES, dim)


def test_ivf_sample_read_is_bounded(tmp_path):
    """_ivf_centroids must stop pulling batches once IVF_SAMPLE rows have
    arrived: rows past the sample carry NaN embeddings and negative vec_ids
    that would poison the centroids if they were ever decoded."""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.similarity import (
        IVF_CENTROIDS,
        IVF_SAMPLE,
        _ivf_centroids,
    )

    rng = np.random.default_rng(11)
    dim, extra = 8, 4096
    good = rng.normal(size=(IVF_SAMPLE, dim))
    poison = np.full((extra, dim), np.nan)
    t = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate(
                    [np.arange(IVF_SAMPLE), -1 - np.arange(extra)]
                ),
                pa.int64(),
            ),
            "embedding": pa.array(
                list(np.vstack([good, poison]).astype(np.float32)),
                pa.list_(pa.float32()),
            ),
        }
    )
    # first row group = exactly the sample; poison rows live in later groups
    pq.write_table(
        t, tmp_path / "embeddings.parquet", row_group_size=IVF_SAMPLE
    )
    cents = _ivf_centroids(str(tmp_path))
    assert cents.shape == (IVF_CENTROIDS, dim)
    assert np.isfinite(cents).all()


def test_cc_distributed_rounds_equal_local_solve(monkeypatch):
    """dedup_decision's two CC plans — the one-task numpy solve (small edge
    sets) and the bucketed hash-min rounds (the 100 TB path) — produce the
    identical decision table."""
    import oplog_analyzer_ray.pipelines.dedup as dmod

    local = (
        dmod.dedup_clusters(SF_DIR).to_pandas().reset_index(drop=True)
    )
    monkeypatch.setattr(dmod, "CC_LOCAL_EDGES", 0)  # force distributed
    # the decision table is session-memoized — drop the cache so the second
    # run actually exercises the distributed rounds instead of returning
    # the memoized local-solve result
    dmod._CHAIN_CACHE.clear()
    dist = dmod.dedup_clusters(SF_DIR).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(local, dist)
    assert (local["cluster_size"] >= 1).all()
    assert local.loc[local["is_canonical"], "doc_id"].equals(
        local.loc[local["is_canonical"], "cluster_id"]
    )


def test_batch_shingles_matches_per_row_reference():
    """The vectorized batch shingler must emit exactly the per-row
    _shingles() stream (same order within a row), including the short-doc
    whole-text case and empty strings."""
    import pandas as pd

    from oplog_analyzer_ray.pipelines.dedup import _batch_shingles, _shingles

    texts = pd.Series(
        ["a b c d e", "x y", "", "one", "p q r", "a b c d e", "t u v w"]
    )
    rows, sh = _batch_shingles(texts)
    got = {}
    for r, s in zip(rows, sh):
        got.setdefault(int(r), []).append(s)
    for i, t in enumerate(texts):
        assert got[i] == _shingles(t), (i, t)


def test_batch_shingles_hypothesis_random_texts():
    """Property: for ANY batch of space-separated texts (including empties,
    repeated tokens, single tokens), the vectorized shingler equals the
    per-row reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd

    from oplog_analyzer_ray.pipelines.dedup import _batch_shingles, _shingles

    token = st.text(alphabet="abxyz0", min_size=0, max_size=3)
    text = st.lists(token, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(text, min_size=0, max_size=12))
    def check(texts):
        rows, sh = _batch_shingles(pd.Series(texts, dtype=object))
        got: dict[int, list] = {}
        for r, s in zip(rows, sh):
            got.setdefault(int(r), []).append(s)
        for i, t in enumerate(texts):
            assert got.get(i, []) == _shingles(t)

    check()


def test_semantic_dedup_decision_invariants():
    """Every near-dup pair must land in ONE cluster labelled by its min
    member; canonical rows are exactly the cluster ids; sizes add up to the
    corpus."""
    from oplog_analyzer_ray.pipelines.similarity import semantic_dedup

    pairs = embedding_near_dups(SF_DIR).to_pandas()
    dec = semantic_dedup(SF_DIR).to_pandas()
    lbl = dict(zip(dec["vec_id"], dec["cluster_id"]))
    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        assert lbl[a] == lbl[b]
    by_cluster = dec.groupby("cluster_id")
    assert (by_cluster["vec_id"].min() == by_cluster["vec_id"].max().index).all()
    canon = dec[dec["is_canonical"]]
    assert set(canon["vec_id"]) == set(dec["cluster_id"].unique())
    assert canon["cluster_size"].sum() == len(dec)
    sizes = by_cluster.size()
    assert (dec["cluster_id"].map(sizes).to_numpy()
            == dec["cluster_size"].to_numpy()).all()


def test_knn_graph_chunk_invariant():
    """The kNN-graph triangle join must produce identical (vec_id, rank)
    tables for any chunk count — partitioning is an execution detail."""
    from oplog_analyzer_ray.pipelines.similarity import knn_graph

    a = knn_graph(SF_DIR, n_chunks=2).to_pandas()
    b = knn_graph(SF_DIR, n_chunks=5).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_split_leakage_report_detects_cross_split_cluster(tmp_path):
    """Docs 0 and 2 share identical text (one near-dup cluster) but their
    salted split hashes land in train and test — the report must count one
    leaked doc on each side; singleton docs must not leak.

    (doc_id → split under SPLIT_SALT: 0,1 → train, 3 → val, 2 → test.)"""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.curate import split_leakage_report

    dup = "alpha beta gamma delta epsilon zeta"
    docs = {
        0: dup,
        1: "totally different words about databases and sharding today",
        2: dup,
        3: "yet another unrelated document with its own vocabulary here",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "lang": pa.array(["en"] * len(docs)),
                "text": pa.array(list(docs.values()), pa.string()),
                "source": pa.array(["t"] * len(docs)),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = (
        split_leakage_report(str(tmp_path))
        .to_pandas()
        .set_index("split")
    )
    assert got.loc["train", "n_docs"] == 2
    assert got.loc["train", "leaked_docs"] == 1
    assert got.loc["test", "n_docs"] == 1
    assert got.loc["test", "leaked_docs"] == 1
    assert got.loc["val", "n_docs"] == 1
    assert got.loc["val", "leaked_docs"] == 0
    assert got.loc["train", "n_tokens"] == len(dup.split()) + len(
        docs[1].split()
    )


def test_simhash_pairs_banding_matches_bruteforce(monkeypatch):
    """The 4×16-bit banded index must find EXACTLY the brute-force
    hamming ≤ K pair set (pigeonhole recall 1.0, verify kills false
    positives), and the block-paired emission must hold under a tiny
    chunk edge (every block-pair path exercised, incl. a hot group)."""
    from oplog_analyzer_ray.pipelines import dedup as dd

    monkeypatch.setattr(dd, "SIMHASH_PAIR_CHUNK", 7)
    rng = np.random.default_rng(11)
    n = 400
    base = rng.integers(0, 1 << 63, size=40, dtype=np.int64)
    sims = base[rng.integers(0, len(base), n)]
    # flip 0-6 random bits per doc so hamming clusters around the threshold
    for i in range(n):
        for bit in rng.integers(0, 64, size=int(rng.integers(0, 7))):
            sims[i] = np.int64(
                np.uint64(sims[i]) ^ (np.uint64(1) << np.uint64(bit))
            )
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "simhash": sims})
    bands = dd._simhash_band_rows(df)
    got_tbl = dd._simhash_pairs_group(pa.Table.from_pandas(bands))
    got = {
        (a, b, h)
        for a, b, h in zip(
            got_tbl["doc_a"].to_pylist(),
            got_tbl["doc_b"].to_pylist(),
            got_tbl["hamming"].to_pylist(),
        )
    }  # cross-band duplicates collapse in the set, like grouped() does
    u = sims.view(np.uint64)
    want = set()
    for a in range(n):
        x = u[a] ^ u[a + 1 :]
        hs = np.array([bin(int(v)).count("1") for v in x])
        for off in np.flatnonzero(hs <= dd.SIMHASH_HAMMING_K):
            want.add((a, a + 1 + int(off), int(hs[off])))
    assert want  # the fixture must actually produce qualifying pairs
    assert got == want


def test_cc_local_task_long_shuffled_chain_exact(ray_session):
    """A near-dup CHAIN whose doc_ids are shuffled relative to chain order
    needs O(diameter) hash-min relax rounds — far past CC_MAX_ROUNDS for
    ~400+ documents.  The local solve previously fell out of its round
    loop silently and returned SPLIT components for exactly this topology
    (review finding, reproduced); it must now produce one component with
    the min-id label on every node (the union-find fallback), for chains
    well past the round cap and for a random graph checked against a
    reference union-find."""
    import numpy as np
    import pyarrow as pa

    import ray as _ray
    from oplog_analyzer_ray.pipelines.dedup import _cc_local_task

    rng = np.random.default_rng(7)
    for n in (400, 5000):
        ids = rng.permutation(10 * n)[:n].astype(np.int64)
        a, b = ids[:-1], ids[1:]
        t = pa.table(
            {"node": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )
        lbl = (
            _ray.get(_cc_local_task.remote(t))
            .column("lbl")
            .to_numpy(zero_copy_only=False)
        )
        assert len(np.unique(lbl)) == 1, n
        assert (lbl == ids.min()).all(), n

    # random graph: labels must equal a reference union-find's min labels
    n = 5000
    a = rng.integers(0, n, 12000).astype(np.int64)
    b = rng.integers(0, n, 12000).astype(np.int64)
    t = pa.table(
        {"node": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
    )
    res = _ray.get(_cc_local_task.remote(t))
    nodes = res.column("node").to_numpy(zero_copy_only=False)
    lbl = res.column("lbl").to_numpy(zero_copy_only=False)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    ref = np.array([find(int(x)) for x in nodes])
    assert np.array_equal(lbl, ref)


def test_lsh_pair_emit_survives_sort_fallback(monkeypatch):
    """embedding_near_dups_lsh's probe-emit key column used to be named
    "_bucket", colliding with the internal column hash_bucket_apply's
    sort-based fallback appends — the >gate scale path crashed while the
    exchange path passed (review finding).  Force the fallback and require
    identical pairs from both plans."""
    import oplog_analyzer_ray.pipelines.agg as amod

    via_exchange = (
        embedding_near_dups_lsh(SF_DIR).to_pandas()
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )
    monkeypatch.setattr(amod, "EXCHANGE_GATE_MAX_BYTES", 0)
    via_fallback = (
        embedding_near_dups_lsh(SF_DIR).to_pandas()
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_exchange, via_fallback)
    assert len(via_exchange) > 0


def test_ann_recall_denominator_on_tiny_corpus(tmp_path):
    """recall@k must divide by each query's ACTUAL brute-force result size:
    on a corpus with fewer than TOP_K+1 vectors a perfect ANN match is
    recall 1.0, not hits/TOP_K (review finding)."""
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.similarity import ann_recall_report

    rng = np.random.default_rng(3)
    n = 6  # brute force returns only n-1 = 5 < TOP_K neighbors per query
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    from oplog_analyzer_ray.pipelines.similarity import knn_bruteforce, knn_lsh

    rep = (
        ann_recall_report(str(tmp_path)).to_pandas()
        .sort_values("query_id").reset_index(drop=True)
    )
    assert len(rep) == 5  # N_QUERIES
    brute = knn_bruteforce(str(tmp_path)).to_pandas()
    lsh = knn_lsh(str(tmp_path)).to_pandas()
    # reference recall: |lsh ∩ brute| / |brute| per query — |brute| is 5
    # here (n-1 < TOP_K), so the old fixed-TOP_K denominator capped every
    # recall at 0.5 even for a perfect match
    for _, row in rep.iterrows():
        q = int(row["query_id"])
        bset = set(brute.loc[brute.query_id == q, "neighbor_id"])
        lset = set(lsh.loc[lsh.query_id == q, "neighbor_id"])
        assert len(bset) == 5
        assert row["recall_lsh"] == len(bset & lset) / len(bset)
    # and the corrected denominator admits 1.0 (unreachable under /TOP_K):
    # brute-force compared against itself is perfect recall by construction
    assert (rep["recall_lsh"] <= 1.0).all() and (rep["recall_ivf"] <= 1.0).all()
