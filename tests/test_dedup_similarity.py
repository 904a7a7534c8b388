"""Property tests for the non-SQL-expressible ops (SURVEY.md §5.5):
SimHash similarity behavior and LSH-ANN recall vs the brute-force baseline."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from oplog_analyzer_ray.pipelines.dedup import simhash64
from oplog_analyzer_ray.pipelines.similarity import knn_bruteforce, knn_lsh

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
