"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_bruteforce``: exact cosine top-k per query — the baseline.  The
  query matrix is broadcast once via ``ray.put`` (read per actor/task from
  the object store, never re-shipped per batch); each batch computes a
  numpy matmul against the L2-normalized query matrix and keeps its local
  top-k, so only blocks×k×q candidate rows leave the map stage.
- ``knn_lsh``: random-hyperplane LSH-bucketed approximate variant — the
  scale path (search only the query's bucket ± hamming-1 probes).  No SQL
  oracle (approximate); recall vs brute-force pinned in tests.

Scale: brute-force cost is rows × q × d multiply-adds, embarrassingly
parallel, no shuffle.  The LSH variant cuts the scanned fraction to
~(probes / 2^planes).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

N_QUERIES = 5  # queries = vec_id 0..4
TOP_K = 10
LSH_PLANES = 6


def read_embeddings(sf_dir: str) -> Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df = t.to_pandas()
    df = df[df["vec_id"] < N_QUERIES].sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


def knn_bruteforce(sf_dir: str) -> pa.Table:
    """Exact cosine top-10 per query (self excluded); ties broken by
    neighbor_id asc; scores rounded to 6dp for cross-engine comparison."""
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((qids, qnorm))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qn = ray.get(qref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = mn @ qn.T  # (rows, q)
        out = []
        vid = df["vec_id"].to_numpy()
        for j, qid in enumerate(ids):
            col = cos[:, j]
            mask = vid != qid
            cand_idx = np.flatnonzero(mask)
            take = min(TOP_K, cand_idx.size)
            sel = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]]
            out.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": vid[sel], "cos_raw": col[sel]}
                )
            )
        return pd.concat(out, ignore_index=True)

    cands = (
        read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pandas")
        .to_pandas()
    )
    # final exact top-k per query over the tiny candidate set (driver-side)
    cands = cands.sort_values(
        ["query_id", "cos_raw", "neighbor_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", sort=True).head(TOP_K).reset_index(drop=True)
    top["cos"] = np.floor(top["cos_raw"] * 1e6) / 1e6
    return pa.Table.from_pandas(
        top[["query_id", "neighbor_id", "cos"]],
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("cos", pa.float64()),
            ]
        ),
        preserve_index=False,
    )


def _lsh_planes(d: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((LSH_PLANES, d))


def _bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype(np.int64)


def knn_lsh(sf_dir: str, probe_hamming: int = 2) -> pa.Table:
    """Approximate top-10 via random-hyperplane buckets: scan only vectors
    whose bucket is within ``probe_hamming`` bit-flips of the query's bucket
    (multi-probe).  With 6 planes and hamming≤2 that scans ~22/64 of the
    space instead of all of it.  Same output schema as ``knn_bruteforce``;
    recall vs brute-force checked in tests."""
    qids, qmat = _load_queries(sf_dir)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    planes = _lsh_planes(qmat.shape[1])
    qbuckets = _bucket_ids(qmat, planes)
    probe_sets = []
    for qb in qbuckets:
        s = {int(qb)}
        if probe_hamming >= 1:
            for p in range(LSH_PLANES):
                s.add(int(qb) ^ (1 << p))
        if probe_hamming >= 2:
            for p in range(LSH_PLANES):
                for p2 in range(p + 1, LSH_PLANES):
                    s.add(int(qb) ^ (1 << p) ^ (1 << p2))
        probe_sets.append(s)
    qref = ray.put((qids, qnorm, planes, probe_sets))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qn, pl, psets = ray.get(qref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        buckets = _bucket_ids(m, pl)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        vid = df["vec_id"].to_numpy()
        out = []
        for j, qid in enumerate(ids):
            mask = np.isin(buckets, list(psets[j])) & (vid != qid)
            if not mask.any():
                continue
            col = mn[mask] @ qn[j]
            sub_vid = vid[mask]
            take = min(TOP_K, col.size)
            sel = np.argpartition(-col, take - 1)[:take]
            out.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": sub_vid[sel], "cos_raw": col[sel]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "cos_raw": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    cands = (
        read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pandas")
        .to_pandas()
    )
    cands = cands.sort_values(
        ["query_id", "cos_raw", "neighbor_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", sort=True).head(TOP_K).reset_index(drop=True)
    top["cos"] = np.floor(top["cos_raw"] * 1e6) / 1e6
    return pa.Table.from_pandas(
        top[["query_id", "neighbor_id", "cos"]],
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("cos", pa.float64()),
            ]
        ),
        preserve_index=False,
    )


NEAR_DUP_COS = 0.4


def embedding_near_dups(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine ≥ 0.4.

    Each block compares its rows against the ray.put-broadcast normalized
    matrix (fetched once per worker from the object store), emitting only
    above-threshold pairs — O(rows_in_block × n) per task, exact.  At corpus
    scales where the matrix no longer broadcasts, the LSH bucket machinery
    above becomes the candidate generator (bucketed self-join, approximate),
    with this exact kernel applied within buckets.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).to_pandas()
    allm = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    alln = allm / np.linalg.norm(allm, axis=1, keepdims=True)
    all_ids = t["vec_id"].to_numpy()
    ref = ray.put((all_ids, alln))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, an = ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = mn @ an.T  # (block_rows, n)
        vid = df["vec_id"].to_numpy()
        bi, aj = np.nonzero(cos >= NEAR_DUP_COS)
        keep = vid[bi] < ids[aj]  # unordered pairs once, no self
        return pd.DataFrame(
            {
                "vec_a": vid[bi[keep]],
                "vec_b": ids[aj[keep]],
                "cos": np.floor(cos[bi[keep], aj[keep]] * 1e6) / 1e6,
            }
        )

    out = (
        read_embeddings(sf_dir)
        .map_batches(pairs, batch_format="pandas")
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        out,
        schema=pa.schema(
            [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos", pa.float64())]
        ),
        preserve_index=False,
    )
