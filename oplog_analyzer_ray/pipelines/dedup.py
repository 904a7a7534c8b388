"""Deduplication operators over the ``documents`` table.

Training-data-pipeline dedup family (beyond the reference's surface — its
only distinct-computation is the first-K id sample set,
SampleCommand.java:275-290):

- exact dedup: hash-partitioned group-by content fingerprint, keep min doc_id;
- MinHash signatures (k=16, min-md5 per seeded shingle hash);
- LSH banding (b=8 bands × r=2 rows) → candidate pairs via band-key self-join;
- exact n-gram Jaccard verification of the candidates;
- SimHash (64-bit, token-frequency weighted) — no SQL oracle (bit-twiddling
  SQL would be its own engine); covered by property tests instead.

Scale notes: signatures/banding are embarrassingly-parallel ``map_batches``;
the candidate self-join co-locates rows by hash of the band key (bucketed
exchange, same pattern as pipelines/agg.py) and joins within buckets with a
vectorized pandas merge, so the shuffle carries only (band_key, doc_id) pairs
— never document text.  The Jaccard verify joins shingle sets back by doc_id;
at this corpus size the shingle table is broadcast via ``ray.put`` (the
small-side-join rule); the 100 TB path replaces that with a two-sided
hash-partitioned join on doc_id.

Shingle/hash conventions (mirrored EXACTLY in oracle.py SQL):
- tokens = text split on single space;
- shingles = word 3-grams joined by spaces; docs with <3 tokens use the whole
  text as one shingle;
- minhash_s = lexicographic min over shingles of md5("<seed>:" + shingle),
  seeds 0..15;
- band_b (b=0..7) = mh_{2b} || mh_{2b+1}.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from .agg import GroupSpec, grouped
from .text import read_documents

MINHASH_K = 16
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS
JACCARD_THRESHOLD = 0.05
MERGE_BUCKETS = 32


# ------------------------------------------------------------------ helpers
def _shingles(text: str) -> list[str]:
    t = text.split(" ")
    if len(t) < 3:
        return [text]
    return [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]


def _minhash_row(text: str) -> list[str]:
    sh = _shingles(text)
    sig = []
    for seed in range(MINHASH_K):
        prefix = f"{seed}:".encode()
        sig.append(
            min(hashlib.md5(prefix + s.encode()).hexdigest() for s in sh)
        )
    return sig


# ------------------------------------------------------------------ exact
def exact_dedup(sf_dir: str) -> Dataset:
    """Exact dedup by content hash: keep the min doc_id per distinct text.

    Hash-partitioned: per-block partial (min doc_id, count) per fingerprint,
    then the bucketed exchange merges partials — the content itself never
    shuffles, only (fp, doc_id, count)."""

    def fp_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "fp": df["text"].map(
                    lambda x: hashlib.md5(x.encode()).hexdigest()
                ),
                "doc_id": df["doc_id"],
            }
        )

    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fp_batch, batch_format="pandas"
    )
    g = grouped(ds, GroupSpec(keys=("fp",), min_cols=("doc_id",)))

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fp": t.column("fp"),
                "keep_doc_id": t.column("min_doc_id"),
                "n_copies": t.column("cnt"),
            }
        )

    return g.map_batches(post, batch_format="pyarrow").sort(["keep_doc_id"])


# ------------------------------------------------------------------ minhash
def minhash_signatures(sf_dir: str) -> Dataset:
    """k=16 MinHash signature per document (hex-string minima)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sigs = df["text"].map(_minhash_row)
        out = {"doc_id": df["doc_id"]}
        for i in range(MINHASH_K):
            out[f"mh_{i:02d}"] = sigs.map(lambda s, i=i: s[i])
        return pd.DataFrame(out)

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


def _band_rows(sig_df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, band_idx, band_key) — LSH banding of a signature frame."""
    frames = []
    for b in range(LSH_BANDS):
        key = sig_df[f"mh_{2 * b:02d}"] + sig_df[f"mh_{2 * b + 1:02d}"]
        frames.append(
            pd.DataFrame(
                {"doc_id": sig_df["doc_id"], "band_idx": b, "band_key": key}
            )
        )
    return pd.concat(frames, ignore_index=True)


def lsh_candidate_pairs(sf_dir: str) -> pa.Table:
    """Near-dup candidates: unordered doc pairs sharing ≥1 LSH band.

    The self-join runs inside hash buckets of band_key (co-location by
    content, not by doc): a bucketed exchange over (band_idx, band_key,
    doc_id) rows followed by a vectorized pandas self-merge per bucket."""
    sigs = minhash_signatures(sf_dir)
    bands = sigs.map_batches(_band_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["band_key"].to_numpy(), categorize=False)
        df = df.copy()
        df["_bucket"] = (h % MERGE_BUCKETS).astype("int64")
        return df

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=["band_idx", "band_key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"],
                "doc_b": m["doc_id_y"],
                "band_idx": m["band_idx"],
            }
        )

    pairs = (
        bands.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    g = grouped(pairs, GroupSpec(keys=("doc_a", "doc_b")))
    rows = g.to_pandas()
    out = (
        rows.rename(columns={"cnt": "n_shared_bands"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(
        out[["doc_a", "doc_b", "n_shared_bands"]],
        schema=pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("n_shared_bands", pa.int64()),
            ]
        ),
        preserve_index=False,
    )


def near_dup_jaccard(sf_dir: str) -> pa.Table:
    """Exact word-3-gram Jaccard for the LSH candidates, thresholded.

    Shingle sets are broadcast (small side) and the verify runs driver-side
    over the candidate list — candidates are rare by construction.  At
    100 TB the broadcast becomes a doc_id-partitioned join."""
    cands = lsh_candidate_pairs(sf_dir).to_pandas()
    docs = read_documents(sf_dir, ["doc_id", "text"]).to_pandas()
    sh = {r.doc_id: set(_shingles(r.text)) for r in docs.itertuples()}
    rows = []
    for r in cands.itertuples():
        a, b = sh[r.doc_a], sh[r.doc_b]
        j = len(a & b) / len(a | b)
        if j >= JACCARD_THRESHOLD:
            rows.append((r.doc_a, r.doc_b, np.floor(j * 1e6) / 1e6))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
    return pa.Table.from_pandas(
        out,
        schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
        ),
        preserve_index=False,
    )


# ------------------------------------------------------------------ simhash
def simhash64(sf_dir: str) -> Dataset:
    """64-bit SimHash over whitespace tokens (md5-derived bit vectors,
    token-frequency weighted).  No SQL oracle (rows-only driver check);
    similarity properties pinned by tests/test_dedup.py."""

    def one(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        toks, counts = np.unique(text.split(" "), return_counts=True)
        for tok, cnt in zip(toks, counts):
            bits = np.unpackbits(
                np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], np.uint8)
            ).astype(np.int64)
            acc += cnt * (2 * bits - 1)
        u = int(sum(1 << (63 - i) for i in range(64) if acc[i] > 0))
        return u - (1 << 64) if u >= (1 << 63) else u  # two's-complement int64

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "simhash": df["text"].map(one)}
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )
