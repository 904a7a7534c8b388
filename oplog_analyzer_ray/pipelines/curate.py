"""End-to-end training-corpus curation (beyond-reference flagship compose).

The decision pipeline a real LLM-data curation run executes over 100 TB:

1. near-dup DEDUP — keep only the canonical representative of each
   duplicate cluster (``dedup.dedup_decision``: LSH candidates → exact
   Jaccard verify → hash-min connected components);
2. QUALITY filter — composite heuristic ≥ ``MIN_QUALITY`` (same formula as
   ``text.quality_scores``);
3. stratified LANGUAGE re-balancing — the deterministic per-language
   permille gate of ``text.stratified_sample``;
4. benchmark DECONTAMINATION — eval documents themselves and any document
   sharing an eval word-5-gram are dropped (``text.eval_gram_hits`` against
   the broadcast eval set);
5. REPETITION gate — duplicated-2-gram fraction ≤ ``MAX_DUP_2GRAM``
   (``text.dup_2gram_fraction``, the Gopher-style filter).

Scale shape: quality + strata + decontamination + repetition are all
evaluated in the SAME single pass over
the documents scan (no extra corpus read per criterion), each side is
PRE-FILTERED before the join so only surviving (doc_id, small-int) rows
enter the one doc_id-bucketed exchange that intersects them.  Nothing
driver-side; no corpus-sized sort (the report sort runs over the curated
survivors only).

The SQL oracle (oracle.CURATED_CORPUS) re-derives all three criteria and
the join in one statement; parity is pinned at sf0.001 (pytest) and sf0.01
(driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .agg import (
    GroupSpec,
    MERGE_BUCKETS,
    dyn_buckets,
    final_empty,
    grouped,
    hash_bucket_apply,
    pin_schema,
)
from .dedup import dedup_decision
from .text import (
    DECON_EVAL_DOCS,
    _eval_gram_set,
    _trunc6,
    dup_2gram_fraction,
    eval_gram_hits,
    quality_components,
    read_documents,
    resolve_eval_grams,
    strata_gate,
)

# composite-quality keep threshold (compared on the 6dp-truncated value so
# both engines gate on bit-identical numbers)
MIN_QUALITY = 0.5
# repetition keep threshold: duplicated-2-gram fraction (6dp-truncated,
# int/int division so the gate input is bit-identical across engines)
MAX_DUP_2GRAM = 0.1


def curated_corpus(sf_dir: str) -> Dataset:
    """The curated-corpus decision table: one row per KEPT document —
    ``(doc_id, lang, quality, cluster_size)``, sorted by doc_id."""
    buckets = dyn_buckets(MERGE_BUCKETS)
    grams_ref = ray.put(_eval_gram_set(sf_dir))  # broadcast once

    # side A: canonical docs only (pre-filtered before the exchange)
    def canon(t: pa.Table) -> pa.Table:
        k = t.filter(t.column("is_canonical"))
        return pa.table(
            {
                "doc_id": k.column("doc_id"),
                "cluster_size": k.column("cluster_size"),
                "lang": pa.nulls(k.num_rows, pa.string()),
                "quality": pa.nulls(k.num_rows, pa.float64()),
                "_side": pa.array([0] * k.num_rows, pa.int8()),
            }
        )

    side_a = dedup_decision(sf_dir).map_batches(canon, batch_format="pyarrow")

    # side B: quality + strata + decontamination + repetition survivors
    # from ONE documents pass
    def qual_strata(df: pd.DataFrame) -> pa.Table:
        quality = _trunc6(quality_components(df)["quality"])
        _, in_strata = strata_gate(df)
        clean = (df["doc_id"] >= DECON_EVAL_DOCS) & (
            eval_gram_hits(df, resolve_eval_grams(grams_ref)) == 0
        )
        low_rep = _trunc6(dup_2gram_fraction(df)) <= MAX_DUP_2GRAM
        keep = (
            (quality >= MIN_QUALITY) & in_strata & clean & low_rep
        ).to_numpy()
        n = int(keep.sum())
        # arrow out with EXACTLY canon()'s schema: a pandas frame here
        # (nullable Int64 cluster_size) makes the union's blocks disagree
        # and the streaming executor warn on every bundle boundary
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy()[keep], pa.int64()
                ),
                "cluster_size": pa.nulls(n, pa.int64()),
                "lang": pa.array(df["lang"].to_numpy()[keep], pa.string()),
                "quality": pa.array(
                    quality.to_numpy()[keep], pa.float64()
                ),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    side_b = read_documents(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        qual_strata, batch_format="pandas"
    )

    # inner join on doc_id: one bucketed exchange of the two pre-filtered
    # survivor sets, vectorized index_in intersection per bucket
    def join(group: pa.Table) -> pa.Table:
        is_a = pc.equal(group.column("_side"), 0)
        a = group.filter(is_a)
        b = group.filter(pc.invert(is_a))
        idx = pc.index_in(b.column("doc_id"), value_set=a.column("doc_id"))
        hit = pc.is_valid(idx)
        b = b.filter(hit)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "quality": b.column("quality"),
                "cluster_size": pc.take(
                    a.column("cluster_size"), pc.filter(idx, hit)
                ),
            }
        )

    from .dedup import _use_exchange

    # pin AFTER the sort (which drops empty blocks): a fully-filtered
    # corpus — every doc gated out — must still surface the documented
    # 4-column schema
    return pin_schema(
        hash_bucket_apply(
            side_a.union(side_b),
            ("doc_id",),
            join,
            buckets,
            use_exchange=_use_exchange(sf_dir),
        ).sort(["doc_id"]),
        pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()),
             ("quality", pa.float64()), ("cluster_size", pa.int64())]
        ),
    )


def split_leakage_report(sf_dir: str) -> Dataset:
    """Cross-split near-dup leakage QA — ``(split, n_docs, n_tokens,
    leaked_docs)``: per train/val/test split, its document/token volume and
    how many of its documents sit in a near-dup cluster that SPANS more
    than one split.  This is the contamination a hash-of-id split cannot
    prevent (near-identical texts carry different ids, so they draw
    independent split hashes) and the check a training-data pipeline runs
    before shipping a split.

    Scale shape: reuses the session-memoized dedup decision table and
    quality int table (NO new text pass); one doc_id-bucketed int join
    attaches (split_code, n_tokens) to cluster ids, one cluster_id-bucketed
    exchange derives the per-cluster span (leaked ⇔ min code < max code),
    and a ≤3-row grouped() histogram finishes.  The SQL oracle re-derives
    the clusters (recursive closure), the salted split gate and the span
    window in one statement (oracle.SPLIT_LEAKAGE_REPORT)."""
    import hashlib

    from .dedup import _index_in_strict, _use_exchange
    from .text import (
        SPLIT_SALT,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        documents_bytes,
        quality_int_table,
    )

    buckets = dyn_buckets(MERGE_BUCKETS)
    use_ex = _use_exchange(sf_dir)

    def dec_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cluster_id": t.column("cluster_id"),
                "code": pa.array(np.full(n, -1, dtype=np.int64)),
                "n_tokens": pa.array(np.full(n, -1, dtype=np.int64)),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tok_rows(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        # same salted gate as text.train_val_split (md5 is inherently
        # per-value; the repo-wide convention)
        h = np.fromiter(
            (
                int(
                    hashlib.md5(
                        (SPLIT_SALT + str(int(d))).encode()
                    ).hexdigest()[:8],
                    16,
                )
                % 1000
                for d in doc
            ),
            np.int64,
            len(doc),
        )
        code = np.select(
            [h < SPLIT_TRAIN_LT, h < SPLIT_VAL_LT], [0, 1], 2
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "cluster_id": pa.array(np.full(len(doc), -1, dtype=np.int64)),
                "code": pa.array(code),
                "n_tokens": t.column("n_tokens"),
                "_side": pa.array(np.ones(len(doc), dtype=np.int8)),
            }
        )

    side_a = dedup_decision(sf_dir).map_batches(
        dec_rows, batch_format="pyarrow"
    )
    side_b = quality_int_table(sf_dir).map_batches(
        tok_rows, batch_format="pyarrow"
    )

    def join(group: pa.Table) -> pa.Table:
        is_a = pc.equal(group.column("_side"), 0)
        a = group.filter(is_a)
        b = group.filter(pc.invert(is_a))
        idx = _index_in_strict(
            a.column("doc_id"), b.column("doc_id"), "split_leakage.join"
        )
        return pa.table(
            {
                "cluster_id": a.column("cluster_id"),
                "code": pc.take(b.column("code"), idx),
                "n_tokens": pc.take(b.column("n_tokens"), idx),
            }
        )

    joined = hash_bucket_apply(
        side_a.union(side_b),
        ("doc_id",),
        join,
        buckets,
        use_exchange=use_ex,
        empty=pa.schema(
            [
                ("cluster_id", pa.int64()),
                ("code", pa.int64()),
                ("n_tokens", pa.int64()),
            ]
        ).empty_table(),
    )

    def span(group: pa.Table) -> pa.Table:
        g = group.group_by(["cluster_id"]).aggregate(
            [("code", "min"), ("code", "max")]
        )
        idx = pc.index_in(
            group.column("cluster_id"), value_set=g.column("cluster_id")
        )
        leaked = pc.less(
            pc.take(g.column("code_min"), idx),
            pc.take(g.column("code_max"), idx),
        )
        return pa.table(
            {
                "code": group.column("code"),
                "n_tokens": group.column("n_tokens"),
                "leaked": pc.cast(leaked, pa.int64()),
            }
        )

    spanned = hash_bucket_apply(
        joined,
        ("cluster_id",),
        span,
        buckets,
        use_exchange=use_ex,
        empty=pa.schema(
            [
                ("code", pa.int64()),
                ("n_tokens", pa.int64()),
                ("leaked", pa.int64()),
            ]
        ).empty_table(),
    )


    hspec = GroupSpec(
        keys=("code",), count=True, sum_cols=("n_tokens", "leaked")
    )
    hist = grouped(
        spanned,
        hspec,
        empty=final_empty(
            hspec,
            {"code": pa.int64(), "n_tokens": pa.int64(),
             "leaked": pa.int64()},
        ),
    )

    _NAMES = {0: "train", 1: "val", 2: "test"}

    def finish(t: pa.Table) -> pa.Table:
        code = t.column("code").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "split": pa.array(
                    [_NAMES[int(c)] for c in code], pa.string()
                ),
                "n_docs": pc.cast(t.column("cnt"), pa.int64()),
                "n_tokens": pc.cast(t.column("sum_n_tokens"), pa.int64()),
                "leaked_docs": pc.cast(t.column("sum_leaked"), pa.int64()),
            }
        )


    # schema pin: Ray skips map UDFs on empty blocks and sort drops them,
    # so an empty corpus would otherwise surface a schema-less report
    return pin_schema(
        hist.map_batches(finish, batch_format="pyarrow").sort(["split"]),
        pa.schema(
            [("split", pa.string()), ("n_docs", pa.int64()),
             ("n_tokens", pa.int64()), ("leaked_docs", pa.int64())]
        ),
    )
