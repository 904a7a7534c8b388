"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages beyond the reference's own surface
(the reference analyzes oplogs only; these are the text-corpus analogues of
its per-record classify/measure loop, BaseOplogCommand.java:91-103):
token counting, quality scoring, language-ID heuristics, and document
fingerprinting.  Every rule here is mirrored exactly by oracle SQL in
``oracle.py`` (driver runs both at sf0.01).

All stages are single-pass ``map_batches`` over pandas batches (vectorized
``str`` kernels; the per-row work is tokenization, which pandas does in C).
No shuffle: each is embarrassingly parallel and scales linearly with input
blocks.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

from .agg import pin_schema as _pin_schema  # shared schema pin

# language marker tokens (disjoint per language; tie-break: lang asc)
LANG_MARKERS = {
    "de": ("der", "und"),
    "en": ("the", "a"),
    "es": ("el", "la"),
    "fr": ("le", "et"),
}


def documents_path(sf_dir: str) -> str:
    """The documents corpus: single file or ``documents/`` directory
    (shared layout contract — see :mod:`.corpus`)."""
    from .corpus import corpus_path

    return corpus_path(sf_dir, "documents")


def documents_bytes(sf_dir: str) -> int:
    """On-disk corpus size across however many files it spans (round-2's
    single-file ``getsize`` broke on exactly the layout real scale
    produces)."""
    from .corpus import corpus_bytes

    return corpus_bytes(sf_dir, "documents")


def read_documents(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    """Column-pruned documents scan (single-file or directory corpus).
    Small corpora arrive as a single parquet file, which Ray reads as ONE
    block — that serializes every downstream kernel onto one core.  Ask for
    ~2 blocks per CPU so the per-doc kernels (shingling, md5) parallelize
    regardless of the input file layout; at real scale (many files) the
    hint is a no-op cap."""
    from .agg import dyn_buckets
    from .corpus import clean_read_schema

    return ray.data.read_parquet(
        documents_path(sf_dir),
        columns=columns,
        schema=clean_read_schema(sf_dir, "documents", columns),
        override_num_blocks=dyn_buckets(16),
    )



def _trunc6(s):
    """Truncate to 6dp: floor(x*1e6)/1e6 — bit-identical to the SQL
    ``floor(x*1000000)/1000000`` (unlike ROUND, whose half-way rule differs
    between numpy round-half-even and DuckDB round-half-away)."""
    return np.floor(s * 1e6) / 1e6


def _md5_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashlib.md5(x.encode()).hexdigest())


def _salted_permille(doc_ids: pd.Series, salt: str) -> pd.Series:
    """Deterministic permille in [0, 1000) from a salted md5 of the doc id
    — the shared gate under train_val_split / importance_sample (each with
    its own salt, so the draws are independent).  Must stay byte-identical
    to the oracle SQL's md5 expression."""
    return (
        doc_ids.map(
            lambda d: int(
                hashlib.md5((salt + str(int(d))).encode()).hexdigest()[:8],
                16,
            )
            % 1000
        )
        .astype("int64")
    )


def _exploded_tokens(df: pd.DataFrame):
    """(tokens-series, n_tokens, exploded) — the C-level whitespace token
    pipeline shared by token_counts / quality / lang_id.  ``exploded`` is
    one row per token indexed by the source row, so per-doc reductions are
    a single ``groupby(level=0)`` (no Python per-row lambdas; every sum is
    over integers, so results are bit-identical to the per-row form)."""
    toks = df["text"].str.split(" ")
    n = toks.str.len().astype("int64")
    return toks, n, toks.explode()


def token_counts(sf_dir: str) -> Dataset:
    """Whitespace token counting + char stats per document."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        _, n, ex = _exploded_tokens(df)
        uniq = (
            ex.groupby(level=0).nunique().reindex(df.index).astype("int64")
        )
        # token-length sums are integers < 2^53 → the float division is
        # exact and order-independent (matches list_aggregate(...,'avg'))
        len_sum = ex.str.len().groupby(level=0).sum().reindex(df.index)
        avg_len = len_sum.astype("float64") / n.astype("float64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n,
                "n_chars": df["text"].str.len().astype("int64"),
                "uniq_tokens": uniq,
                "avg_token_len": _trunc6(avg_len),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("n_chars", pa.int64()), ("uniq_tokens", pa.int64()),
             ("avg_token_len", pa.float64())]
        ),
    )


# quality-score components (length/punct/stopword/uniqueness — the full
# training-data quality contract); length saturates at QUAL_LEN_SAT tokens
QUAL_LEN_SAT = 64.0


def quality_components(df: pd.DataFrame) -> dict:
    """The four quality terms + untruncated composite for one batch of
    documents (shared by :func:`quality_scores` and
    :mod:`~oplog_analyzer_ray.pipelines.curate`)."""
    stop = ("the", "a")
    _, n_i, ex = _exploded_tokens(df)
    n = n_i.astype("float64")
    stop_hits = ex.isin(stop).groupby(level=0).sum().reindex(df.index)
    uniq = (
        ex.groupby(level=0).nunique().reindex(df.index).astype("float64")
    )
    stop_ratio = stop_hits / n
    uniq_ratio = uniq / n
    n_chars = df["text"].str.len().astype("float64")
    punct = df["text"].str.count(r"[^A-Za-z0-9 ]").astype("float64")
    # empty doc: no chars → punctuation density defined as 0.0 (the SQL
    # mirrors with COALESCE; numpy 0/0=NaN vs DuckDB /0=NULL otherwise)
    punct_ratio = np.where(n_chars > 0, punct / np.maximum(n_chars, 1.0), 0.0)
    len_score = np.minimum(n / QUAL_LEN_SAT, 1.0)
    quality = 0.25 * (
        uniq_ratio + (1.0 - stop_ratio) + (1.0 - punct_ratio) + len_score
    )
    return {
        "stop_ratio": stop_ratio,
        "uniq_ratio": uniq_ratio,
        "punct_ratio": punct_ratio,
        "len_score": len_score,
        "quality": quality,
    }


def quality_scores(sf_dir: str) -> Dataset:
    """Composite document-quality heuristic (0..1, higher = better):
    stopword ratio, type/token (uniqueness) ratio, punctuation density
    (non-alnum-non-space chars per char) and a saturating length score
    (n_tokens/64 capped at 1).  Composite = mean of the four goodness
    terms; every component is mirrored bit-exactly in SQL."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        c = quality_components(df)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "stopword_ratio": _trunc6(c["stop_ratio"]),
                "uniq_ratio": _trunc6(c["uniq_ratio"]),
                "punct_ratio": _trunc6(c["punct_ratio"]),
                "length_score": _trunc6(c["len_score"]),
                "quality": _trunc6(c["quality"]),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("stopword_ratio", pa.float64()),
             ("uniq_ratio", pa.float64()), ("punct_ratio", pa.float64()),
             ("length_score", pa.float64()), ("quality", pa.float64())]
        ),
    )


def lang_id(sf_dir: str) -> Dataset:
    """Marker-token language-ID heuristic; argmax hits, tie-break lang asc,
    zero hits → 'unknown'.  Compared against the table's labelled ``lang``."""
    langs = sorted(LANG_MARKERS)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        _, _, ex = _exploded_tokens(df)
        hits = {
            lang: ex.isin(LANG_MARKERS[lang])
            .groupby(level=0)
            .sum()
            .reindex(df.index)
            .astype("int64")
            for lang in langs
        }
        hm = pd.DataFrame(hits)
        best = hm.idxmax(axis=1)  # first (lang-asc) max wins: ties deterministic
        best[hm.max(axis=1) == 0] = "unknown"
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "pred_lang": best,
                "labelled_lang": df["lang"],
                **{f"hits_{lang}": hm[lang] for lang in langs},
            }
        )

    # pin: a zero-row corpus yields only skipped (schema-less) map outputs
    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("pred_lang", pa.string()),
             ("labelled_lang", pa.string())]
            + [(f"hits_{lang}", pa.int64()) for lang in langs]
        ),
    )


def lang_confusion(sf_dir: str) -> Dataset:
    """Language-ID confusion matrix: ``(lang, pred_lang, n_docs)`` — the
    labelled language crossed with :func:`lang_id`'s prediction, the QA
    rollup that tells you WHERE the classifier is wrong before you gate a
    corpus on it (per-cell counts expose systematic confusions, e.g. es→fr,
    that the scalar accuracy hides).

    Scale shape: lang_id's per-batch vectorized scorer → one ``grouped()``
    over at most |langs+1|² cells — the exchange moves a handful of partial
    rows per block, never documents."""

    from .agg import GroupSpec, final_empty, grouped

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"lang": df["labelled_lang"], "pred_lang": df["pred_lang"]}
        )


    spec = GroupSpec(keys=("lang", "pred_lang"))
    g = grouped(
        lang_id(sf_dir).map_batches(cell, batch_format="pandas"),
        spec,
        empty=final_empty(
            spec, {"lang": pa.string(), "pred_lang": pa.string()}
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t.column("lang"),
                "pred_lang": t.column("pred_lang"),
                "n_docs": t.column("cnt"),
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["lang", "pred_lang"]
        ),
        pa.schema([("lang", pa.string()), ("pred_lang", pa.string()),
                   ("n_docs", pa.int64())]),
    )


def doc_fingerprints(sf_dir: str) -> Dataset:
    """Content fingerprint per document (md5 + short prefix)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fp = _md5_series(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "fp": fp, "fp8": fp.str.slice(0, 8)}
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema([("doc_id", pa.int64()), ("fp", pa.string()),
                   ("fp8", pa.string())]),
    )


# --------------------------------------------------------- n-gram vocabulary
# corpus-wide top-K word bigrams — the vocabulary-building step of a
# training-data pipeline (count every n-gram once across 100 TB, keep the
# head of the distribution).
NGRAM_TOPK_K = 100


def ngram_topk(sf_dir: str, k: int = NGRAM_TOPK_K) -> Dataset:
    """Top-K word bigrams with global occurrence count (``cnt``) and
    document frequency (``df``), ordered (cnt desc, ngram asc).

    Scale shape: each batch collapses to one (ngram, cnt, df) partial row
    per DISTINCT bigram in the batch (vectorized flatten + shift, one arrow
    ``group_by``), so the keyed exchange moves vocabulary-sized partials,
    never corpus-sized token streams; ``df`` partials sum exactly because a
    document's rows never span batches.  The final merge is
    :func:`~.agg.grouped` (hash-bucketed, cluster-width) and
    :func:`~.agg.topk` prunes to K per block before the tiny global sort —
    only blocks × K rows reach the final head regardless of corpus size.
    """
    import pyarrow.compute as pc

    from .agg import GroupSpec, final_empty, grouped, topk

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {
                    "ngram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        # C-level flatten (the bigram_pmi/_batch_shingles idiom) — a
        # Python per-document loop here was the hottest full-corpus pass
        flat = toks.explode().to_numpy()
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        # a bigram is valid where token i and i+1 belong to the same doc
        valid = doc_idx[:-1] == doc_idx[1:]
        grams = flat[:-1][valid] + " " + flat[1:][valid]  # elementwise concat
        docs = df["doc_id"].to_numpy()[doc_idx[:-1][valid]]
        t = pa.table(
            {"ngram": pa.array(grams, pa.string()), "doc_id": pa.array(docs)}
        )
        occ = t.group_by(["ngram"]).aggregate([("doc_id", "count")])
        dfreq = (
            t.group_by(["ngram", "doc_id"])
            .aggregate([])
            .group_by(["ngram"])
            .aggregate([("doc_id", "count")])
        )
        # occ and dfreq have identical key sets (distinct ngrams this batch)
        idx = pc.index_in(occ.column("ngram"), value_set=dfreq.column("ngram"))
        return pa.table(
            {
                "ngram": occ.column("ngram"),
                "cnt": pc.cast(occ.column("doc_id_count"), pa.int64()),
                "df": pc.cast(
                    pc.take(dfreq.column("doc_id_count"), idx), pa.int64()
                ),
            }
        )

    partials = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pandas"
    )

    spec = GroupSpec(keys=("ngram",), count=False, sum_cols=("cnt", "df"))
    merged = grouped(
        partials,
        spec,
        empty=final_empty(
            spec, {"ngram": pa.string(), "cnt": pa.int64(),
                   "df": pa.int64()}
        ),
    ).map_batches(
        lambda t: t.select(["ngram", "sum_cnt", "sum_df"]).rename_columns(
            ["ngram", "cnt", "df"]
        ),
        batch_format="pyarrow",
    )
    # typed-empty finish: topk's lazy sort+limit drops the typed empty
    # grouped() provided, so a zero-row corpus would otherwise surface a
    # schema-less head (and a union pin trips Ray's limit/union planner)
    return topk(
        merged,
        k,
        [("cnt", "descending"), ("ngram", "ascending")],
        empty=pa.schema([("ngram", pa.string()), ("cnt", pa.int64()),
                         ("df", pa.int64())]).empty_table(),
    )


# -------------------------------------------------------- stratified sample
# per-language keep-rates in permille: corpus curation re-balances languages
# by downsampling the over-represented ones.  Unlisted languages use the
# default.  The gate is a deterministic content-free hash of doc_id, so the
# sample is reproducible, join-free, and each task decides membership alone.
STRATA_PERMILLE = {"en": 400, "de": 300, "es": 200, "fr": 100}
STRATA_DEFAULT_PERMILLE = 50


def strata_gate(df: pd.DataFrame) -> tuple[pd.Series, pd.Series]:
    """(hash_permille, keep) for the deterministic per-language sample gate
    (shared by :func:`stratified_sample` and
    :mod:`~oplog_analyzer_ray.pipelines.curate`)."""
    h = (
        _md5_series(df["doc_id"].astype(str))
        .str.slice(0, 8)
        .map(lambda s: int(s, 16))
        .astype("int64")
        % 1000
    )
    rate = (
        df["lang"]
        .map(STRATA_PERMILLE)
        .fillna(STRATA_DEFAULT_PERMILLE)
        .astype("int64")
    )
    return h, h < rate


def stratified_sample(sf_dir: str) -> Dataset:
    """Deterministic per-language stratified sample of the documents table.

    Membership: ``md5(str(doc_id))`` first 8 hex chars as an integer,
    mod 1000, kept iff below the language's permille rate.  Embarrassingly
    parallel — no shuffle, no state, no driver participation: the same row
    is kept on every run and on every cluster size, which is what makes the
    sample auditable (the SQL oracle re-derives the identical gate)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h, keep = strata_gate(df)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"][keep],
                "lang": df["lang"][keep],
                "hash_permille": h[keep],
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "lang"]).map_batches(
            fn, batch_format="pandas"
        ).sort(["doc_id"]),
        pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                   ("hash_permille", pa.int64())]),
    )


# ------------------------------------------------------------ BPE-ish tokens
# RE2-safe token classes shared verbatim with the DuckDB oracle: letter runs,
# digit runs, single non-alnum-non-space marks, whitespace runs — the
# GPT-2-style pre-tokenizer shape without the unicode category tables.
BPE_PATTERNS = {
    "word": r"[A-Za-z]+",
    "number": r"[0-9]+",
    "punct": r"[^A-Za-z0-9 ]",
}
BPE_ANY = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts_bpe(sf_dir: str) -> Dataset:
    """BPE-ish regex token counting (the second half of the token-counting
    contract; whitespace counting is ``token_counts``).  Pure vectorized
    ``pc.count_substring_regex`` — RE2 on both engines."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        out = {"doc_id": t.column("doc_id")}
        out["n_bpe_tokens"] = pc.cast(
            pc.count_substring_regex(txt, BPE_ANY), pa.int64()
        )
        for name, pat in BPE_PATTERNS.items():
            out[f"n_{name}_tokens"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()
            )
        return pa.table(out)

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pyarrow"
        ).sort(["doc_id"]),
        pa.schema(
            [("doc_id", pa.int64()), ("n_bpe_tokens", pa.int64()),
             ("n_word_tokens", pa.int64()), ("n_number_tokens", pa.int64()),
             ("n_punct_tokens", pa.int64())]
        ),
    )


# --------------------------------------------------------- rolling fingerprint
# polynomial-weight sliding-window hash: H(i) = Σ_j code(i+j)·(B^j mod M).
# With B=257, M=2^31-1, W=8 and codepoints < 2^21 every product stays under
# 2^52, so the int64 arithmetic is exact in numpy AND DuckDB BIGINT — the
# same literal weights appear in the oracle SQL.
ROLL_WINDOW = 8
ROLL_B = 257
ROLL_M = (1 << 31) - 1
ROLL_WEIGHTS = [pow(ROLL_B, j, ROLL_M) for j in range(ROLL_WINDOW)]


def rolling_fingerprints(sf_dir: str) -> Dataset:
    """Winnowing-style document fingerprint from the rolling window hash:
    per doc the min / max window hash and the count of distinct windows.
    The hash is rolling-updatable (geometric weights) but computed here as
    one vectorized correlation per document (``np.correlate`` over the
    UTF-32 codepoint array — no Python loop over characters).  Documents
    shorter than the window hash their whole text as one window padded by
    position (degenerate case mirrored in SQL)."""

    w = np.asarray(ROLL_WEIGHTS, dtype=np.int64)

    def one(text: str) -> tuple[int, int, int]:
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        if len(codes) < ROLL_WINDOW:
            h = int((codes * w[: len(codes)]).sum())
            return h, h, 1
        # correlate computes Σ_j codes[i+j]·w[j] — forward weights
        hs = np.correlate(codes, w, mode="valid")
        return int(hs.min()), int(hs.max()), int(np.unique(hs).size)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        res = df["text"].map(one)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "min_whash": res.map(lambda r: r[0]).astype("int64"),
                "max_whash": res.map(lambda r: r[1]).astype("int64"),
                "distinct_windows": res.map(lambda r: r[2]).astype("int64"),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ).sort(["doc_id"]),
        pa.schema(
            [("doc_id", pa.int64()), ("min_whash", pa.int64()),
             ("max_whash", pa.int64()), ("distinct_windows", pa.int64())]
        ),
    )


# ----------------------------------------------------------- decontamination
# Benchmark decontamination — the standard pre-training hygiene pass: flag
# training documents that share any word n-gram with an evaluation set so
# they can be dropped before training.  The eval side here is the first
# DECON_EVAL_DOCS documents (a deterministic stand-in for an external
# benchmark suite, which has the same tiny-corpus shape); real deployments
# swap _eval_gram_set for a read of the benchmark files, nothing else moves.
DECON_NGRAM = 5
DECON_EVAL_DOCS = 20


def _eval_gram_set(sf_dir: str) -> frozenset:
    """Eval-side word n-gram set via a bounded predicate-pushdown read: only
    row groups whose doc_id statistics overlap [0, DECON_EVAL_DOCS) are
    decoded, never the corpus (same discipline as similarity's query
    loader).  Benchmark suites are MB-scale, so the set broadcasts whole."""
    import pyarrow.dataset as pads

    t = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["text"], filter=pads.field("doc_id") < DECON_EVAL_DOCS
    )
    grams: set[str] = set()
    for text in t.column("text").to_pylist():
        toks = text.split(" ")
        for i in range(len(toks) - DECON_NGRAM + 1):
            grams.add(" ".join(toks[i : i + DECON_NGRAM]))
    return frozenset(grams)


# per-worker cache: the broadcast gram set is ray.get-resolved once per
# worker process, not once per batch (same pattern as enrich._TASK_CACHE).
# Keyed by the ObjectRef's hex id — unique and stable, unlike id(), whose
# CPython address can be reused by a later ref after the first is GC'd
# (which would silently serve corpus A's gram set to corpus B's run)
_DECON_CACHE: dict[str, frozenset] = {}


def resolve_eval_grams(grams_ref) -> frozenset:
    """ray.get the broadcast eval gram set once per worker process."""
    key = grams_ref.hex()
    grams = _DECON_CACHE.get(key)
    if grams is None:
        _DECON_CACHE.clear()  # at most one eval set per worker
        grams = ray.get(grams_ref)
        _DECON_CACHE[key] = grams
    return grams


def _word_ngrams(df: pd.DataFrame, n: int) -> pd.Series:
    """Word n-gram per token position (Series indexed by source row;
    positions whose window runs off the document end are NaN).  Built with
    C-level kernels: explode + per-doc shift + ``str.cat`` on a RangeIndex
    (str.cat aligns by index and the duplicated doc-row index would
    mis-align, so cat positionally and restore the doc index after)."""
    ex = df["text"].str.split(" ").explode()
    base = ex.reset_index(drop=True)
    shifted = [
        ex.groupby(level=0).shift(-k).reset_index(drop=True)
        for k in range(1, n)
    ]
    gram = base.str.cat(shifted, sep=" ") if shifted else base
    gram.index = ex.index
    return gram


def eval_gram_hits(df: pd.DataFrame, grams) -> pd.Series:
    """Distinct eval-set DECON_NGRAM-grams per document row (int64,
    index-aligned with ``df``)."""
    gram = _word_ngrams(df, DECON_NGRAM)
    return (
        gram[gram.isin(grams)]
        .groupby(level=0)
        .nunique()
        .reindex(df.index)
        .fillna(0)
        .astype("int64")
    )


def _2gram_stats(df: pd.DataFrame):
    """Per-document word-2-gram (grams, total, distinct) — the one place
    the 2-gram convention lives; both the curation gate and the
    repetition report derive from it so they cannot drift."""
    g = _word_ngrams(df, 2).dropna()
    total = g.groupby(level=0).size().reindex(df.index).fillna(0).astype("int64")
    distinct = (
        g.groupby(level=0).nunique().reindex(df.index).fillna(0).astype("int64")
    )
    return g, total, distinct


def dup_2gram_fraction(df: pd.DataFrame) -> pd.Series:
    """Duplicated-2-gram fraction per document row (float64, untruncated;
    0.0 for docs with no 2-grams) — the repetition-gate input shared with
    :mod:`~oplog_analyzer_ray.pipelines.curate`."""
    _, total, distinct = _2gram_stats(df)
    return ((total - distinct).astype("float64") / total.astype("float64")).fillna(
        0.0
    )


def decontaminate(sf_dir: str) -> Dataset:
    """(doc_id, eval_gram_hits, contaminated) for every non-eval document.

    eval_gram_hits = number of DISTINCT word-DECON_NGRAM-grams the document
    shares with the eval set; contaminated = 1 if any.  Scale shape: the
    gram set is placed in the object store ONCE (``ray.put``) and resolved
    once per worker; documents stream through a single vectorized
    ``map_batches`` — n-grams are built with C-level kernels (explode +
    per-doc shift + ``str.cat``) and membership is a single ``isin`` against
    the broadcast set.  No shuffle; linear in corpus size like the rest of
    this module."""
    grams_ref = ray.put(_eval_gram_set(sf_dir))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        grams = resolve_eval_grams(grams_ref)
        df = df[df["doc_id"] >= DECON_EVAL_DOCS]
        hits = eval_gram_hits(df, grams)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "eval_gram_hits": hits,
                "contaminated": (hits > 0).astype("int64"),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("eval_gram_hits", pa.int64()),
             ("contaminated", pa.int64())]
        ),
    )


def repetition_scores(sf_dir: str) -> Dataset:
    """Within-document repetition stats (the Gopher-style repetition
    filters): per doc, the word-2-gram count, the duplicated-2-gram
    fraction (1 - distinct/total) and the most-frequent-2-gram fraction
    (max count / total).  Highly repetitive machine-generated text scores
    near 1 on both; clean prose near 0.  Single vectorized map_batches,
    no shuffle; ratios are int/int divisions so parity with the SQL
    oracle is bit-exact (then truncated to 6dp like every float here)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g, total, distinct = _2gram_stats(df)
        top = (
            g.groupby([g.index, g])
            .size()
            .groupby(level=0)
            .max()
            .reindex(df.index)
            .fillna(0)
            .astype("int64")
        )
        denom = total.astype("float64")
        dup = ((total - distinct).astype("float64") / denom).fillna(0.0)
        topf = (top.astype("float64") / denom).fillna(0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_2grams": total,
                "dup_2gram_frac": _trunc6(dup),
                "top_2gram_frac": _trunc6(topf),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_2grams", pa.int64()),
             ("dup_2gram_frac", pa.float64()),
             ("top_2gram_frac", pa.float64())]
        ),
    )


def source_mixture(sf_dir: str) -> Dataset:
    """Per-source token-weighted mixture report: document count, token
    count, token share of the corpus, and the uniform-target resampling
    weight ``total_tokens / (n_sources · src_tokens)`` — the factor that
    up/down-samples each source so the token mixture becomes uniform (any
    published target mixture is a per-source scaling of these weights).

    Scale shape: per-doc token counts collapse inside each block, then
    :func:`~.agg.grouped` merges sources × blocks partial rows — the
    exchange never moves text.  The final table is #sources rows, so the
    global ratios are computed on a driver-side tiny table by design.
    All ratios are integer/integer divisions (bit-exact vs the oracle)."""

    from .agg import GroupSpec, final_empty, grouped

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"],
                "n_tok": df["text"].str.split(" ").str.len().astype("int64"),
            }
        )


    spec = GroupSpec(keys=("source",), count=True, sum_cols=("n_tok",))
    per_src = grouped(
        read_documents(sf_dir, ["source", "text"]).map_batches(
            tokens, batch_format="pandas"
        ),
        spec,
        empty=final_empty(spec, {"source": pa.string(), "n_tok": pa.int64()}),
    )
    t = pa.concat_tables(
        [b for b in ray.get(per_src.to_arrow_refs()) if b.num_columns]
    )
    n_tok = t.column("sum_n_tok").to_numpy().astype(np.int64)
    total = int(n_tok.sum())
    n_src = len(n_tok)
    if n_src == 0:  # empty corpus: no sources, no weights
        return ray.data.from_arrow(
            pa.schema(
                [("source", pa.string()), ("n_docs", pa.int64()),
                 ("n_tokens", pa.int64()), ("token_share", pa.float64()),
                 ("sample_weight", pa.float64())]
            ).empty_table()
        )
    out = pa.table(
        {
            "source": t.column("source"),
            "n_docs": t.column("cnt"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "token_share": pa.array(_trunc6(n_tok / float(total))),
            "sample_weight": pa.array(_trunc6(float(total) / (n_src * n_tok))),
        }
    )
    return ray.data.from_arrow(out)


# per-worker cache for the broadcast unigram vocabulary (same pattern as
# _DECON_CACHE: resolved once per worker process, not per batch)
_VOCAB_CACHE: dict[str, dict] = {}


def _unigram_counts(sf_dir: str) -> Dataset:
    """Corpus unigram frequencies: each block collapses to one (tok, cnt)
    row per distinct token (pandas ``value_counts``), then
    :func:`~.agg.grouped` merges vocabulary-sized partials — the exchange
    never moves the token stream."""
    from .agg import GroupSpec, final_empty, grouped

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame(
            {
                "tok": vc.index.astype(str),
                "cnt": vc.to_numpy(dtype=np.int64),
            }
        )


    spec = GroupSpec(keys=("tok",), count=False, sum_cols=("cnt",))
    return grouped(
        read_documents(sf_dir, ["text"]).map_batches(
            partial, batch_format="pandas"
        ),
        spec,
        empty=final_empty(spec, {"tok": pa.string(), "cnt": pa.int64()}),
    )


# ---- vocabulary bound for the broadcast-vocab family -----------------
# The driver/broadcast dict must NOT grow with open-web corpus vocabulary
# (the long tail is hapax-dominated: most distinct tokens appear once).
# Contract: per-token counts are CLAMPED at a floor — count_eff =
# max(count, FLOOR) / df_eff = max(df, FLOOR) — so only tokens STRICTLY
# ABOVE the floor need a dict entry (a miss means "≤ floor", which clamps
# to exactly FLOOR).  Pricing: #tokens with count > F is ≤ total_tokens /
# (F+1) — a hard bound that shrinks 1/F with the floor, and in practice
# far smaller (Zipf: the ≥3-occurrence vocabulary of a web corpus is
# ~10⁷-10⁸ entries, node-memory-safe; raise the env floor if not).  The
# oracle SQL mirrors the clamp via GREATEST(·, FLOOR).
DF_FLOOR = int(os.environ.get("OPLOG_DF_FLOOR", 2))
CNT_FLOOR = int(os.environ.get("OPLOG_CNT_FLOOR", 2))


def _bounded_vocab(vd: Dataset, floor: int) -> dict:
    """Driver dict of the (tok, sum_cnt) rows with ``sum_cnt > floor`` —
    pruned AT THE DATASET PLANE (per-block filter before ``ray.get``), so
    the driver never materializes the full vocabulary table."""
    import pyarrow.compute as pc

    def above(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("sum_cnt"), floor))

    blocks = [
        b
        for b in ray.get(
            vd.map_batches(above, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_columns  # an empty vocab dataset yields schema-less blocks
    ]
    if not blocks:
        return {}
    vt = pa.concat_tables(blocks)
    return dict(
        zip(
            vt.column("tok").to_pylist(),
            vt.column("sum_cnt").to_numpy().astype(np.int64).tolist(),
        )
    )


def _vocab_total(vd: Dataset) -> int:
    """Exact Σ sum_cnt over the vocabulary dataset via per-block partial
    sums — one tiny row per block reaches the driver, never the vocab."""
    import pyarrow.compute as pc

    def part(t: pa.Table) -> pa.Table:
        s = pc.sum(t.column("sum_cnt")).as_py() or 0
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    blocks = [
        b
        for b in ray.get(
            vd.map_batches(part, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_columns
    ]
    if not blocks:  # empty vocabulary (empty corpus)
        return 0
    parts = pa.concat_tables(blocks)
    return int(pc.sum(parts.column("s")).as_py() or 0)


def token_rarity(sf_dir: str) -> Dataset:
    """Perplexity-proxy fluency signal per document: ``commonness`` = mean
    clamped corpus frequency of the document's tokens (= Σ max(count(tok),
    CNT_FLOOR) / (n_tokens · total_tokens), an all-integer ratio so parity
    is bit-exact) and ``rarest_token_count`` = max(corpus count of the
    document's rarest token, CNT_FLOOR).  Docs full of hapax/garbage tokens
    score near 0; boilerplate scores high — the cheap stand-in for an LM
    perplexity filter.  The CNT_FLOOR clamp (documented at the constant) is
    what bounds the broadcast dict at open-web vocabulary scale; the
    denominator ``total_tokens`` stays the EXACT corpus token count
    (computed as a scalar, no dict needed).

    Two-phase scale shape: phase 1 aggregates unigram counts (vocabulary-
    sized exchange), prunes to the > CNT_FLOOR head at the dataset plane,
    and broadcasts that bounded dict (``ray.put`` once, per-worker cache);
    phase 2 streams documents through one vectorized scoring pass.  No
    corpus-sized shuffle; no driver structure that grows with vocabulary."""
    vd = _unigram_counts(sf_dir)
    total = _vocab_total(vd)
    vocab_ref = ray.put(_bounded_vocab(vd, CNT_FLOOR))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        key = vocab_ref.hex()  # stable ref identity (see _DECON_CACHE note)
        v = _VOCAB_CACHE.get(key)
        if v is None:
            _VOCAB_CACHE.clear()
            v = ray.get(vocab_ref)
            _VOCAB_CACHE[key] = v
        toks = df["text"].str.split(" ")
        n = toks.str.len().astype("int64")
        # exactness guard: commonness divides by n·total, computed in int64
        # then converted to float64 — both exact only below 2^53.  Fail
        # loudly past that (same loud-boundary convention as the CC
        # convergence guard) instead of silently wrapping/rounding.
        if len(n) and int(n.max()) * total > (1 << 53):
            raise RuntimeError(
                "token_rarity: n_tokens × total_tokens exceeds the exact "
                "float64 range (2^53) — the commonness ratio would lose "
                "bit-parity; rescale or shard the corpus"
            )
        # dict miss == "count ≤ CNT_FLOOR", which clamps to exactly the floor
        c = toks.explode().map(v).fillna(CNT_FLOOR).astype("int64")
        s = c.groupby(level=0).sum().reindex(df.index).astype("int64")
        rarest = c.groupby(level=0).min().reindex(df.index).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n,
                "rarest_token_count": rarest,
                "commonness": _trunc6(
                    s.astype("float64") / (n * total).astype("float64")
                ),
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("rarest_token_count", pa.int64()),
             ("commonness", pa.float64())]
        ),
    )


# --------------------------------------------------------------- packing
# Training-sequence packing (the concat-then-chunk pretraining layout): the
# corpus token stream, in doc_id order, is cut into fixed PACK_SEQ_TOKENS
# windows; each document is tagged with the sequence its first token lands
# in and its offset within it.
PACK_SEQ_TOKENS = 512


def pack_sequences(sf_dir: str, n_ranges: int | None = None) -> Dataset:
    """Sequence packing as a DISTRIBUTED PREFIX SCAN — the shape that holds
    at 100 TB, where the running token total is inherently sequential but
    the corpus is not driver-sized:

    1. ONE pass over the text computes ``(doc_id, n_tokens)`` — int rows
       (~16 B/doc) regardless of document width; only these move on.
    2. doc_id RANGE partition (bounds from the parquet footer statistics —
       no data pass): each range task exclusive-prefix-sums its own docs.
    3. The R per-range totals (R ≈ 2×cluster CPUs) are exclusive-scanned on
       the driver — the only sequential step, O(R) ints — and closed over.
    4. A final vectorized per-range pass adds the range offset:
       ``seq_id = cum_excl // PACK_SEQ_TOKENS``, ``seq_off = cum_excl %``.

    Token convention: split on single space (n = count(' ') + 1, empty text
    = 1 token), exactly DuckDB's ``len(string_split(text, ' '))`` — the
    oracle re-derives the packing with a SQL window function
    (oracle.PACK_SEQUENCES)."""
    import pyarrow.parquet as pq

    from .agg import GroupSpec, dyn_buckets, final_empty, grouped
    from .corpus import corpus_files

    # doc_id bounds from footer statistics (cheap, no data pass)
    dmin, dmax = None, None
    for f in corpus_files(sf_dir, "documents"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names["doc_id"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                dmin = st.min if dmin is None else min(dmin, st.min)
                dmax = st.max if dmax is None else max(dmax, st.max)
    if dmin is None:  # statistics absent: fall back to a min/max scan
        t = read_documents(sf_dir, ["doc_id"])
        dmin, dmax = t.min("doc_id"), t.max("doc_id")
    pack_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("seq_id", pa.int64()), ("seq_off", pa.int64())]
    )
    if dmin is None:  # empty documents table: nothing to pack
        return ray.data.from_arrow(pack_schema.empty_table())
    ranges = n_ranges or dyn_buckets(32)
    span = int(dmax) - int(dmin) + 1

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].str.count(" ") + 1).astype("int64")
        rng = ((df["doc_id"].to_numpy() - dmin) * ranges // span).astype(
            "int64"
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": n, "_rng": rng}
        )

    cnt = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pandas"
    ).materialize()  # int rows only; read twice (totals + scan) below

    # per-range token totals -> driver-side exclusive scan (R rows)
    tot = (
        grouped(cnt, GroupSpec(keys=("_rng",), count=False, sum_cols=("n_tokens",)))
        .to_pandas()
        .sort_values("_rng")
    )
    offs = dict(
        zip(
            tot["_rng"].to_numpy(),
            np.concatenate([[0], tot["sum_n_tokens"].to_numpy()[:-1].cumsum()]),
        )
    )

    def scan(t) -> "pa.Table":
        """All ranges of one hash bucket, vectorized (grouped cumsum +
        broadcast range offsets) — avoids a Ray sort stage and per-range
        task calls for what is milliseconds of numpy."""
    
        df = t.to_pandas()
        if not len(df):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_off": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values(["_rng", "doc_id"], kind="mergesort")
        nt = df["n_tokens"].to_numpy()
        cum_in = df.groupby("_rng", sort=False)["n_tokens"].cumsum().to_numpy() - nt
        cum_excl = df["_rng"].map(offs).to_numpy().astype(np.int64) + cum_in
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "seq_id": pa.array(cum_excl // PACK_SEQ_TOKENS, pa.int64()),
                "seq_off": pa.array(cum_excl % PACK_SEQ_TOKENS, pa.int64()),
            }
        )

    from .agg import hash_bucket_apply
    from .dedup import _use_exchange

    return _pin_schema(
        hash_bucket_apply(
            cnt,
            ("_rng",),
            scan,
            use_exchange=_use_exchange(sf_dir),
            empty=pack_schema.empty_table(),
        ).sort(["doc_id"]),
        pack_schema,
    )


# ------------------------------------------------------- budget selection
# data-selection-under-budget: keep the highest-quality documents until the
# kept set holds SELECT_BUDGET_PERMILLE of the corpus tokens (the greedy
# quality-ranked selection a real pretraining data pipeline runs)
SELECT_BUDGET_PERMILLE = 250  # keep the best 25% of corpus tokens



def quality_int_table(sf_dir: str) -> Dataset:
    """Session-memoized ``(doc_id, source, q_int, n_tokens)`` table — q_int is
    the 6dp-truncated quality in micro-units every quality gate compares
    on, n_tokens the single-space token count.  Shared by
    :func:`quality_budget_selection` and ``dedup.dedup_keep_best`` so a
    many-query sweep pays ONE quality text pass, not one per consumer
    (review finding: four independent full-corpus quality passes).  Uses
    the dedup chain-cache policy (materialize + memoize under the corpus
    byte gate, stream above it)."""
    from .dedup import _chain_cached

    import pyarrow.parquet as pq

    from .corpus import corpus_files

    # corpora without a source column (minimal fixtures) degrade to one
    # implicit source — source_budget_allocation then equals the global
    # budget selection, and nothing else reads the column
    has_src = (
        "source"
        in pq.read_schema(corpus_files(sf_dir, "documents")[0]).names
    )

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_components(df)["quality"]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "source": df["source"] if has_src else "",
                "q_int": np.floor(q * 1e6).astype("int64"),
                "n_tokens": (df["text"].str.count(" ") + 1).astype("int64"),
            }
        )

    cols = ["doc_id", "text"] + (["source"] if has_src else [])
    return _chain_cached(
        sf_dir,
        "quality_int",
        lambda: read_documents(sf_dir, cols).map_batches(
            qi, batch_format="pandas"
        ),
    )


def quality_budget_selection(sf_dir: str) -> Dataset:
    """Select documents in (quality DESC, doc_id ASC) order until the token
    budget fills: a doc is kept iff the tokens ranked strictly ahead of it
    (``cum_excl``) are still under ``budget = total_tokens · permille //
    1000``.

    100 TB shape — a global sort by quality would be an all-to-all of the
    corpus; instead:

    1. ONE text pass reduces each doc to ``(doc_id, q_int, n_tokens)`` int
       rows (q_int = floor(quality·1e6), the same 6dp-truncated value every
       other quality gate uses);
    2. the quality HISTOGRAM (≤1e6 distinct q_int values — bounded by the
       value range, not the corpus) merges via ``grouped()`` and the
       driver derives the budget, the per-q_int base offsets (tokens ranked
       strictly above each quality level) and the set of quality levels
       that can still contribute;
    3. docs at contributing levels exchange ONCE keyed on q_int; each level
       task prefix-sums its docs in doc_id order and keeps the prefix under
       budget.  Partitioning assumption (documented, same class as
       sessionization's one-user-per-task): one quality level's int rows
       fit one task — at 6dp truncation a pathological all-same-quality
       corpus degrades to one task over 16 B/doc rows, never text.

    The oracle re-derives the selection with a SQL window function over the
    same integer math (oracle.QUALITY_BUDGET_SELECTION)."""

    from .agg import GroupSpec, final_empty, grouped

    tbl = quality_int_table(sf_dir)  # session-memoized int rows


    hspec = GroupSpec(keys=("q_int",), count=False, sum_cols=("n_tokens",))
    # arrow refs, not Dataset.to_pandas(): the latter returns a COLUMNLESS
    # frame for a zero-row dataset (empty corpus), KeyErroring the sort
    hist = (
        pa.concat_tables(
            [
                b
                for b in ray.get(
                    grouped(
                        tbl,
                        hspec,
                        empty=final_empty(
                            hspec,
                            {"q_int": pa.int64(), "n_tokens": pa.int64()},
                        ),
                    ).to_arrow_refs()
                )
                if b.num_columns
            ]
        )
        .to_pandas()  # bounded: <=1e6 rows by the 6dp value range
        .sort_values("q_int", ascending=False)
    )
    tok = hist["sum_n_tokens"].to_numpy()
    total = int(tok.sum())
    budget = total * SELECT_BUDGET_PERMILLE // 1000
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "q_int": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_excl": pa.array([], pa.int64()),
        }
    )
    if budget == 0:
        # a 0-row block through ray.data loses its schema entirely
        # (from_arrow/from_pandas of an empty table → zero-column dataset),
        # so return the typed empty table itself — every consumer (driver,
        # tests) accepts Dataset | DataFrame | pa.Table alike
        return empty
    base = dict(
        zip(
            hist["q_int"].to_numpy(),
            np.concatenate([[0], tok[:-1].cumsum()]).astype(np.int64),
        )
    )
    # levels whose base offset already exceeds the budget cannot contribute
    keep_q = np.array(
        sorted(q for q, b in base.items() if b < budget), dtype=np.int64
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        # narrow to the scan's columns — the memoized table also carries
        # `source` (for source_budget_allocation), which this exchange
        # doesn't need to ship
        return df.loc[df["q_int"].isin(keep_q),
                      ["doc_id", "q_int", "n_tokens"]]

    def scan(t: pa.Table) -> pa.Table:
        """All levels of one hash bucket, vectorized: within-level exclusive
        prefix via a C-level grouped cumsum plus the broadcast base offsets
        (a per-LEVEL task would mean thousands of tiny tasks through a Ray
        sort stage — measured 11 s vs ~2 s at sf0.1)."""
        df = t.to_pandas()
        if not len(df):
            return empty
        df = df.sort_values(["q_int", "doc_id"], kind="mergesort")
        nt = df["n_tokens"].to_numpy()
        cum_in = df.groupby("q_int", sort=False)["n_tokens"].cumsum().to_numpy() - nt
        cum_excl = df["q_int"].map(base).to_numpy().astype(np.int64) + cum_in
        keep = cum_excl < budget
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()[keep], pa.int64()),
                "q_int": pa.array(df["q_int"].to_numpy()[keep], pa.int64()),
                "n_tokens": pa.array(nt[keep], pa.int64()),
                "cum_excl": pa.array(cum_excl[keep], pa.int64()),
            }
        )

    from .agg import hash_bucket_apply
    from .dedup import _use_exchange

    return _pin_schema(
        hash_bucket_apply(
            tbl.map_batches(prune, batch_format="pandas"),
            ("q_int",),
            scan,
            use_exchange=_use_exchange(sf_dir),
            empty=empty,
        ).sort(["doc_id"]),
        empty.schema,
    )


def source_budget_allocation(sf_dir: str) -> Dataset:
    """Data-mixing selection: split the global token budget EQUALLY across
    sources, then within each source keep documents in (quality DESC,
    doc_id ASC) order while the exclusive running token total stays under
    the per-source budget — ``(doc_id, source, q_int, n_tokens,
    cum_excl)``.  Equal per-source budgets rebalance the mixture (small
    sources keep proportionally more), the standard first lever when a few
    web-scale sources would otherwise dominate the kept set; any other
    budget vector w_i plugs into the same mechanism (the split is one
    driver-side division).

    Same 100 TB shape as :func:`quality_budget_selection`, keyed one level
    deeper: the histogram is (source, q_int) — bounded by sources × 1e6
    quality levels, a catalog-sized table, never the corpus — the driver
    derives per-source budgets + per-(source, q_int) base offsets, and docs
    at contributing levels exchange ONCE keyed on (source, q_int) for the
    within-level prefix scan.  Oracle: per-source SQL window over the same
    integer math (oracle.SOURCE_BUDGET_ALLOCATION)."""

    from .agg import GroupSpec, final_empty, grouped, hash_bucket_apply
    from .dedup import _use_exchange

    tbl = quality_int_table(sf_dir)  # session-memoized int rows (has source)


    hspec = GroupSpec(
        keys=("source", "q_int"), count=False, sum_cols=("n_tokens",)
    )
    hist = (
        pa.concat_tables(
            [
                b
                for b in ray.get(
                    grouped(
                        tbl,
                        hspec,
                        empty=final_empty(
                            hspec,
                            {"source": pa.string(), "q_int": pa.int64(),
                             "n_tokens": pa.int64()},
                        ),
                    ).to_arrow_refs()
                )
                if b.num_columns
            ]
        )
        .to_pandas()  # bounded: sources × ≤1e6 q_int levels
        .sort_values(["source", "q_int"], ascending=[True, False])
    )
    total = int(hist["sum_n_tokens"].sum())
    n_sources = hist["source"].nunique()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "q_int": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_excl": pa.array([], pa.int64()),
        }
    )
    if n_sources == 0:
        return empty
    budget = (total * SELECT_BUDGET_PERMILLE // 1000) // n_sources
    if budget == 0:
        return empty
    # per-source exclusive prefix over quality levels (tokens ranked
    # strictly above each level WITHIN its source); broadcast as a flat
    # int-coded map so the per-batch lookups stay vectorized — level code =
    # source_ordinal · 2^20 + q_int (q_int ≤ 1e6 < 2^20 by construction)
    cum_in_src = (
        hist.groupby("source", sort=False)["sum_n_tokens"].cumsum().to_numpy()
        - hist["sum_n_tokens"].to_numpy()
    )
    src_ord = {s: i for i, s in enumerate(hist["source"].unique())}
    hist_code = (
        hist["source"].map(src_ord).to_numpy(np.int64) * (1 << 20)
        + hist["q_int"].to_numpy()
    )
    base = pd.Series(cum_in_src.astype(np.int64), index=hist_code)
    keep_codes = base.index.to_numpy()[base.to_numpy() < budget]

    def _codes(df: pd.DataFrame) -> np.ndarray:
        return (
            df["source"].map(src_ord).to_numpy(np.int64) * (1 << 20)
            + df["q_int"].to_numpy()
        )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        mask = np.isin(_codes(df), keep_codes)
        return df.loc[mask, ["doc_id", "source", "q_int", "n_tokens"]]

    def scan(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return empty
        df = df.sort_values(["source", "q_int", "doc_id"], kind="mergesort")
        nt = df["n_tokens"].to_numpy()
        cum_in = (
            df.groupby(["source", "q_int"], sort=False)["n_tokens"]
            .cumsum()
            .to_numpy()
            - nt
        )
        cum_excl = base.loc[_codes(df)].to_numpy() + cum_in
        m = cum_excl < budget
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()[m], pa.int64()),
                "source": pa.array(df["source"].to_numpy()[m], pa.string()),
                "q_int": pa.array(df["q_int"].to_numpy()[m], pa.int64()),
                "n_tokens": pa.array(nt[m], pa.int64()),
                "cum_excl": pa.array(cum_excl[m], pa.int64()),
            }
        )

    return _pin_schema(
        hash_bucket_apply(
            tbl.map_batches(prune, batch_format="pandas"),
            ("source", "q_int"),
            scan,
            use_exchange=_use_exchange(sf_dir),
            empty=empty,
        ).sort(["doc_id"]),
        empty.schema,
    )


# --------------------------------------------------------- split assignment
# deterministic train/val/test assignment: salted md5 permille of the doc id
# (a DIFFERENT salt than the sampling gate, so split membership and sample
# membership are independent hash draws)
SPLIT_SALT = "split:"
SPLIT_TRAIN_LT = 980  # permille bounds: [0,980) train, [980,990) val, rest test
SPLIT_VAL_LT = 990


def train_val_split(sf_dir: str) -> Dataset:
    """Per-document split assignment — the leakage-proof way to split a
    100 TB corpus: membership is a pure function of the doc id (salted md5
    permille), so it is identical on every run, every cluster size and
    every table slice, with no shuffle, no state and no driver
    participation; eval contamination cannot creep in through re-runs.
    The SQL oracle re-derives the identical gate."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = _salted_permille(df["doc_id"], SPLIT_SALT)
        split = np.select(
            [h < SPLIT_TRAIN_LT, h < SPLIT_VAL_LT],
            ["train", "val"],
            "test",
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "hash_permille": h, "split": split}
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id"]).map_batches(
            fn, batch_format="pandas"
        ).sort(["doc_id"]),
        pa.schema([("doc_id", pa.int64()), ("hash_permille", pa.int64()),
                   ("split", pa.string())]),
    )


# ----------------------------------------------------------------- tf-idf
TFIDF_K = 3  # terms reported per document


def _docfreq_counts(sf_dir: str) -> Dataset:
    """Corpus document frequencies: each block collapses to one (tok, df)
    row per distinct token — a document lives wholly inside one batch, so
    per-block distinct (doc, tok) pairs are globally distinct and the
    :func:`~.agg.grouped` sum of per-block doc-counts IS the exact df."""
    from .agg import GroupSpec, final_empty, grouped

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].str.split(" ").explode()
        pairs = pd.DataFrame({"row": ex.index, "tok": ex.to_numpy()})
        vc = pairs.drop_duplicates()["tok"].value_counts()
        return pd.DataFrame(
            {"tok": vc.index.astype(str), "cnt": vc.to_numpy(dtype=np.int64)}
        )


    spec = GroupSpec(keys=("tok",), count=False, sum_cols=("cnt",))
    return grouped(
        read_documents(sf_dir, ["text"]).map_batches(
            partial, batch_format="pandas"
        ),
        spec,
        empty=final_empty(spec, {"tok": pa.string(), "cnt": pa.int64()}),
    )


def tfidf_topk(sf_dir: str) -> Dataset:
    """Top-``TFIDF_K`` terms per document by tf-idf — the classic keyword
    extractor, with an EXACT integer score so parity is bit-perfect:
    ``score_micro = tf · n_docs · 1_000_000 // max(df, DF_FLOOR)`` ranks
    identically to tf·(N/df_eff) (no transcendental idf, no float
    divergence); int64-safe for corpora under ~4×10¹⁰ documents at tf ≤ 200
    (guarded).  The DF_FLOOR clamp (documented at the constant) is what
    bounds the broadcast dict at open-web vocabulary scale: only tokens
    with df > DF_FLOOR carry an entry; a miss means df ≤ floor, which
    clamps to exactly DF_FLOOR.  The output ``df`` column is the effective
    (clamped) df — the engine provably cannot know the exact df of a token
    it pruned, and the oracle mirrors the same GREATEST.

    Two-phase broadcast-vocab shape (same as ``token_rarity``): phase 1
    merges the vocabulary-sized (tok, df) table, prunes to the > DF_FLOOR
    head at the dataset plane, and broadcasts that bounded dict (``ray.put``
    + per-worker cache); phase 2 streams documents through one vectorized
    tf + score + per-doc top-K pass.  No corpus-sized shuffle; no driver
    structure that grows with vocabulary."""
    from .corpus import corpus_rows

    n_docs = corpus_rows(sf_dir, "documents")
    df_ref = ray.put(_bounded_vocab(_docfreq_counts(sf_dir), DF_FLOOR))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        key = df_ref.hex()
        v = _VOCAB_CACHE.get(key)
        if v is None:
            _VOCAB_CACHE.clear()
            v = ray.get(df_ref)
            _VOCAB_CACHE[key] = v
        ex = df["text"].str.split(" ").explode()
        tf = ex.groupby([ex.index, ex]).size()
        rows = tf.index.get_level_values(0).to_numpy()
        tokens = tf.index.get_level_values(1).to_numpy(dtype=object)
        tfv = tf.to_numpy().astype(np.int64)
        if tfv.size and int(tfv.max()) * n_docs > (1 << 62) // 1_000_000:
            raise ValueError("tfidf_topk: score exceeds the int64 range")
        # dict miss == "df ≤ DF_FLOOR", which clamps to exactly the floor
        dfv = (
            pd.Series(tokens).map(v).fillna(DF_FLOOR).to_numpy(dtype=np.int64)
        )
        out = pd.DataFrame(
            {
                "row": rows,
                "token": tokens.astype(str),
                "tf": tfv,
                "df": dfv,
                "score_micro": tfv * n_docs * 1_000_000 // dfv,
            }
        )
        out = out.sort_values(
            ["row", "score_micro", "token"], ascending=[True, False, True]
        )
        out = out.groupby("row", sort=False).head(TFIDF_K)
        out["doc_id"] = df["doc_id"].to_numpy()[out["row"].to_numpy()]
        return out[["doc_id", "token", "tf", "df", "score_micro"]]

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ).sort(["doc_id", "token"]),
        pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()),
             ("tf", pa.int64()), ("df", pa.int64()),
             ("score_micro", pa.int64())]
        ),
    )


DOC_LEN_PCTS = (50, 90, 99)


def doc_length_percentiles(sf_dir: str) -> Dataset:
    """Per-source token-length percentiles (p50/p90/p99) — the corpus-shape
    report a mixing/packing decision reads, EXACT via the same mergeable
    counting-histogram shape as ``core.size_percentiles``: blocks collapse
    to (source, n_tokens) → count partials, the shuffle moves sources ×
    distinct-lengths rows (bounded by the VALUE RANGE, never the corpus),
    and one tiny per-source task reads the percentiles off the cumulative
    counts.  Reuses the session-memoized :func:`quality_int_table` — in a
    sweep this costs no new text pass.  Percentile convention (integer math
    both engines): p = the smallest length whose cumulative count satisfies
    ``cum · 100 ≥ n · p``."""

    from .agg import GroupSpec, final_empty, grouped

    pre = quality_int_table(sf_dir).map_batches(
        lambda t: t.select(["source", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    spec = GroupSpec(keys=("source", "n_tokens"))
    g = grouped(
        pre,
        spec,
        empty=final_empty(
            spec, {"source": pa.string(), "n_tokens": pa.int64()}
        ),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_tokens")
        cum = df["cnt"].to_numpy().cumsum()
        ln = df["n_tokens"].to_numpy()
        n = int(cum[-1])
        out = {
            "source": [df["source"].iloc[0]],
            "n_docs": np.array([n], np.int64),
        }
        for p in DOC_LEN_PCTS:
            idx = int(np.searchsorted(cum * 100, n * p, side="left"))
            out[f"p{p}"] = np.array([ln[idx]], np.int64)
        return pd.DataFrame(out)

    return _pin_schema(
        g.groupby("source")
        .map_groups(finish, batch_format="pandas")
        .sort(["source"]),
        pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64())]
            + [(f"p{p}", pa.int64()) for p in DOC_LEN_PCTS]
        ),
    )


# ------------------------------------------------------------- boilerplate
# Boilerplate detection (CCNet/RefinedWeb-style chrome filter adapted to
# the space-tokenized corpus): a word 3-gram is "boilerplate" when MORE
# THAN max(4, n_docs // 100) distinct documents contain it — headers,
# footers, license blocks, navigation chrome repeat across >1% of a crawl
# while organic prose does not.  Broadcast-side pricing (the reason this
# holds at 100 TB): Σ df over all shingles = total distinct (doc, shingle)
# pairs, so #shingles with df > F is ≤ that total / (F+1); with
# F ∝ n_docs the head is ≤ BOILER_DF_DIVISOR × avg distinct shingles per
# doc — CORPUS-SIZE-INDEPENDENT, unlike a raw vocabulary broadcast.
BOILER_DF_DIVISOR = 100
BOILER_DF_MIN = 4

_BOILER_CACHE: dict[str, frozenset] = {}


def _boiler_df_floor(sf_dir: str) -> int:
    from .corpus import corpus_rows

    return max(BOILER_DF_MIN, corpus_rows(sf_dir, "documents") // BOILER_DF_DIVISOR)


def _shingle_df(sf_dir: str) -> Dataset:
    """(g, sum_df): corpus document-frequency per distinct word 3-gram.
    Per-block partial counts distinct (doc, shingle) pairs — exact, since
    a document never spans blocks — then the standard grouped() merge;
    the exchange moves one row per distinct shingle per block, never the
    token stream."""
    from .agg import GroupSpec, final_empty, grouped
    from .dedup import _batch_shingles

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows, sh = _batch_shingles(df["text"])
        vc = (
            pd.DataFrame({"r": rows, "g": sh})
            .drop_duplicates()["g"]
            .value_counts()
        )
        return pd.DataFrame(
            {"g": vc.index.astype(str), "df": vc.to_numpy(dtype=np.int64)}
        )


    spec = GroupSpec(keys=("g",), count=False, sum_cols=("df",))
    return grouped(
        read_documents(sf_dir, ["text"]).map_batches(
            partial, batch_format="pandas"
        ),
        spec,
        empty=final_empty(spec, {"g": pa.string(), "df": pa.int64()}),
    )


def boilerplate_ngrams(sf_dir: str) -> Dataset:
    """Per-document boilerplate load: ``(doc_id, n_shingles, n_boiler,
    boiler_permille)`` where ``n_boiler`` counts the document's 3-gram
    OCCURRENCES whose corpus document-frequency exceeds the floor and
    ``boiler_permille = n_boiler * 1000 // n_shingles`` (all-integer, so
    parity is bit-exact; docs shorter than 3 tokens contribute their whole
    text as the single shingle — same convention as the dedup family).

    Two-phase scale shape (same as token_rarity, but with the provably
    bounded broadcast documented at BOILER_DF_DIVISOR): phase 1 aggregates
    shingle DF (shingle-vocabulary-sized exchange of int partials), prunes
    to the > floor head AT THE DATASET PLANE, broadcasts that bounded set
    once (``ray.put`` + per-worker cache); phase 2 streams documents
    through one vectorized membership pass.  Oracle:
    oracle.BOILERPLATE_NGRAMS re-derives floor, DF and the left join in
    SQL."""
    import pyarrow.compute as pc

    from .dedup import _batch_shingles

    floor = _boiler_df_floor(sf_dir)
    vd = _shingle_df(sf_dir)

    def above(t: pa.Table) -> pa.Table:
        return t.select(["g"]).filter(pc.greater(t.column("sum_df"), floor))

    hot_blocks = [
        b
        for b in ray.get(
            vd.map_batches(above, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_columns  # empty corpus: schema-less blocks, no hot set
    ]
    hot = (
        frozenset(pa.concat_tables(hot_blocks).column("g").to_pylist())
        if hot_blocks
        else frozenset()
    )
    hot_ref = ray.put(hot)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        key = hot_ref.hex()
        hot = _BOILER_CACHE.get(key)
        if hot is None:
            _BOILER_CACHE.clear()  # at most one hot set per worker
            hot = ray.get(hot_ref)
            _BOILER_CACHE[key] = hot
        n = len(df)
        rows, sh = _batch_shingles(df["text"])
        n_occ = np.bincount(rows, minlength=n).astype(np.int64)
        boil = pd.Series(sh).isin(hot).to_numpy()
        n_boil = np.bincount(rows[boil], minlength=n).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_shingles": n_occ,
                "n_boiler": n_boil,
                "boiler_permille": n_boil * 1000 // n_occ,
            }
        )

    return _pin_schema(
        read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_shingles", pa.int64()),
             ("n_boiler", pa.int64()), ("boiler_permille", pa.int64())]
        ),
    )


TOPK_PER_SOURCE = 3  # rows kept per source by top_docs_per_source


def top_docs_per_source(sf_dir: str) -> Dataset:
    """Per-group top-k ROWS (the window-rank primitive the family lacks —
    ``hot_keys_topk`` ranks GROUPS): the ``TOPK_PER_SOURCE`` highest-quality
    documents of each source — ``(source, rnk, doc_id, q_int)``, rnk dense
    from 1 in (q_int DESC, doc_id) order.  The "best exemplars per source"
    pull a curation review runs.

    Scale shape: reads the session-memoized quality int table (no new text
    pass), prunes to the per-source top-k INSIDE every block (a block can
    never contribute more than k rows per source, so the shuffle is bounded
    at blocks × sources × k rows regardless of corpus size), then a tiny
    per-source merge ranks the survivors.  Oracle:
    ``oracle.TOP_DOCS_PER_SOURCE`` (row_number window over the same quality
    expression)."""

    k = TOPK_PER_SOURCE

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["source", "q_int", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("source", sort=False).head(k)[
            ["source", "doc_id", "q_int"]
        ]

    def fin(df: pd.DataFrame) -> pa.Table:
        # one task over the bounded candidate set (blocks × sources × k
        # rows): rank within source, already in output order.  A sort-based
        # groupby(source) here costs a full extra shuffle stage for a
        # result this small (~2.8 s of pure machinery at sf0.01); shard by
        # source hash instead if sources × k ever outgrows one task.
        df = df.sort_values(
            ["source", "q_int", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = df.groupby("source", sort=False).head(k)
        out = pd.DataFrame(
            {
                "source": top["source"].to_numpy(),
                "rnk": top.groupby("source", sort=False)
                .cumcount()
                .to_numpy()
                .astype(np.int64)
                + 1,
                "doc_id": top["doc_id"].to_numpy(),
                "q_int": top["q_int"].to_numpy(),
            }
        )
        # arrow out + no pandas schema metadata (unhashable-schema warning)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    # pin: on an empty corpus the repartitioned block is empty and Ray
    # skips fin, so the surface would otherwise be schema-less
    return _pin_schema(
        quality_int_table(sf_dir)
        .map_batches(prune, batch_format="pandas")
        .repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None),
        pa.schema(
            [("source", pa.string()), ("rnk", pa.int64()),
             ("doc_id", pa.int64()), ("q_int", pa.int64())]
        ),
    )


# ------------------------------------------------------ lexical-shape stats
def doc_ttr(sf_dir: str) -> Dataset:
    """Type-token ratio per document: ``(doc_id, source, n_tokens,
    uniq_tokens, ttr)`` — the lexical-diversity column selection pipelines
    cut on (low TTR = template/repetitive text; the per-doc counterpart of
    ``repetition_scores``).  One streamed pass, the C-level exploded-token
    groupby shared with ``token_counts``; ttr = uniq/n is an exact-integer
    float division (same IEEE op as the SQL CAST/divide), 6dp-truncated.
    Oracle: ``oracle.DOC_TTR``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        _, n, ex = _exploded_tokens(df)
        uniq = ex.groupby(level=0).nunique().reindex(df.index).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "source": df["source"],
                "n_tokens": n,
                "uniq_tokens": uniq,
                "ttr": _trunc6(
                    uniq.astype("float64") / n.astype("float64")
                ),
            }
        )

    return _pin_schema(
        read_documents(
            sf_dir, ["doc_id", "source", "text"]
        ).map_batches(fn, batch_format="pandas"),
        pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()),
             ("n_tokens", pa.int64()), ("uniq_tokens", pa.int64()),
             ("ttr", pa.float64())]
        ),
    )


ZIPF_RANKS = 1000  # fit over the top-N vocabulary head


def zipf_slope(sf_dir: str) -> Dataset:
    """Zipf fit over the vocabulary head: least-squares slope/intercept of
    ln(count) on ln(rank) across the top ``ZIPF_RANKS`` tokens — one row
    ``(n_ranks, slope, intercept)``.  Natural text sits near slope −1;
    corpus-QA dashboards watch this to catch template floods and
    boilerplate-heavy crawls (which flatten or steepen the curve).

    Scale shape: per-batch distinct-token partials (vocabulary-sized, never
    token-stream-sized) through the standard grouped() merge, then
    :func:`~.agg.topk` prunes to blocks × N rows before the tiny global
    sort; the driver fits over ≤ N rows.  Rank order is the total order
    (cnt desc, tok asc) on both engines; the fit sums write the SAME
    float64 expression as ``oracle.ZIPF_SLOPE``, but numpy's pairwise
    summation and DuckDB's accumulation order can differ in final ulps —
    the shared 1e-6-boundary risk class every transcendental surface in
    this repo accepts (ln() here; cosine elsewhere), 6dp-truncated."""
    from .agg import topk

    # the head counts ARE the corpus unigram frequencies — reuse the
    # shared (and session-consistent) aggregation instead of a second
    # verbatim implementation
    counts = _unigram_counts(sf_dir).map_batches(
        lambda t: pa.table(
            {"tok": t.column("tok"), "cnt": t.column("sum_cnt")}
        ),
        batch_format="pyarrow",
    )
    head = topk(
        counts, ZIPF_RANKS, [("cnt", "descending"), ("tok", "ascending")]
    ).to_pandas()  # ≤ ZIPF_RANKS rows by construction
    n = np.float64(len(head))
    if n < 2:  # degenerate vocabulary: no fit (SQL NULL-division drop)
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "n_ranks": pd.Series([], dtype="int64"),
                    "slope": pd.Series([], dtype="float64"),
                    "intercept": pd.Series([], dtype="float64"),
                }
            )
        )
    rank = np.arange(1, len(head) + 1, dtype=np.float64)
    x = np.log(rank)
    y = np.log(head["cnt"].to_numpy().astype(np.float64))
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_ranks": np.array([len(head)], dtype=np.int64),
                "slope": np.floor(np.array([slope]) * 1e6) / 1e6,
                "intercept": np.floor(np.array([intercept]) * 1e6) / 1e6,
            }
        )
    )


# ------------------------------------------------- quality-weighted keeps
IMP_SALT = "imp:"  # independent of the split/stratified hash streams


def importance_sample(sf_dir: str) -> Dataset:
    """Quality-weighted downsampling: keep a document with probability
    q_int/1e6 — implemented as the deterministic gate ``hash_permille <
    q_int // 1000`` (salted md5 of the doc id, the repo's hash-gate
    convention) so the sample is identical on every run and cluster size,
    with no shuffle and no RNG state (the DoReMi-style "sample proportional
    to quality" ingredient, made reproducible).  ``(doc_id, source, q_int,
    hash_permille)`` for kept docs.  Reuses the session-memoized
    :func:`quality_int_table`; the salt differs from ``train_val_split``'s
    so sampling stays independent of split membership.  Oracle:
    ``oracle.IMPORTANCE_SAMPLE``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = _salted_permille(df["doc_id"], IMP_SALT)
        keep = h < (df["q_int"] // 1000)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "source": df["source"],
                "q_int": df["q_int"],
                "hash_permille": h,
            }
        )
        return out[keep.to_numpy()]

    # pin: the gate legitimately filters to EMPTY (every doc with
    # q_int < 1000 has keep-probability 0), and Ray drops the schema of
    # all-empty map outputs — without the pin the sorted surface would be
    # schema-less on that input instead of the documented 4 columns.
    return _pin_schema(
        quality_int_table(sf_dir)
        .map_batches(fn, batch_format="pandas")
        .sort(["doc_id"]),
        pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()),
             ("q_int", pa.int64()), ("hash_permille", pa.int64())]
        ),
    )


def eval_overlap_by_source(sf_dir: str) -> Dataset:
    """Contamination accounting per source: ``(source, n_docs,
    contaminated_docs, total_hits, contamination_rate)`` — which upstream
    feeds leak eval n-grams (the rollup a pipeline uses to drop or
    re-crawl a source, where :func:`decontaminate` flags individual docs).

    Scale shape: the eval gram set broadcasts once (``ray.put``), each
    batch collapses to per-source partial rows (sources-bounded), and the
    grouped() merge finishes — one streamed pass, no join (source rides
    the same scan).  The rate is one float division of exact ints,
    6dp-truncated (oracle.EVAL_OVERLAP_BY_SOURCE)."""
    from .agg import GroupSpec, final_empty, grouped

    grams_ref = ray.put(_eval_gram_set(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grams = resolve_eval_grams(grams_ref)
        df = df[df["doc_id"] >= DECON_EVAL_DOCS]
        hits = eval_gram_hits(df, grams)
        g = pd.DataFrame(
            {
                "source": df["source"].to_numpy(),
                "hits": hits.to_numpy().astype("int64"),
                "contam": (hits.to_numpy() > 0).astype("int64"),
            }
        ).groupby("source", sort=False)
        agg = g.agg(n=("hits", "size"), hits=("hits", "sum"), c=("contam", "sum"))
        return pd.DataFrame(
            {
                "source": agg.index.to_numpy(),
                "n": agg["n"].to_numpy().astype("int64"),
                "hits": agg["hits"].to_numpy().astype("int64"),
                "c": agg["c"].to_numpy().astype("int64"),
            }
        )


    spec = GroupSpec(keys=("source",), count=False, sum_cols=("n", "hits", "c"))
    g = grouped(
        read_documents(sf_dir, ["doc_id", "source", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        spec,
        empty=final_empty(
            spec,
            {"source": pa.string(), "n": pa.int64(), "hits": pa.int64(),
             "c": pa.int64()},
        ),
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        n = df["sum_n"].to_numpy().astype(np.float64)
        c = df["sum_c"].to_numpy().astype(np.float64)
        return pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": df["sum_n"].astype("int64"),
                "contaminated_docs": df["sum_c"].astype("int64"),
                "total_hits": df["sum_hits"].astype("int64"),
                "contamination_rate": np.floor((c / n) * 1e6) / 1e6,
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pandas").sort(["source"]),
        pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()),
             ("contaminated_docs", pa.int64()), ("total_hits", pa.int64()),
             ("contamination_rate", pa.float64())]
        ),
    )


QUALITY_PCTS = (10, 50, 90)


def quality_deciles_by_source(sf_dir: str) -> Dataset:
    """Exact per-source quality quantiles — ``(source, n_docs, p10, p50,
    p90)`` — the distribution report behind per-source budget and mixing
    decisions (``source_mixture`` weights, ``source_budget_allocation``
    cutoffs).  Same mergeable counting-histogram rule as
    ``size_percentiles`` (smallest q with cum·100 ≥ n·p) over the
    session-memoized q_int table; the exchange moves sources ×
    distinct-q_int rows (≤1e6 levels per source by construction — value-
    range bounded), one task reads the quantiles off the cumulative
    counts.  Reported as quality floats (q_int / 1e6 — the same division
    on both engines).  Oracle: ``oracle.QUALITY_DECILES_BY_SOURCE``."""
    from .agg import GroupSpec, final_empty, grouped


    spec = GroupSpec(keys=("source", "q_int"))
    g = grouped(
        quality_int_table(sf_dir),
        spec,
        empty=final_empty(
            spec, {"source": pa.string(), "q_int": pa.int64()}
        ),
    )

    def fin(df: pd.DataFrame) -> "pa.Table":
    
        if not len(df):  # dtype-stable empty result
            return pa.schema(
                [("source", pa.string()), ("n_docs", pa.int64())]
                + [(f"p{p}", pa.float64()) for p in QUALITY_PCTS]
            ).empty_table()
        rows = []
        for src, sub in df.sort_values(["source", "q_int"]).groupby(
            "source", sort=True
        ):
            cum = sub["cnt"].to_numpy().cumsum()
            q = sub["q_int"].to_numpy()
            n = int(cum[-1])
            row = {"source": src, "n_docs": np.int64(n)}
            for p in QUALITY_PCTS:
                idx = int(np.searchsorted(cum * 100, n * p, side="left"))
                row[f"p{p}"] = q[idx] / 1000000.0
            rows.append(row)
        out = pd.DataFrame(
            rows,
            columns=["source", "n_docs"] + [f"p{p}" for p in QUALITY_PCTS],
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return _pin_schema(
        g.repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None),
        pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64())]
            + [(f"p{p}", pa.float64()) for p in QUALITY_PCTS]
        ),
    )


# ------------------------------------------------------------ bigram PMI
PMI_HEAD = 200  # PMI is scored over the top-M bigrams by count
PMI_TOPK = 50


def bigram_pmi(sf_dir: str) -> Dataset:
    """Collocation mining: the ``PMI_TOPK`` strongest bigrams by pointwise
    mutual information among the ``PMI_HEAD`` most frequent bigrams —
    ``(ngram, cnt, score)`` where ``score`` is the EXACT integer-scaled
    PMI ratio ``(c_xy * N_uni^2 * 1e6) // (N_bi * c_x * c_y)`` (the inside
    of the log; monotone in PMI, so the ranking is the PMI ranking).  The
    all-integer score sidesteps cross-engine ``log``/division ulps
    entirely — the same reason the repo's averages floor scaled integers.

    Scale shape: unigram and bigram counts are both vocabulary-sized
    DISTRIBUTED grouped() tables, produced from ONE corpus scan — the
    per-batch partial emits both families under a ``kind`` discriminator
    (0 = unigram, 1 = bigram) through a single grouped() merge, so the
    documents table is read and tokenized once, not twice.  Only the
    ``PMI_HEAD`` head — a CONSTANT — and the <= 2*PMI_HEAD unigram rows it
    references ever reach the driver, the same bounded-head contract as
    ``tfidf_topk``'s df-floor.  Oracle: ``oracle.BIGRAM_PMI``."""
    import pyarrow.compute as pc

    from .agg import GroupSpec, final_empty, grouped, topk

    cnt_schema = pa.schema(
        [("kind", pa.int64()), ("key", pa.string()), ("cnt", pa.int64())]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return cnt_schema.empty_table()
        toks = df["text"].str.split(" ")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = toks.explode().to_numpy()
        u = pd.Series(flat)
        ua = u.groupby(u, sort=False).size()
        kinds = [np.zeros(len(ua), np.int64)]
        keys = [ua.index.to_numpy()]
        cnts = [ua.to_numpy().astype(np.int64)]
        if len(flat) >= 2:
            doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), lens)
            valid = doc_idx[:-1] == doc_idx[1:]
            grams = flat[:-1][valid] + " " + flat[1:][valid]
            if len(grams):
                g = pd.Series(grams)
                ga = g.groupby(g, sort=False).size()
                kinds.append(np.ones(len(ga), np.int64))
                keys.append(ga.index.to_numpy())
                cnts.append(ga.to_numpy().astype(np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds)),
                "key": pa.array(np.concatenate(keys), pa.string()),
                "cnt": pa.array(np.concatenate(cnts)),
            },
            schema=cnt_schema,
        )

    g = grouped(
        read_documents(sf_dir, ["text"]).map_batches(
            partial, batch_format="pandas"
        ),
        GroupSpec(keys=("kind", "key"), count=False, sum_cols=("cnt",)),
        empty=pa.schema(
            [("kind", pa.int64()), ("key", pa.string()),
             ("sum_cnt", pa.int64())]
        ).empty_table(),
    )  # merge outputs are object refs: the three consumptions below re-read
    # them, they do not re-run the scan

    def only(kind: int, key_name: str):
        def pick_kind(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("kind"), kind))
            return pa.table(
                {key_name: t.column("key"), "sum_cnt": t.column("sum_cnt")}
            )

        return g.map_batches(pick_kind, batch_format="pyarrow")

    uni = only(0, "token")
    bi = only(1, "ngram")
    pmi_schema = pa.schema(
        [("ngram", pa.string()), ("cnt", pa.int64()), ("score", pa.int64())]
    )
    n_uni = uni.sum("sum_cnt")  # exact int scalar tree-reduce
    n_bi = bi.sum("sum_cnt")
    if not n_bi:  # corpus of single-token documents: no bigrams at all
        return ray.data.from_arrow(pmi_schema.empty_table())
    head = topk(
        bi, PMI_HEAD, [("sum_cnt", "descending"), ("ngram", "ascending")]
    ).take_all()  # bounded: PMI_HEAD rows
    w1w2 = [r["ngram"].split(" ") for r in head]
    needed = sorted({w for pair in w1w2 for w in pair})
    need_ref = ray.put(set(needed))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["token"].isin(ray.get(need_ref))
        return df[keep]

    ucnt = {
        r["token"]: int(r["sum_cnt"])
        for r in uni.map_batches(pick, batch_format="pandas").take_all()
    }  # bounded: <= 2*PMI_HEAD rows
    rows = []
    for r, (w1, w2) in zip(head, w1w2):
        cxy = int(r["sum_cnt"])
        score = (cxy * int(n_uni) * int(n_uni) * 1_000_000) // (
            int(n_bi) * ucnt[w1] * ucnt[w2]
        )  # exact arbitrary-precision int
        if score > (1 << 63) - 1:
            # fits int64 under Zipf-shaped heads, but an adversarial corpus
            # (huge n_uni, tiny head counts) can exceed it — fail loudly
            # rather than let pa.array raise a bare OverflowError
            raise RuntimeError(
                f"bigram_pmi: exact score for {r['ngram']!r} exceeds int64 "
                "(n_uni²·1e6 dwarfs the bigram's unigram counts) — the "
                "micro-scaled integer encoding needs a wider type here"
            )
        rows.append((r["ngram"], cxy, score))
    rows.sort(key=lambda t: (-t[2], t[0]))
    rows = rows[:PMI_TOPK]
    return ray.data.from_arrow(
        pa.table(
            {
                "ngram": pa.array([r[0] for r in rows], pa.string()),
                "cnt": pa.array([r[1] for r in rows], pa.int64()),
                "score": pa.array([r[2] for r in rows], pa.int64()),
            },
            schema=pmi_schema,
        )
    )
