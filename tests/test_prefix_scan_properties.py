"""Hypothesis property tests for the distributed-prefix-scan family.

pack_sequences and quality_budget_selection are window-function-equivalent
operators whose fixed fixtures + SQL oracles pin specific corpora; these
tests pin the CONTRACT itself on random inputs — the invariants a window
function must satisfy regardless of data shape:

- pack_sequences: seq_off ∈ [0, PACK_SEQ_TOKENS); (seq_id, seq_off) equals
  the exclusive running token total in doc_id order; n_tokens matches the
  single-space token convention.
- quality_budget_selection: the kept token total never exceeds the budget;
  the keep-set is PREFIX-CLOSED in (q_int DESC, doc_id ASC) order (a doc is
  kept iff every doc ranked strictly ahead of it is kept, plus the budget
  gate); cum_excl is the exact exclusive prefix in that order.

Each example writes a tiny corpus and runs the real Ray pipeline — examples
are capped low because each run is a full (small) distributed job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# distinct doc_ids with arbitrary gaps (footer-stats range partitioning must
# not assume density), texts from a tiny alphabet so token counts, repeats
# and quality components all vary
_token = st.text(alphabet="ab.", min_size=0, max_size=4)
_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), _text),
    min_size=1,
    max_size=16,
    unique_by=lambda dt: dt[0],
)


def _write_docs(tmpdir, docs) -> str:
    ids = [d for d, _ in docs]
    txt = [t for _, t in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(["en"] * len(ids)),
                "text": pa.array(txt, pa.string()),
            }
        ),
        f"{tmpdir}/documents.parquet",
    )
    return str(tmpdir)


def test_pack_sequences_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.text import PACK_SEQ_TOKENS, pack_sequences

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_corpus)
    def check(docs):
        sf = _write_docs(tmp_path_factory.mktemp("pack"), docs)
        got = pack_sequences(sf).to_pandas()
        # reference: exclusive running total in doc_id order, single-space
        # token convention (count(' ') + 1, empty text = 1 token)
        ref = pd.DataFrame(
            {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
        ).sort_values("doc_id")
        n = (ref["text"].str.count(" ") + 1).astype("int64").to_numpy()
        cum_excl = np.concatenate([[0], n[:-1].cumsum()])
        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        assert got["n_tokens"].to_numpy().tolist() == n.tolist()
        assert (got["seq_off"].to_numpy() >= 0).all()
        assert (got["seq_off"].to_numpy() < PACK_SEQ_TOKENS).all()
        assert (
            got["seq_id"].to_numpy() == cum_excl // PACK_SEQ_TOKENS
        ).all()
        assert (
            got["seq_off"].to_numpy() == cum_excl % PACK_SEQ_TOKENS
        ).all()

    check()


def test_quality_budget_selection_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.text import (
        SELECT_BUDGET_PERMILLE,
        quality_budget_selection,
        quality_components,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_corpus)
    def check(docs):
        sf = _write_docs(tmp_path_factory.mktemp("budget"), docs)
        got = quality_budget_selection(sf).to_pandas()

        # reference selection: (q_int DESC, doc_id ASC) greedy under budget
        df = pd.DataFrame(
            {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
        )
        q_int = np.floor(
            quality_components(df)["quality"].to_numpy() * 1e6
        ).astype("int64")
        n = (df["text"].str.count(" ") + 1).astype("int64").to_numpy()
        ref = (
            pd.DataFrame(
                {"doc_id": df["doc_id"], "q_int": q_int, "n_tokens": n}
            )
            .sort_values(["q_int", "doc_id"], ascending=[False, True])
            .reset_index(drop=True)
        )
        total = int(n.sum())
        budget = total * SELECT_BUDGET_PERMILLE // 1000
        cum_excl = np.concatenate(
            [[0], ref["n_tokens"].to_numpy()[:-1].cumsum()]
        )
        keep = cum_excl < budget
        want = ref[keep].assign(cum_excl=cum_excl[keep]).sort_values("doc_id")

        # exact equality with the reference (covers budget-never-exceeded
        # and exclusive-prefix correctness)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["q_int"].tolist() == want["q_int"].tolist()
        assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
        assert got["cum_excl"].tolist() == want["cum_excl"].tolist()
        # prefix-closedness in (q DESC, doc_id) order: the kept flags are a
        # True-prefix of the ranked ordering
        kept_ranked = keep.tolist()
        assert kept_ranked == sorted(kept_ranked, reverse=True)

    check()


def test_source_budget_allocation_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.text import (
        SELECT_BUDGET_PERMILLE,
        quality_components,
        source_budget_allocation,
    )

    corpus_src = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            _text,
            st.sampled_from(["s0", "s1", "s2"]),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda dts: dts[0],
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(corpus_src)
    def check(docs):
        tmpdir = tmp_path_factory.mktemp("srcbudget")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
                    "lang": pa.array(["en"] * len(docs)),
                    "text": pa.array([t for _, t, _ in docs], pa.string()),
                    "source": pa.array([s for _, _, s in docs], pa.string()),
                }
            ),
            f"{tmpdir}/documents.parquet",
        )
        res = source_budget_allocation(str(tmpdir))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res

        # independent reference: per-source greedy (q DESC, doc_id ASC)
        # keep while the EXCLUSIVE prefix stays under the per-source budget
        df = pd.DataFrame(
            {
                "doc_id": [d for d, _, _ in docs],
                "text": [t for _, t, _ in docs],
                "source": [s for _, _, s in docs],
            }
        )
        df["q_int"] = np.floor(
            quality_components(df)["quality"].to_numpy() * 1e6
        ).astype("int64")
        df["n_tokens"] = (df["text"].str.count(" ") + 1).astype("int64")
        total = int(df["n_tokens"].sum())
        budget = (total * SELECT_BUDGET_PERMILLE // 1000) // df[
            "source"
        ].nunique()
        ref = df.sort_values(
            ["source", "q_int", "doc_id"], ascending=[True, False, True]
        )
        ref["cum_excl"] = (
            ref.groupby("source")["n_tokens"].cumsum() - ref["n_tokens"]
        )
        ref = (
            ref[ref["cum_excl"] < budget][
                ["doc_id", "source", "q_int", "n_tokens", "cum_excl"]
            ]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True).astype({"cum_excl": "int64"}),
            ref.astype({"cum_excl": "int64"}),
        )

    check()
