"""Hypothesis property tests for the round-5 final operator additions.

Contract pins on random inputs (the fixed-corpus SQL oracles pin specific
datasets):

- substring_dedup: output equals a naive per-doc window enumeration —
  every 5-token window shared by >= 2 distinct docs, with exact
  occurrence counts and min/max doc ids.
- event_transitions: output equals a pandas sort+shift reference over the
  same (user_id, ts, event_id) total order.
- bigram_pmi: scores equal the exact integer formula over Counter-based
  unigram/bigram counts; head truncation and final ordering match.
- user_churn / bounce_rate: set-based pandas references.

Each example runs the real Ray pipeline over a tiny parquet corpus;
example counts are capped low (each is a full small distributed job).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EPOCH = pd.Timestamp("2024-01-01")

_VOCAB = ["aa", "bb", "cc"]  # tiny vocabulary forces window collisions

_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=14),
    min_size=2,
    max_size=16,
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # user_id
        st.integers(min_value=0, max_value=10 * 86_400),  # ts offset (s)
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=40,
)


def _write_docs(tmpdir, docs) -> str:
    texts = [" ".join(d) for d in docs]
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


def _write_events(tmpdir, rows) -> str:
    ts = [_EPOCH + pd.Timedelta(seconds=s) for _, s, _ in rows]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([u for u, *_ in rows], pa.int64()),
                "event_type": pa.array([t for _, _, t in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{tmpdir}/events.parquet",
    )
    return str(tmpdir)


def test_substring_dedup_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.dedup import (
        SUBSTR_WINDOW,
        substring_dedup,
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_docs)
    def check(docs):
        sf = _write_docs(tmp_path_factory.mktemp("sub"), docs)
        got = substring_dedup(sf).to_pandas()
        occ: list[tuple[str, int]] = []
        for i, d in enumerate(docs):
            for j in range(len(d) - SUBSTR_WINDOW + 1):
                w = " ".join(d[j : j + SUBSTR_WINDOW])
                occ.append((hashlib.md5(w.encode()).hexdigest(), i))
        ref = pd.DataFrame(occ, columns=["whash", "doc_id"])
        rows = []
        for h, sub in ref.groupby("whash"):
            if sub["doc_id"].nunique() >= 2:
                rows.append(
                    (h, sub["doc_id"].nunique(), len(sub),
                     sub["doc_id"].min(), sub["doc_id"].max())
                )
        rows.sort()
        assert [tuple(r) for r in got.itertuples(index=False)] == rows

    check()


def test_bigram_pmi_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.text import (
        PMI_HEAD,
        PMI_TOPK,
        bigram_pmi,
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_docs)
    def check(docs):
        sf = _write_docs(tmp_path_factory.mktemp("pmi"), docs)
        got = bigram_pmi(sf).to_pandas()
        uni: Counter = Counter()
        bi: Counter = Counter()
        for d in docs:
            uni.update(d)
            bi.update(" ".join(p) for p in zip(d, d[1:]))
        nu, nb = sum(uni.values()), sum(bi.values())
        head = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:PMI_HEAD]
        rows = []
        for g, cxy in head:
            w1, w2 = g.split(" ")
            rows.append(
                (g, cxy, (cxy * nu * nu * 1_000_000) // (nb * uni[w1] * uni[w2]))
            )
        rows.sort(key=lambda t: (-t[2], t[0]))
        rows = rows[:PMI_TOPK]
        assert [tuple(r) for r in got.itertuples(index=False)] == rows

    check()


def test_event_transitions_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.events import event_transitions

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_events)
    def check(rows):
        sf = _write_events(tmp_path_factory.mktemp("tr"), rows)
        got = event_transitions(sf).to_pandas()
        df = pd.DataFrame(
            {
                "user_id": [u for u, *_ in rows],
                "ts": [s for _, s, _ in rows],
                "event_id": range(len(rows)),
                "t": [t for _, _, t in rows],
            }
        ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        et = df["t"].to_numpy()
        ref = sorted(
            Counter(zip(et[:-1][same], et[1:][same])).items()
        )
        assert [
            ((a, b), c) for a, b, c in got.itertuples(index=False)
        ] == ref

    check()


def test_user_churn_bounce_rate_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.events import (
        CHURN_DAYS,
        SESSION_GAP_S,
        bounce_rate,
        user_churn,
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_events)
    def check(rows):
        sf = _write_events(tmp_path_factory.mktemp("cb"), rows)
        df = pd.DataFrame(
            {
                "user_id": [u for u, *_ in rows],
                "s": [s for _, s, _ in rows],
            }
        )
        # churn: whole-day inactivity vs the global max second offset
        got = user_churn(sf).to_pandas()
        mx = df["s"].max()
        last = df.groupby("user_id")["s"].max()
        days = (mx - last) // 86_400
        want = days[days >= CHURN_DAYS].sort_index()
        if len(want) == 0:
            # Dataset.to_pandas drops columns at 0 rows; the dataset schema
            # itself stays typed (user_id/last_ts/days_inactive)
            assert len(got) == 0
        else:
            assert got["user_id"].tolist() == want.index.tolist()
            assert got["days_inactive"].tolist() == want.tolist()
        # bounce: single-event sessions by start day (gap rule re-derived)
        got_b = bounce_rate(sf).to_pandas()
        ref: dict[pd.Timestamp, list[int]] = {}
        for _, sub in df.groupby("user_id"):
            ss = np.sort(sub["s"].to_numpy())
            starts = [0] + [
                i for i in range(1, len(ss)) if ss[i] - ss[i - 1] > SESSION_GAP_S
            ]
            bounds = starts + [len(ss)]
            for a, b in zip(bounds, bounds[1:]):
                day = (_EPOCH + pd.Timedelta(seconds=int(ss[a]))).floor("D")
                ref.setdefault(day, [0, 0])
                ref[day][0] += 1
                ref[day][1] += int(b - a == 1)
        want_b = sorted((d, n, x) for d, (n, x) in ref.items())
        assert [
            tuple(r) for r in got_b.itertuples(index=False)
        ] == want_b

    check()
