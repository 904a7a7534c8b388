"""Hypothesis property tests for the round-5 operator families.

The fixed-corpus SQL oracles pin specific datasets; these pin the CONTRACT
on random inputs:

- value_percentiles: each reported pN is the smallest cent value whose
  cumulative count satisfies cum·100 ≥ n·p, per event_type.
- rolling_wau: each (window_start, wau) equals the distinct-user count of
  the 7-day window [start, start+6d] — checked against a set-based pandas
  reference.
- kmeans_assign: every vector is labeled with the centroid maximizing the
  6dp-floored cosine (ties to the smallest centroid id), self-pairs pinned
  to exactly 1.0.
- power_users: the kept set is exactly {user : n ≥ thr} where thr is the
  smallest count value with 20·cum ≥ 19·total over the count histogram.

Each example runs the real Ray pipeline over a tiny parquet corpus;
example counts are capped low (each is a full small distributed job).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EPOCH = pd.Timestamp("2024-01-01")

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # user_id
        st.integers(min_value=0, max_value=14 * 86_400),  # ts offset (s)
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(min_value=0, max_value=9999),  # cents
    ),
    min_size=1,
    max_size=40,
)


def _write_events(tmpdir, rows) -> str:
    ts = [_EPOCH + pd.Timedelta(seconds=s) for _, s, _, _ in rows]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([u for u, *_ in rows], pa.int64()),
                "event_type": pa.array([t for _, _, t, _ in rows]),
                "value": pa.array(
                    [c / 100.0 for *_, c in rows], pa.float64()
                ),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{tmpdir}/events.parquet",
    )
    return str(tmpdir)


def test_value_percentiles_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.events import (
        VALUE_PCTS,
        value_percentiles,
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_events)
    def check(rows):
        sf = _write_events(tmp_path_factory.mktemp("vp"), rows)
        got = value_percentiles(sf).to_pandas().set_index("event_type")
        df = pd.DataFrame(
            {"t": [r[2] for r in rows], "c": [r[3] for r in rows]}
        )
        for t, sub in df.groupby("t"):
            cents = np.sort(sub["c"].to_numpy())
            n = cents.size
            assert int(got.loc[t, "n_events"]) == n
            for p in VALUE_PCTS:
                # smallest value with cum*100 >= n*p  (cum = rank in sorted)
                want = cents[
                    int(np.searchsorted(np.arange(1, n + 1) * 100, n * p,
                                        side="left"))
                ] / 100.0
                assert got.loc[t, f"p{p}"] == want, (t, p)

    check()


def test_rolling_wau_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.events import rolling_wau

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_events)
    def check(rows):
        sf = _write_events(tmp_path_factory.mktemp("wau"), rows)
        got = rolling_wau(sf).to_pandas()
        days = pd.Series(
            [_EPOCH + pd.Timedelta(seconds=s) for _, s, _, _ in rows]
        ).dt.floor("D")
        users = pd.Series([u for u, *_ in rows])
        ref = {}
        for d in days.unique():
            for k in range(7):
                ref.setdefault(d - pd.Timedelta(days=k), set())
        for u, d in zip(users, days):
            for k in range(7):
                ref[d - pd.Timedelta(days=k)].add(u)
        want = sorted((w, len(s)) for w, s in ref.items())
        assert list(zip(got["window_start"], got["wau"])) == want

    check()


def test_power_users_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.events import power_users

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_events)
    def check(rows):
        sf = _write_events(tmp_path_factory.mktemp("pu"), rows)
        got = power_users(sf).to_pandas()
        counts = pd.Series([u for u, *_ in rows]).value_counts()
        hist = counts.value_counts().sort_index()
        cum = hist.cumsum()
        tot = int(cum.iloc[-1])
        thr = int(cum.index[np.flatnonzero(20 * cum.to_numpy()
                                           >= 19 * tot)[0]])
        want = counts[counts >= thr].sort_index()
        assert got["user_id"].tolist() == want.index.tolist()
        assert got["n_events"].tolist() == want.tolist()

    check()


_vecs = st.lists(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=4, max_size=4),
    min_size=8,
    max_size=24,
)


def _int_parallel(u, v) -> bool:
    """Exact integer parallelism test (cross-ratios equal): cos(u,v) = ±1.
    Such pairs sit ON the 1e-6 floor boundary (kernel ulps decide which
    side) — the shared risk class every cosine surface accepts, EXCEPT
    bitwise-equal vectors, which the engine pins to exactly 1.0."""
    n = len(u)
    return all(
        u[i] * v[j] == u[j] * v[i] for i in range(n) for j in range(i + 1, n)
    )


def test_kmeans_assign_hypothesis(tmp_path_factory):
    from oplog_analyzer_ray.pipelines.similarity import (
        KMEANS_K,
        kmeans_assign,
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(_vecs)
    def check(vec_rows):
        m = np.array(vec_rows, dtype=np.float64)
        m[np.linalg.norm(m, axis=1) == 0] = [1.0, 0.0, 0.0, 0.0]
        # PARALLEL-but-unequal (vec, seed) pairs sit exactly on the floor
        # boundary — out of contract (see _int_parallel); duplicates of a
        # seed stay in (the engine pins them to 1.0)
        for i in range(len(m)):
            for s in range(min(KMEANS_K, len(m))):
                if i != s and _int_parallel(m[i], m[s]) and not np.array_equal(
                    m[i], m[s]
                ):
                    m[i] = m[s]  # collapse to the exact-duplicate case
        tmp = tmp_path_factory.mktemp("km")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(m)), pa.int64()),
                    "embedding": pa.array(
                        [row.astype(np.float32) for row in m],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * len(m), pa.int32()),
                }
            ),
            f"{tmp}/embeddings.parquet",
        )
        got = kmeans_assign(str(tmp)).to_pandas()
        mm = m.astype(np.float32).astype(np.float64)  # stored precision
        mn = mm / np.linalg.norm(mm, axis=1, keepdims=True)
        cn = mn[:KMEANS_K]
        cos = np.floor((mn @ cn.T) * 1e6) / 1e6
        for col in range(cn.shape[0]):
            cos[np.all(mm == mm[col], axis=1), col] = 1.0
        j = np.argmax(cos, axis=1)
        assert got["cluster"].tolist() == j.tolist()
        assert got["cos"].tolist() == cos[np.arange(len(mm)), j].tolist()

    check()
