"""Streaming-style operators over the ``events`` table.

The reference's streaming surface is a single running window with periodic
reports (SURVEY.md §2.10); these grafts add the two window shapes a batch
log engine actually needs:

- ``sessionization``: gap-based sessions per user (custom operator — Ray
  Data has no native session window).  Implemented as a bucketed exchange
  on user hash + a vectorized within-bucket pandas pass (sort by (user, ts),
  ``shift``/``cumsum`` for boundaries).  The bucket count scales with the
  input (parquet-footer row count / SESSION_ROWS_PER_BUCKET) and with the
  cluster width, so a bucket task holds a bounded slice of the corpus at
  any scale; results are bucket-count invariant (property-tested).  The
  irreducible partitioning assumption is that ONE user's events fit one
  task — inherent to gap-session semantics (salt by time-range if a single
  user ever exceeds a worker's heap).
- ``tumbling_window``: fixed 1-day windows per event_type via the
  partial-preaggregated grouped() pipeline (window key is just a derived
  column — no special operator needed).

Both have exact DuckDB oracles (window functions / date_trunc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from .agg import GroupSpec, final_empty, grouped


from .agg import pin_schema as _pin_schema  # shared schema pin

SESSION_GAP_S = 7200  # new session when idle > 2h
SESSION_ROWS_PER_BUCKET = 500_000  # per-task slice ceiling


def events_path(sf_dir: str) -> str:
    """The events corpus: single file or ``events/`` directory (shared
    layout contract — see :mod:`.corpus`)."""
    from .corpus import corpus_path

    return corpus_path(sf_dir, "events")


def read_events(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    """Column-pruned events scan; ~2 blocks per CPU so a single-file corpus
    doesn't serialize the pre-shuffle stages onto one core.  Metadata-free
    scan schema (see corpus.clean_read_schema)."""
    from .agg import dyn_buckets
    from .corpus import clean_read_schema

    return ray.data.read_parquet(
        events_path(sf_dir),
        columns=columns,
        schema=clean_read_schema(sf_dir, "events", columns),
        override_num_blocks=dyn_buckets(16),
    )


def _events_rows(sf_dir: str) -> int:
    """Input size from the parquet footers (summed across however many
    files the corpus spans) — no data scan."""
    from .corpus import corpus_rows

    return corpus_rows(sf_dir, "events")


def _cluster_cpus() -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return 8


def session_buckets(sf_dir: str) -> int:
    """Bucket count ∝ input size (bounded per-task memory) with a
    cluster-width floor (enough tasks to keep every core busy)."""
    by_rows = -(-_events_rows(sf_dir) // SESSION_ROWS_PER_BUCKET)
    return max(2 * _cluster_cpus(), by_rows)


# KMV sketch size: small enough that the under-k exact branch is exercised
# at sf0.001 (15 users) while the sketch branch fires from sf0.01 up (150+)
KMV_K = 64
_KMV_MASK = (1 << 63) - 1  # 63-bit hash space: BIGINT-safe on both engines


# on-disk events size below which the per-user exchange materializes and
# uses the task-based hash exchange (agg.hash_bucket_apply) instead of
# Ray's sort-based groupby — each avoided sort stage is ~2.8 s of pure
# machinery at small scale; above the cap the streamed sort path is the
# right plan (no corpus-sized materialization)
from .agg import EXCHANGE_GATE_MAX_BYTES as EVENTS_EXCHANGE_MAX_BYTES


def _user_bucket_apply(sf_dir: str, ds: Dataset, fn, buckets: int) -> Dataset:
    """Co-locate rows by hash(user_id) and run the pandas per-bucket
    function ``fn`` with every user's rows complete — the shared exchange
    of sessionization / funnel / retention / purchase_attribution (one
    definition so bucketing semantics cannot drift).  ``fn`` must handle an
    empty frame and return dtype-stable columns (schemas are unified
    across buckets downstream)."""
    from .agg import hash_bucket_apply
    from .corpus import corpus_bytes

    def wrap(t: pa.Table) -> pa.Table:
        out = fn(t.to_pandas())
        # drop the from_pandas schema metadata: pa.Schema with metadata is
        # UNHASHABLE (hash → "unhashable type: 'dict'"), and Ray's sort
        # reduce warns on every block when schema dedup can't hash
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return hash_bucket_apply(
        ds,
        ("user_id",),
        wrap,
        buckets,
        use_exchange=corpus_bytes(sf_dir, "events") <= EVENTS_EXCHANGE_MAX_BYTES,
    )


def _kmv_hashes(uniq) -> "np.ndarray":
    """Sorted distinct 63-bit md5 hashes of the given ids — the KMV hash
    function, defined once so both sketch variants stay mergeable."""
    import hashlib

    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
            & _KMV_MASK
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return np.unique(hs)


def sessionization(sf_dir: str, n_buckets: int | None = None) -> Dataset:
    """Per-user gap sessions: (user_id, session_id, n_events, start_ts,
    end_ts, sum_value) with session_id dense from 0 per user.

    Session-memoized under the shared chain-cache byte gate (streams above
    it) — session_stats and session_duration_percentiles consume the same
    table, so a sweep pays the bucketed exchange ONCE, not per consumer.
    An explicit ``n_buckets`` (the invariance tests) bypasses the cache."""
    from .corpus import corpus_bytes
    from .dedup import _chain_cached

    if n_buckets is None:
        return _chain_cached(
            sf_dir,
            "sessions",
            lambda: _sessionization_uncached(sf_dir, None),
            nbytes=corpus_bytes(sf_dir, "events"),
        )
    return _sessionization_uncached(sf_dir, n_buckets)


def _sessionization_uncached(sf_dir: str, n_buckets: int | None) -> Dataset:
    buckets = n_buckets or session_buckets(sf_dir)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty bucket: dtype-stable empty result
            return pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "session_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "start_ts": df["ts"],
                    "end_ts": df["ts"],
                    "sum_value": pd.Series([], dtype="float64"),
                }
            )
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        # sum in integer cents: order-independent and bit-identical to the
        # SQL SUM(CAST(round(value*100) AS BIGINT))/100.0 (values are
        # 2-decimal; float summation order differs between engines)
        cents = (df["value"] * 100).round().astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = (df["ts"] - df["ts"].shift()).dt.total_seconds()
        new_sess = new_user | (gap > SESSION_GAP_S)
        sess_seq = new_sess.cumsum()
        g = df.groupby(sess_seq, sort=False)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].first(),
                "n_events": g.size().astype("int64"),
                "start_ts": g["ts"].min(),
                "end_ts": g["ts"].max(),
                "sum_value": cents.groupby(sess_seq, sort=False).sum() / 100.0,
            }
        ).reset_index(drop=True)
        out["session_id"] = out.groupby("user_id", sort=False).cumcount()
        return out[
            ["user_id", "session_id", "n_events", "start_ts", "end_ts", "sum_value"]
        ]

    ev = read_events(sf_dir, ["user_id", "ts", "value"])
    return _pin_schema(
        _user_bucket_apply(sf_dir, ev, sessions, buckets).sort(
            ["user_id", "session_id"]
        ),
        pa.schema(
            [("user_id", pa.int64()), ("session_id", pa.int64()),
             ("n_events", pa.int64()), ("start_ts", pa.timestamp("us")),
             ("end_ts", pa.timestamp("us")), ("sum_value", pa.float64())]
        ),
    )


def purchase_attribution(sf_dir: str, n_buckets: int | None = None) -> Dataset:
    """AS-OF JOIN (custom operator — Ray Data has none): each ``purchase``
    event is attributed to the same user's most recent ``click`` at or
    before the purchase timestamp; purchases with no prior click keep
    nulls (left as-of semantics).

    Implementation: both sides filter at the scan, hash-bucket on user_id
    (one exchange of only the two event types involved), then a vectorized
    C-level ``pandas.merge_asof(by=user_id, on=ts, direction=backward)``
    per bucket.  The partitioning assumption (one user's events fit one
    task) matches sessionization's and is the standard as-of shape.  The
    DuckDB oracle is a native ``ASOF LEFT JOIN``."""
    buckets = n_buckets or session_buckets(sf_dir)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(("purchase", "click"))]

    # one column order for BOTH branches (the pinned schema's): empty and
    # non-empty buckets must emit identically-ordered arrow blocks, or the
    # streaming executor sees mismatched RefBundle schemas (merge_asof
    # appends the right side as (click_ts, click_event_id))
    cols = ["event_id", "user_id", "ts", "value",
            "click_event_id", "click_ts", "gap_us"]

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty bucket: dtype-stable empty result
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": df["ts"],
                    "value": pd.Series([], dtype="float64"),
                    "click_event_id": pd.Series([], dtype="int64"),
                    "click_ts": df["ts"],
                    "gap_us": pd.Series([], dtype="int64"),
                }
            )[cols]
        p = (
            df[df["event_type"] == "purchase"]
            .sort_values("ts", kind="mergesort")
            .reset_index(drop=True)
        )
        # canonicalize same-timestamp clicks BEFORE the as-of join: keep the
        # max event_id per (user_id, ts).  pandas merge_asof picks the LAST
        # equal-ts duplicate while DuckDB's ASOF choice among ties is
        # contractually undefined — after this reduction (mirrored in the
        # oracle SQL) both engines attribute ties identically.
        c = (
            df[df["event_type"] == "click"]
            .groupby(["user_id", "ts"], as_index=False, sort=False)
            .agg(event_id=("event_id", "max"))
            .sort_values("ts", kind="mergesort")
            .reset_index(drop=True)
        )
        j = pd.merge_asof(
            p[["event_id", "user_id", "ts", "value"]],
            c[["user_id", "ts", "event_id"]].rename(
                columns={"ts": "click_ts", "event_id": "click_event_id"}
            ),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        # unattributed purchases: -1 sentinel (the reference's unknown-size
        # idiom, TailCommand.java:176-181) — keeps the numeric columns
        # non-null int64, which the driver's dtype-sensitive hash needs
        j["click_event_id"] = j["click_event_id"].fillna(-1).astype("int64")
        gap = (j["ts"] - j["click_ts"]) // pd.Timedelta(microseconds=1)
        j["gap_us"] = gap.fillna(-1).astype("int64")
        return j[cols]

    ev = read_events(
        sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
    ).map_batches(pick, batch_format="pandas")
    return _pin_schema(
        _user_bucket_apply(sf_dir, ev, asof, buckets).sort(["event_id"]),
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us")), ("value", pa.float64()),
             ("click_event_id", pa.int64()),
             ("click_ts", pa.timestamp("us")), ("gap_us", pa.int64())]
        ),
    )


def tumbling_window(sf_dir: str) -> Dataset:
    """Per-(event_type, day) tumbling-window counts and value sums."""

    def add_day(t: pa.Table) -> pa.Table:
        # integer-cents value so the partial/merge sums are order-independent
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                "cents": cents,
            }
        )

    ev = read_events(sf_dir, ["event_type", "ts", "value"]).map_batches(
        add_day, batch_format="pyarrow"
    )
    spec = GroupSpec(keys=("event_type", "day"), sum_cols=("cents",))
    g = grouped(
        ev,
        spec,
        empty=final_empty(
            spec,
            {"event_type": pa.string(), "day": pa.timestamp("us"),
             "cents": pa.int64()},
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": t.column("day"),
                "cnt": t.column("cnt"),
                "sum_value": pc.divide(
                    pc.cast(t.column("sum_cents"), pa.float64()), 100.0
                ),
            }
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")),
         ("cnt", pa.int64()), ("sum_value", pa.float64())]
    )
    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["event_type", "day"]
        ),
        out_schema,
    )


SLIDE_WINDOW_DAYS = 7
SLIDE_STEP_DAYS = 1


def sliding_window(sf_dir: str) -> Dataset:
    """7-day windows sliding by 1 day per event_type: each event lands in
    exactly WINDOW/STEP windows, materialized by a vectorized 7-way
    replicate (concat of day-shifted copies) — no per-row loop, no custom
    window operator needed; the aggregation is the standard grouped()
    partial-merge over the derived (event_type, window_start) key.
    Value sums run in integer cents (order-independent, bit-exact vs SQL).
    """

    def explode(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        base = pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "cents": cents,
            }
        )
        parts = []
        for k in range(SLIDE_WINDOW_DAYS // SLIDE_STEP_DAYS):
            shift = pa.scalar(
                k * SLIDE_STEP_DAYS * 86_400_000_000, pa.duration("us")
            )
            parts.append(
                pa.table(
                    {
                        "event_type": base.column("event_type"),
                        "window_start": pc.subtract(base.column("day"), shift),
                        "cents": base.column("cents"),
                    }
                )
            )
        return pa.concat_tables(parts)

    ev = read_events(sf_dir, ["event_type", "ts", "value"]).map_batches(
        explode, batch_format="pyarrow"
    )
    spec = GroupSpec(keys=("event_type", "window_start"), sum_cols=("cents",))
    g = grouped(
        ev,
        spec,
        empty=final_empty(
            spec,
            {"event_type": pa.string(), "window_start": pa.timestamp("us"),
             "cents": pa.int64()},
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": t.column("window_start"),
                "cnt": t.column("cnt"),
                "sum_value": pc.divide(
                    pc.cast(t.column("sum_cents"), pa.float64()), 100.0
                ),
            }
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("window_start", pa.timestamp("us")),
         ("cnt", pa.int64()), ("sum_value", pa.float64())]
    )
    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["event_type", "window_start"]
        ),
        out_schema,
    )


# ordered funnel stages (first-touch; each stage strictly after the prior)
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(sf_dir: str, n_buckets: int | None = None) -> Dataset:
    """Ordered first-touch funnel (custom operator — Ray Data has no funnel
    primitive): a user reaches stage k when they have a ``FUNNEL_STEPS[k]``
    event STRICTLY after their stage-(k-1) reach time.  Returns one row per
    stage: ``(stage, event_type, users, conv_from_first)``.

    Scale shape: the same user-hash bucketed exchange as sessionization
    (one user's events fit one task — the irreducible funnel partitioning
    assumption); within a bucket the per-stage reach times are vectorized
    groupby-mins + reindex filters, and each bucket collapses to ONE row
    per stage, so the final merge moves buckets × stages rows.  Conversion
    ratios are int/int divisions on the tiny final table (bit-exact vs the
    SQL oracle)."""

    buckets = n_buckets or session_buckets(sf_dir)

    def reach(df: pd.DataFrame) -> pd.DataFrame:
        t = None  # per-user reach time of the previous stage
        counts: list[int] = []
        for step in FUNNEL_STEPS:
            e = df[df["event_type"] == step]
            if t is not None:
                prev = t.reindex(e["user_id"]).to_numpy()
                e = e[pd.notna(prev) & (e["ts"].to_numpy() > prev)]
            t = e.groupby("user_id")["ts"].min()
            counts.append(len(t))
        return pd.DataFrame(
            {
                "stage": np.arange(1, len(FUNNEL_STEPS) + 1, dtype=np.int64),
                "event_type": list(FUNNEL_STEPS),
                "users": pd.array(counts, dtype="int64"),
            }
        )

    partial = _user_bucket_apply(
        sf_dir,
        read_events(sf_dir, ["user_id", "ts", "event_type"]),
        reach,
        buckets,
    )
    spec = GroupSpec(keys=("stage", "event_type"), count=False, sum_cols=("users",))
    g = grouped(
        partial,
        spec,
        empty=final_empty(
            spec,
            {"stage": pa.int64(), "event_type": pa.string(),
             "users": pa.int64()},
        ),
    )
    refs = g.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows] if refs else []
    merged: dict[int, int] = {}
    for t in tables:
        merged.update(
            zip(t.column("stage").to_pylist(), t.column("sum_users").to_pylist())
        )
    # always emit one row per stage (an empty or view-less corpus still has
    # a 3-row funnel of zeros — matches the oracle's UNION ALL shape)
    users = np.array(
        [int(merged.get(i + 1, 0)) for i in range(len(FUNNEL_STEPS))],
        dtype=np.int64,
    )
    u1 = int(users[0])
    conv = (
        np.floor((users / float(u1)) * 1e6) / 1e6
        if u1
        else np.zeros(len(users), dtype=np.float64)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "stage": pa.array(
                    np.arange(1, len(FUNNEL_STEPS) + 1, dtype=np.int64)
                ),
                "event_type": pa.array(list(FUNNEL_STEPS), pa.string()),
                "users": pa.array(users, pa.int64()),
                "conv_from_first": pa.array(conv, pa.float64()),
            }
        )
    )


# retention-cohort week arithmetic: integer micros since the corpus anchor,
# floor-divided into 7-day weeks — identical integer math in the SQL oracle
# (date_trunc('week') would drag in engine week-start conventions)
COHORT_ANCHOR_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch us
WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(sf_dir: str, n_buckets: int | None = None) -> Dataset:
    """Weekly retention-cohort table: ``(cohort_week, week_offset, users,
    retention)`` where ``cohort_week`` is the week of a user's first event,
    a user contributes to ``week_offset = activity_week - cohort_week``
    once per active week, and ``retention`` = users / cohort size (the
    offset-0 cell, always present).

    Scale shape: user-hash bucketed exchange (users whole per task, like
    sessionization/funnel), so within-bucket distinct-user counts per
    (cohort, offset) cell SUM to the global distinct count; each bucket
    collapses to at most weeks² cell rows, merged by :func:`~.agg.grouped`.
    The retention join runs on the tiny final cell table.  All week math
    is int64 (micros // WEEK_US), bit-exact vs the oracle."""
    buckets = n_buckets or session_buckets(sf_dir)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty bucket: dtype-stable empty result —
            # transform('min') dtype behavior on empty frames is a pandas
            # version detail the merge concat must not depend on
            return pd.DataFrame(
                {
                    "cohort_week": pd.Series([], dtype="int64"),
                    "week_offset": pd.Series([], dtype="int64"),
                    "users": pd.Series([], dtype="int64"),
                }
            )
        # pin the resolution before the int view: pandas may surface the
        # arrow timestamp as M8[us] or M8[ns] depending on version
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        wk = ((ts_us - COHORT_ANCHOR_US) // WEEK_US).astype("int64")
        first = wk.groupby(df["user_id"]).transform("min")
        cell = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "cohort_week": first,
                "week_offset": wk - first,
            }
        ).drop_duplicates()
        out = (
            cell.groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .rename("users")
            .reset_index()
        )
        out["users"] = out["users"].astype("int64")
        return out

    spec = GroupSpec(
        keys=("cohort_week", "week_offset"), count=False, sum_cols=("users",)
    )
    g = grouped(
        _user_bucket_apply(
            sf_dir, read_events(sf_dir, ["user_id", "ts"]), cells, buckets
        ),
        spec,
        empty=final_empty(
            spec,
            {"cohort_week": pa.int64(), "week_offset": pa.int64(),
             "users": pa.int64()},
        ),
    )

    # schema-less empties can ride along in the sort-fallback plan; the
    # typed empty= block guarantees at least one schema-ful table remains
    t = pa.concat_tables(
        [b for b in ray.get(g.to_arrow_refs()) if b.num_columns]
    )
    df = t.to_pandas().sort_values(["cohort_week", "week_offset"])
    base = (
        df[df["week_offset"] == 0]
        .set_index("cohort_week")["sum_users"]
        .astype("int64")
    )
    users = df["sum_users"].astype("int64")
    denom = base.reindex(df["cohort_week"]).to_numpy(dtype="float64")

    retention = np.floor((users.to_numpy() / denom) * 1e6) / 1e6
    return ray.data.from_arrow(
        pa.table(
            {
                "cohort_week": pa.array(
                    df["cohort_week"].to_numpy(), pa.int64()
                ),
                "week_offset": pa.array(
                    df["week_offset"].to_numpy(), pa.int64()
                ),
                "users": pa.array(users.to_numpy(), pa.int64()),
                "retention": pa.array(retention, pa.float64()),
            }
        )
    )




def approx_distinct_users(sf_dir: str) -> Dataset:
    """Mergeable KMV (k-minimum-values) distinct-count sketch over
    ``user_id`` — the sketch pattern for cardinality at 100 TB, where exact
    COUNT(DISTINCT) is a full shuffle.  One row out: ``(k, n_seen,
    kth_hash, est_distinct)`` with ``est_distinct = (k-1)·2⁶³ //
    kth_hash`` (or the exact count when fewer than k distinct hashes
    exist).  Fully deterministic — md5-based hashing makes the estimate
    itself oracle-checkable, unlike HLL's float register math.

    Scale shape: each block emits only its k smallest DISTINCT user-id
    hashes (np.unique + partition), so the merge input is blocks × k tiny
    int rows; the final unique-sort-kth runs on that driver-side by design.
    The md5 loop is per DISTINCT user per block (the minhash oracle-parity
    pattern)."""

    def local_kmin(df: pd.DataFrame) -> pd.DataFrame:
        hs = _kmv_hashes(pd.unique(df["user_id"]))  # sorted ascending
        return pd.DataFrame({"hv": hs[:KMV_K]})

    parts = (
        read_events(sf_dir, ["user_id"])
        .map_batches(local_kmin, batch_format="pandas")
        .take_all()
    )  # bounded: blocks × k int64 rows — the sketch IS the small side
    hs = np.unique(np.array([r["hv"] for r in parts], dtype=np.int64))
    sel = hs[:KMV_K]
    n_seen = int(len(sel))
    kth = int(sel[-1]) if n_seen else 0
    if n_seen < KMV_K:
        est = n_seen
    else:
        est = ((KMV_K - 1) << 63) // kth  # exact int math, floor division
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([KMV_K], pa.int64()),
                "n_seen": pa.array([n_seen], pa.int64()),
                "kth_hash": pa.array([kth], pa.int64()),
                "est_distinct": pa.array([est], pa.int64()),
            }
        )
    )


def approx_distinct_users_by_type(sf_dir: str) -> Dataset:
    """Per-``event_type`` KMV distinct-user sketch — the MERGEABLE-sketch
    pattern run inside the dataset plane: each block emits its k smallest
    distinct user hashes PER TYPE, the ``groupby(event_type)`` exchange
    moves only types × blocks × k int rows (never user rows), and each
    group task finishes its own sketch.  Same deterministic estimate
    contract as :func:`approx_distinct_users` (oracle-exact, exact count
    below k)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in df.groupby("event_type", sort=False):
            hs = _kmv_hashes(pd.unique(g["user_id"]))[:KMV_K]
            outs.append(pd.DataFrame({"event_type": et, "hv": hs}))
        if not outs:
            # dtype="string", NOT str: an empty object column converts to a
            # NULL-typed arrow column, which poisons the sort/merge concat
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype="string"),
                 "hv": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(g["hv"].to_numpy())[:KMV_K]
        n = int(len(hs))
        kth = int(hs[-1]) if n else 0
        est = n if n < KMV_K else ((KMV_K - 1) << 63) // kth
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "k": pd.array([KMV_K], dtype="int64"),
                "n_seen": pd.array([n], dtype="int64"),
                "kth_hash": pd.array([kth], dtype="int64"),
                "est_distinct": pd.array([est], dtype="int64"),
            }
        )

    return _pin_schema(
        read_events(sf_dir, ["user_id", "event_type"])
        .map_batches(local, batch_format="pandas")
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
        .sort("event_type"),
        pa.schema(
            [("event_type", pa.string()), ("k", pa.int64()),
             ("n_seen", pa.int64()), ("kth_hash", pa.int64()),
             ("est_distinct", pa.int64())]
        ),
    )


def daily_active_users(sf_dir: str) -> Dataset:
    """Exact DAU: ``(day, dau, n_events)`` — the per-group COUNT(DISTINCT)
    primitive the windowed family lacks (``approx_distinct_users`` is the
    sketched counterpart; this is the exact path).

    Two-level grouped shape that holds at scale: level 1 collapses to one
    row per DISTINCT (day, user_id) via the standard partial merge — the
    exchange moves (day, user, cnt) int rows, bounded by users × days,
    never raw events; level 2 then counts rows (= distinct users) and sums
    the carried event counts per day.  Level-2 partials are exact because
    level 1's merge already guarantees global (day, user) uniqueness."""
    def add_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                "user_id": t.column("user_id"),
            }
        )

    l1 = GroupSpec(keys=("day", "user_id"))
    per_user = grouped(
        read_events(sf_dir, ["ts", "user_id"]).map_batches(
            add_day, batch_format="pyarrow"
        ),
        l1,
        empty=final_empty(
            l1, {"day": pa.timestamp("us"), "user_id": pa.int64()}
        ),
    )
    l2 = GroupSpec(keys=("day",), count=True, sum_cols=("cnt",))
    g = grouped(
        per_user,
        l2,
        empty=final_empty(l2, {"day": pa.timestamp("us"), "cnt": pa.int64()}),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": t.column("day"),
                "dau": t.column("cnt"),
                "n_events": t.column("sum_cnt"),
            }
        )

    out_schema = pa.schema(
        [("day", pa.timestamp("us")), ("dau", pa.int64()),
         ("n_events", pa.int64())]
    )
    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(["day"]), out_schema
    )


def props_value_stats(sf_dir: str) -> Dataset:
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column and aggregate per event_type — ``(event_type, cnt,
    sum_k, min_k, max_k)``.  The extraction is one vectorized
    ``pc.extract_regex`` kernel per batch (no per-row JSON parse; rows
    whose props carry no integer ``k`` drop out, mirroring SQL's NULL
    semantics), then the standard grouped partial merge."""
    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        ok = pc.is_valid(m)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "event_type": pc.filter(t.column("event_type"), ok),
                "k": pc.filter(k, ok),
            }
        )

    spec = GroupSpec(
        keys=("event_type",),
        sum_cols=("k",),
        min_cols=("k",),
        max_cols=("k",),
    )
    g = grouped(
        read_events(sf_dir, ["event_type", "props"]).map_batches(
            extract, batch_format="pyarrow"
        ),
        spec,
        empty=final_empty(
            spec, {"event_type": pa.string(), "k": pa.int64()}
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cnt": t.column("cnt"),
                "sum_k": t.column("sum_k"),
                "min_k": t.column("min_k"),
                "max_k": t.column("max_k"),
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(["event_type"]),
        pa.schema(
            [("event_type", pa.string()), ("cnt", pa.int64()),
             ("sum_k", pa.int64()), ("min_k", pa.int64()),
             ("max_k", pa.int64())]
        ),
    )


# ------------------------------------------------- co-occurrence / anomalies
_COOC_SCHEMA = pa.schema(
    [("type_a", pa.string()), ("type_b", pa.string()), ("n_users", pa.int64())]
)


def _cooc_group(t: pa.Table) -> pa.Table:
    """Partial pair counts within one user-hash bucket: the rows are one
    user's DISTINCT event types (upstream grouped() guarantees global
    (user, type) uniqueness), so an equi-self-merge on user_id + the
    ``type_a < type_b`` mask emits each unordered pair exactly once.  The
    merge is a C-level pandas hash join — no per-user Python loop; its
    output is bounded by users_in_bucket × K², K = distinct event types
    (single digits for any real log schema)."""
    if t.num_rows == 0:
        return _COOC_SCHEMA.empty_table()
    df = pd.DataFrame(
        {
            "user_id": t.column("user_id").to_pandas(),
            "et": t.column("event_type").to_pandas(),
        }
    )
    m = df.merge(df, on="user_id")
    m = m[m["et_x"] < m["et_y"]]
    if not len(m):
        return _COOC_SCHEMA.empty_table()
    vc = (
        m.groupby(["et_x", "et_y"], sort=False).size().reset_index(name="n")
    )
    return pa.table(
        {
            "type_a": pa.array(vc["et_x"], type=pa.string()),
            "type_b": pa.array(vc["et_y"], type=pa.string()),
            "n_users": pa.array(vc["n"].to_numpy().astype("int64")),
        },
        schema=_COOC_SCHEMA,
    )


def event_type_cooccurrence(sf_dir: str) -> Dataset:
    """Market-basket co-occurrence: for every unordered pair of event types,
    how many users emitted BOTH — ``(type_a, type_b, n_users)``.  The
    segment-overlap primitive behind "users who click also purchase".

    Scale shape: level 1 collapses raw events to DISTINCT (user_id,
    event_type) through the standard partial merge (exchange bounded at
    users × K rows, K = distinct types — never raw events); the user-hash
    bucket stage then self-joins each user's type set locally and emits
    per-bucket pair COUNTS, so the final grouped() merge sees buckets × K²
    tiny int rows.  Oracle: ``oracle.EVENT_TYPE_COOCCURRENCE`` (DISTINCT
    self-join)."""
    from .agg import hash_bucket_apply
    from .corpus import corpus_bytes

    l1 = GroupSpec(keys=("user_id", "event_type"))
    distinct = grouped(
        read_events(sf_dir, ["user_id", "event_type"]),
        l1,
        empty=final_empty(
            l1, {"user_id": pa.int64(), "event_type": pa.string()}
        ),
    )
    pairs = hash_bucket_apply(
        distinct,
        ("user_id",),
        _cooc_group,
        session_buckets(sf_dir),
        use_exchange=corpus_bytes(sf_dir, "events") <= EVENTS_EXCHANGE_MAX_BYTES,
        empty=_COOC_SCHEMA.empty_table(),
    )
    l2 = GroupSpec(keys=("type_a", "type_b"), count=False, sum_cols=("n_users",))
    g = grouped(
        pairs,
        l2,
        empty=final_empty(
            l2,
            {"type_a": pa.string(), "type_b": pa.string(),
             "n_users": pa.int64()},
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "type_a": t.column("type_a"),
                "type_b": t.column("type_b"),
                "n_users": t.column("sum_n_users"),
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["type_a", "type_b"]
        ),
        pa.schema(
            [("type_a", pa.string()), ("type_b", pa.string()),
             ("n_users", pa.int64())]
        ),
    )


def daily_anomalies(sf_dir: str) -> Dataset:
    """Volume-anomaly z-scores: per (event_type, day), the day's event count
    and its z-score against THAT type's daily distribution — ``(event_type,
    day, cnt, z)``; types with <2 days or zero variance drop out (SQL NULL
    semantics).  The ops-alerting rollup a log pipeline runs to surface
    traffic spikes/drops.

    Float parity is by identical IEEE expression tree on both engines:
    z = (cnt - s/n) / sqrt((ss - s*s/n) / (n - 1)) evaluated in float64
    from the exact integer day-count sums (s, ss, n), then 6dp-truncated
    — mirrored verbatim in ``oracle.DAILY_ANOMALIES``.  (ss stays exact in
    a double while per-(type,day) counts < 2^26 — far past any daily log
    volume this rollup targets; the grouped() int64 sums overflow first.)

    Scale shape: the only corpus-sized work is the grouped() partial merge
    down to (type, day) rows; the z finish runs per type over its day rows
    (bounded by the corpus timespan, not its volume)."""
    def add_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
            }
        )

    spec = GroupSpec(keys=("event_type", "day"))
    per_day = grouped(
        read_events(sf_dir, ["event_type", "ts"]).map_batches(
            add_day, batch_format="pyarrow"
        ),
        spec,
        empty=final_empty(
            spec, {"event_type": pa.string(), "day": pa.timestamp("us")}
        ),
    )

    def fin(df: pd.DataFrame) -> pa.Table:
        cnt = df["cnt"].to_numpy().astype(np.float64)
        n = np.float64(len(df))
        s = cnt.sum()
        ss = (cnt * cnt).sum()
        var_num = ss - s * s / n
        out = df[["event_type", "day", "cnt"]].copy()
        if len(df) < 2 or var_num <= 0:
            out = out.iloc[0:0]
            out["z"] = pd.Series([], dtype="float64")
        else:
            z = (cnt - s / n) / np.sqrt(var_num / (n - 1.0))
            out["z"] = np.floor(z * 1e6) / 1e6
        # arrow out + no pandas schema metadata (unhashable-schema warning)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    out_schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")),
         ("cnt", pa.int64()), ("z", pa.float64())]
    )
    return _pin_schema(
        per_day.groupby("event_type")
        .map_groups(fin, batch_format="pandas")
        .sort(["event_type", "day"]),
        out_schema,
    )


# ------------------------------------------------ activity / gap / path ops
def hourly_activity(sf_dir: str) -> Dataset:
    """Hour-of-day load profile: ``(event_type, hour, cnt, sum_value)`` —
    the capacity-planning rollup (when does each event type peak?).  Pure
    derived-column grouped() shape: hour is one vectorized temporal kernel,
    values sum in exact integer cents, the exchange moves types × 24 partial
    rows per block.  Oracle: ``oracle.HOURLY_ACTIVITY``."""
    def add_hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": pc.cast(pc.hour(t.column("ts")), pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    spec = GroupSpec(keys=("event_type", "hour"), sum_cols=("cents",))
    g = grouped(
        read_events(sf_dir, ["event_type", "ts", "value"]).map_batches(
            add_hour, batch_format="pyarrow"
        ),
        spec,
        empty=final_empty(
            spec,
            {"event_type": pa.string(), "hour": pa.int64(),
             "cents": pa.int64()},
        ),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": t.column("hour"),
                "cnt": t.column("cnt"),
                "sum_value": pc.divide(
                    pc.cast(t.column("sum_cents"), pa.float64()), 100.0
                ),
            }
        )

    out_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.int64()),
         ("cnt", pa.int64()), ("sum_value", pa.float64())]
    )
    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["event_type", "hour"]
        ),
        out_schema,
    )


# power-user quantile as an exact integer predicate: q = 0.95 = 19/20, so
# "cume_dist >= 0.95" is "20 * cum_users >= 19 * total_users" with no float
# division on either engine (quantile_disc's smallest-value-with-cume>=q
# rule, pinned boundary-exactly)
_POWER_Q_NUM, _POWER_Q_DEN = 19, 20


def power_users(sf_dir: str) -> Dataset:
    """Heavy-hitter users: ``(user_id, n_events)`` for every user at or
    above the exact p95 of per-user event counts.

    Scale shape: pass 1 collapses events to (user, count) through the
    standard grouped() merge; the threshold comes from a SECOND grouped()
    over the COUNT VALUES — a counting histogram bounded by distinct count
    magnitudes (≪ users; the driver materializes only that histogram, same
    discipline as ``size_percentiles``); pass 2 re-derives the per-user
    counts and filters.  No per-user driver state at any scale.  Oracle:
    ``oracle.POWER_USERS`` (identical integer threshold rule)."""
    per_user = GroupSpec(keys=("user_id",))
    counts = grouped(
        read_events(sf_dir, ["user_id"]),
        per_user,
        empty=final_empty(per_user, {"user_id": pa.int64()}),
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t.column("user_id"), "n_events": t.column("cnt")}
        ),
        batch_format="pyarrow",
    )
    out_schema = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())])
    # materialized ONCE: both the threshold histogram and the final filter
    # consume this (user, count) table — re-deriving it would pay a second
    # full corpus scan + grouped() merge (same two-consumer discipline as
    # user_churn's materialize)
    counts = _pin_schema(counts, out_schema).materialize()

    hspec = GroupSpec(keys=("n_events",))
    hist_ds = grouped(
        counts, hspec, empty=final_empty(hspec, {"n_events": pa.int64()})
    )
    # distinct count VALUES — magnitude-bounded, not users.  Arrow refs,
    # not Dataset.to_pandas(): the latter returns a COLUMNLESS frame for a
    # zero-row dataset (Ray quirk), which would KeyError the sort below on
    # an empty corpus
    hist = (
        pa.concat_tables(
            [b for b in ray.get(hist_ds.to_arrow_refs()) if b.num_columns]
        )
        .to_pandas()
        .sort_values("n_events")
    )
    cum = hist["cnt"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    ok = np.flatnonzero(_POWER_Q_DEN * cum >= _POWER_Q_NUM * total)
    thr = int(hist["n_events"].to_numpy()[ok[0]]) if ok.size else 0

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_events"), thr))

    return _pin_schema(
        counts.map_batches(keep, batch_format="pyarrow").sort(["user_id"]),
        out_schema,
    )


_HOUR_US = 3_600_000_000


def concurrent_sessions(sf_dir: str) -> Dataset:
    """Hourly session concurrency: ``(hour, n_sessions, n_users)`` — for
    every wall-clock hour, how many sessions were ACTIVE during it (span
    overlap, not start time) and how many distinct users they belong to.
    An interval RANGE JOIN (session span ⨝ hour grid) — Ray Data has no
    native one; the standard distributed reduction is explode-to-grid:
    each session row expands to its covered hour keys (bounded: sessions
    are gap-capped, so spans are hours, not the corpus's time range), then
    the two-level grouped() of :func:`daily_active_users` — level 1
    collapses to distinct (hour, user) carrying the session count, level 2
    counts users and sums sessions.  Only (hour, user, cnt) int rows ever
    shuffle; consumes the session-memoized :func:`sessionization`."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "hour": df["start_ts"],
                    "user_id": pd.Series([], dtype="int64"),
                }
            )
        # pin the resolution before the int view (pandas may surface the
        # arrow timestamp as M8[us] or M8[ns] depending on version — the
        # retention_cohorts hazard, pinned everywhere a ts becomes an int)
        start = (
            df["start_ts"].dt.floor("h").astype("datetime64[us]")
            .astype("int64").to_numpy()
        )
        end = (
            df["end_ts"].dt.floor("h").astype("datetime64[us]")
            .astype("int64").to_numpy()
        )
        n = (end - start) // _HOUR_US + 1
        offs = np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)
        hours = np.repeat(start, n) + offs * _HOUR_US
        return pd.DataFrame(
            {
                "hour": hours.astype("datetime64[us]"),
                "user_id": np.repeat(df["user_id"].to_numpy(), n),
            }
        )

    l1 = GroupSpec(keys=("hour", "user_id"))
    per_user = grouped(
        sessionization(sf_dir).map_batches(explode, batch_format="pandas"),
        l1,
        empty=final_empty(
            l1, {"hour": pa.timestamp("us"), "user_id": pa.int64()}
        ),
    )
    l2 = GroupSpec(keys=("hour",), count=True, sum_cols=("cnt",))
    g = grouped(
        per_user,
        l2,
        empty=final_empty(l2, {"hour": pa.timestamp("us"), "cnt": pa.int64()}),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": t.column("hour"),
                "n_sessions": t.column("sum_cnt"),
                "n_users": t.column("cnt"),
            }
        )

    out_schema = pa.schema(
        [("hour", pa.timestamp("us")), ("n_sessions", pa.int64()),
         ("n_users", pa.int64())]
    )
    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(["hour"]), out_schema
    )


def session_stats(sf_dir: str) -> Dataset:
    """One-row corpus rollup over :func:`sessionization`: ``(n_sessions,
    n_bounces, avg_events, avg_duration_s, sum_value)`` — the engagement
    summary (bounce = single-event session).  Durations sum in exact
    integer microseconds and values in integer cents, so the only floats
    are the two final divisions — identical IEEE trees to
    ``oracle.SESSION_STATS``, 6dp-truncated.  The corpus-sized work is
    sessionization's bucketed exchange; this adds one partial-merge pass
    over its session rows."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # pin resolution before the int view (M8[us]/M8[ns] version hazard)
        dur_us = (
            df["end_ts"].astype("datetime64[us]").astype("int64")
            - df["start_ts"].astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame(
            {
                "k": np.zeros(1, dtype=np.int64),
                "n_sessions": np.int64(len(df)),
                "n_bounces": np.int64((df["n_events"] == 1).sum()),
                "sum_events": df["n_events"].sum().astype("int64")
                if len(df)
                else np.int64(0),
                "sum_dur_us": dur_us.sum().astype("int64")
                if len(df)
                else np.int64(0),
                "sum_cents": (df["sum_value"] * 100)
                .round()
                .astype("int64")
                .sum()
                if len(df)
                else np.int64(0),
            }
        )

    g = grouped(
        sessionization(sf_dir).map_batches(partial, batch_format="pandas"),
        GroupSpec(
            keys=("k",),
            count=False,
            sum_cols=(
                "n_sessions",
                "n_bounces",
                "sum_events",
                "sum_dur_us",
                "sum_cents",
            ),
        ),
        empty=pa.schema(
            [("k", pa.int64())]
            + [
                (f"sum_{c}", pa.int64())
                for c in (
                    "n_sessions",
                    "n_bounces",
                    "sum_events",
                    "sum_dur_us",
                    "sum_cents",
                )
            ]
        ).empty_table(),
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        # zero-sessions guard (empty corpus): the oracle's HAVING
        # COUNT(*) > 0 yields zero rows; 0/0 here would emit a NaN row
        df = df[df["sum_n_sessions"] > 0]
        n = df["sum_n_sessions"].to_numpy().astype(np.float64)
        avg_events = (
            df["sum_sum_events"].to_numpy().astype(np.float64) / n
        )
        avg_dur = (
            df["sum_sum_dur_us"].to_numpy().astype(np.float64) / 1000000.0 / n
        )
        return pd.DataFrame(
            {
                "n_sessions": df["sum_n_sessions"].astype("int64"),
                "n_bounces": df["sum_n_bounces"].astype("int64"),
                "avg_events": np.floor(avg_events * 1e6) / 1e6,
                "avg_duration_s": np.floor(avg_dur * 1e6) / 1e6,
                "sum_value": df["sum_sum_cents"].to_numpy() / 100.0,
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pandas"),
        pa.schema(
            [("n_sessions", pa.int64()), ("n_bounces", pa.int64()),
             ("avg_events", pa.float64()), ("avg_duration_s", pa.float64()),
             ("sum_value", pa.float64())]
        ),
    )


_PATH_LEN = 3  # first-K event types per user
_PATH_SCHEMA = pa.schema([("path", pa.string()), ("n_users", pa.int64())])


def top_event_paths(sf_dir: str) -> Dataset:
    """Path mining: each user's FIRST three event types (by ts, event_id)
    joined as ``'a>b>c'``, counted across users — ``(path, n_users)``.
    The onboarding-flow report ("what do new users actually do first?").

    Scale shape: the user-hash bucketed exchange co-locates each user's
    events; within a bucket the head-3 + join + count is all C-level
    pandas, and the bucket emits per-PATH counts (≤ types³ rows), so the
    final grouped() merge is trivially small.  Oracle:
    ``oracle.TOP_EVENT_PATHS`` (row_number + ordered string_agg)."""
    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "path": pd.Series([], dtype="string"),  # object→NULL-typed arrow
                    "n_users": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        head = df.groupby("user_id", sort=False).head(_PATH_LEN)
        p = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        vc = p.value_counts()
        return pd.DataFrame(
            {"path": vc.index.to_numpy(), "n_users": vc.to_numpy().astype("int64")}
        )

    ev = read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    per_bucket = _user_bucket_apply(
        sf_dir, ev, paths, session_buckets(sf_dir)
    )
    spec = GroupSpec(keys=("path",), count=False, sum_cols=("n_users",))
    g = grouped(
        per_bucket,
        spec,
        empty=final_empty(spec, {"path": pa.string(), "n_users": pa.int64()}),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {"path": t.column("path"), "n_users": t.column("sum_n_users")}
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(["path"]),
        pa.schema([("path", pa.string()), ("n_users", pa.int64())]),
    )


def inter_event_gaps(sf_dir: str) -> Dataset:
    """Cadence per event type: for every event with a predecessor from the
    same user (ordered by ts, event_id), the gap to that predecessor —
    rolled up as ``(event_type, n_gaps, avg_gap_s, max_gap_s)``.  The
    signal behind session-gap tuning and activity-cadence monitoring.

    Gaps are exact integer microseconds end-to-end (vectorized int64
    subtraction in the bucket task, int64 sum/max through grouped()); the
    only float op is the final average — the identical
    ``floor((sum/1e6/n)·1e6)/1e6`` tree as ``oracle.INTER_EVENT_GAPS``."""
    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="string"),  # object→NULL-typed arrow
                    "n": pd.Series([], dtype="int64"),
                    "sum_us": pd.Series([], dtype="int64"),
                    "max_us": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # pin resolution before the int view (M8[us]/M8[ns] version hazard)
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        same = df["user_id"].to_numpy()
        has_prev = np.zeros(len(df), dtype=bool)
        has_prev[1:] = same[1:] == same[:-1]
        gap = np.zeros(len(df), dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        sub = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(), "gap_us": gap}
        )[has_prev]
        if not len(sub):
            return gaps(sub.iloc[0:0].drop(columns=["gap_us"]))
        agg = sub.groupby("event_type", sort=False)["gap_us"].agg(
            ["size", "sum", "max"]
        )
        return pd.DataFrame(
            {
                "event_type": agg.index.to_numpy(),
                "n": agg["size"].to_numpy().astype("int64"),
                "sum_us": agg["sum"].to_numpy().astype("int64"),
                "max_us": agg["max"].to_numpy().astype("int64"),
            }
        )

    ev = read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    per_bucket = _user_bucket_apply(sf_dir, ev, gaps, session_buckets(sf_dir))
    spec = GroupSpec(
        keys=("event_type",),
        count=False,
        sum_cols=("n", "sum_us"),
        max_cols=("max_us",),
    )
    g = grouped(
        per_bucket,
        spec,
        empty=final_empty(
            spec,
            {"event_type": pa.string(), "n": pa.int64(),
             "sum_us": pa.int64(), "max_us": pa.int64()},
        ),
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        n = df["sum_n"].to_numpy().astype(np.float64)
        avg = (
            df["sum_sum_us"].to_numpy().astype(np.float64) / 1000000.0 / n
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n_gaps": df["sum_n"].astype("int64"),
                "avg_gap_s": np.floor(avg * 1e6) / 1e6,
                "max_gap_s": df["max_max_us"].to_numpy().astype(np.float64)
                / 1000000.0,
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pandas").sort(["event_type"]),
        pa.schema(
            [("event_type", pa.string()), ("n_gaps", pa.int64()),
             ("avg_gap_s", pa.float64()), ("max_gap_s", pa.float64())]
        ),
    )


def repeat_purchase_rate(sf_dir: str) -> Dataset:
    """One-row loyalty rollup: ``(buyers, repeat_buyers, repeat_rate)`` —
    users with ≥1 purchase, users with ≥2, and their ratio (the classic
    retention KPI).  Two grouped() levels, both bounded: purchases collapse
    to (user, cnt) rows, those collapse to three integers; the rate is one
    float division of exact ints, 6dp-truncated
    (oracle.REPEAT_PURCHASE_RATE — empty-corpus contract: zero rows)."""
    def only_purchases(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.equal(t.column("event_type"), "purchase")
        ).select(["user_id"])

    l1 = GroupSpec(keys=("user_id",))
    per_user = grouped(
        read_events(sf_dir, ["event_type", "user_id"]).map_batches(
            only_purchases, batch_format="pyarrow"
        ),
        l1,
        # a purchase-free corpus legitimately empties the filter — the
        # typed fallback keeps the documented zero-row contract
        empty=final_empty(l1, {"user_id": pa.int64()}),
    )

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        rep = int(pc.sum(pc.cast(pc.greater_equal(t.column("cnt"), 2),
                                 pa.int64())).as_py() or 0)
        return pa.table(
            {
                "k": pa.array(np.zeros(1, dtype=np.int64)),
                "buyers": pa.array([n], pa.int64()),
                "rep": pa.array([rep], pa.int64()),
            }
        )

    l2 = GroupSpec(keys=("k",), count=False, sum_cols=("buyers", "rep"))
    g = grouped(
        per_user.map_batches(partial, batch_format="pyarrow"),
        l2,
        empty=final_empty(
            l2, {"k": pa.int64(), "buyers": pa.int64(), "rep": pa.int64()}
        ),
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sum_buyers"] > 0]
        b = df["sum_buyers"].to_numpy().astype(np.float64)
        r = df["sum_rep"].to_numpy().astype(np.float64)
        return pd.DataFrame(
            {
                "buyers": df["sum_buyers"].astype("int64"),
                "repeat_buyers": df["sum_rep"].astype("int64"),
                "repeat_rate": np.floor((r / b) * 1e6) / 1e6,
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pandas"),
        pa.schema(
            [("buyers", pa.int64()), ("repeat_buyers", pa.int64()),
             ("repeat_rate", pa.float64())]
        ),
    )


def conversion_lag_stats(sf_dir: str) -> Dataset:
    """One-row view→purchase latency rollup: among users whose first
    purchase is at or after their first view, ``(n_users, avg_lag_s,
    max_lag_s)`` over first-view→first-purchase gaps.  The time-to-convert
    KPI behind funnel dashboards.

    Scale shape: events collapse to (user, type, min ts) through grouped()
    — the exchange moves users × 2 timestamp rows, never raw events; the
    per-user pivot runs in the user-hash bucket exchange; the final merge
    is three integers.  Gaps are exact integer microseconds; the average
    is the shared sum/1e6/n float64 tree, 6dp-truncated
    (oracle.CONVERSION_LAG_STATS)."""
    def vp_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(
                t.column("event_type"),
                value_set=pa.array(["view", "purchase"]),
            )
        )

    l1 = GroupSpec(keys=("user_id", "event_type"), count=False, min_cols=("ts",))
    firsts = grouped(
        read_events(sf_dir, ["event_type", "user_id", "ts"]).map_batches(
            vp_only, batch_format="pyarrow"
        ),
        l1,
        # a view/purchase-free corpus legitimately empties the filter
        empty=final_empty(
            l1,
            {"user_id": pa.int64(), "event_type": pa.string(),
             "ts": pa.timestamp("us")},
        ),
    )

    def lags(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "k": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "sum_us": pd.Series([], dtype="int64"),
                    "max_us": pd.Series([], dtype="int64"),
                }
            )
        p = df.pivot_table(
            index="user_id",
            columns="event_type",
            values="min_ts",
            aggfunc="first",
        )
        if "view" not in p.columns or "purchase" not in p.columns:
            lag = np.array([], dtype=np.int64)
        else:
            both = p.dropna(subset=["view", "purchase"])
            # pin resolution before the int view (M8[us]/M8[ns] hazard)
            lag = (
                both["purchase"].astype("datetime64[us]").astype("int64")
                - both["view"].astype("datetime64[us]").astype("int64")
            ).to_numpy()
            lag = lag[lag >= 0]
        return pd.DataFrame(
            {
                "k": np.zeros(1, dtype=np.int64),
                "n": np.array([lag.size], dtype=np.int64),
                "sum_us": np.array([lag.sum() if lag.size else 0],
                                   dtype=np.int64),
                "max_us": np.array([lag.max() if lag.size else 0],
                                   dtype=np.int64),
            }
        )

    per_bucket = _user_bucket_apply(
        sf_dir, firsts, lags, session_buckets(sf_dir)
    )
    l2 = GroupSpec(keys=("k",), count=False, sum_cols=("n", "sum_us"),
                   max_cols=("max_us",))
    g = grouped(
        per_bucket,
        l2,
        empty=final_empty(
            l2,
            {"k": pa.int64(), "n": pa.int64(), "sum_us": pa.int64(),
             "max_us": pa.int64()},
        ),
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sum_n"] > 0]
        n = df["sum_n"].to_numpy().astype(np.float64)
        return pd.DataFrame(
            {
                "n_users": df["sum_n"].astype("int64"),
                "avg_lag_s": np.floor(
                    (df["sum_sum_us"].to_numpy().astype(np.float64)
                     / 1000000.0 / n) * 1e6
                ) / 1e6,
                "max_lag_s": df["max_max_us"].to_numpy().astype(np.float64)
                / 1000000.0,
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pandas"),
        pa.schema(
            [("n_users", pa.int64()), ("avg_lag_s", pa.float64()),
             ("max_lag_s", pa.float64())]
        ),
    )


def trending_event_types(sf_dir: str) -> Dataset:
    """Per-day trending rank: each day's top-3 event types by count —
    ``(day, rnk, event_type, cnt)`` (the events-side counterpart of
    ``top_docs_per_source``'s window-rank).

    Scale shape: grouped() collapses to (day, type) count rows; a local
    per-block top-3-per-day prune bounds the final task at blocks × days ×
    3 rows (a globally top-3 row is top-3 in any block subset containing
    it — the standard local-prune argument); one task ranks.  Oracle:
    ``oracle.TRENDING_EVENT_TYPES``."""
    TOP = 3

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                "event_type": t.column("event_type"),
            }
        )

    spec = GroupSpec(keys=("day", "event_type"))
    g = grouped(
        read_events(sf_dir, ["ts", "event_type"]).map_batches(
            add_day, batch_format="pyarrow"
        ),
        spec,
        empty=final_empty(
            spec, {"day": pa.timestamp("us"), "event_type": pa.string()}
        ),
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["day", "cnt", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("day", sort=False).head(TOP)

    def fin(df: pd.DataFrame) -> pa.Table:
        # the global re-rank is exactly the per-block prune over the merged
        # candidates — one definition, so the tie-break order cannot drift
        top = prune(df)
        out = pd.DataFrame(
            {
                "day": top["day"].to_numpy(),
                "rnk": top.groupby("day", sort=False)
                .cumcount()
                .to_numpy()
                .astype(np.int64)
                + 1,
                "event_type": top["event_type"].to_numpy(),
                "cnt": top["cnt"].to_numpy().astype("int64"),
            }
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return _pin_schema(
        g.map_batches(prune, batch_format="pandas")
        .repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None),
        pa.schema(
            [("day", pa.timestamp("us")), ("rnk", pa.int64()),
             ("event_type", pa.string()), ("cnt", pa.int64())]
        ),
    )


def rolling_wau(sf_dir: str) -> Dataset:
    """7-day trailing weekly-active-users per day: ``(window_start, wau)``
    — the DAU→WAU rolling-distinct primitive (a plain sliding_window sum
    cannot express DISTINCT; this stays exact).

    Scale shape: three bounded grouped() levels — events collapse to
    DISTINCT (user, day); a vectorized 7-way day-shift replicate (the
    ``sliding_window`` idiom) lands each row in its windows; DISTINCT
    (user, window) de-dupes; the window count finishes.  The widest
    exchange moves users × days × 7 int rows — never raw events.  Oracle:
    ``oracle.ROLLING_WAU``."""
    def add_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
            }
        )

    l1 = GroupSpec(keys=("user_id", "day"))
    per_day = grouped(
        read_events(sf_dir, ["user_id", "ts"]).map_batches(
            add_day, batch_format="pyarrow"
        ),
        l1,
        empty=final_empty(
            l1, {"user_id": pa.int64(), "day": pa.timestamp("us")}
        ),
    )

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for k in range(7):
            shift = pa.scalar(k * 86_400_000_000, pa.duration("us"))
            parts.append(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "window_start": pc.subtract(t.column("day"), shift),
                    }
                )
            )
        return pa.concat_tables(parts)

    l2 = GroupSpec(keys=("user_id", "window_start"))
    per_window = grouped(
        per_day.map_batches(explode, batch_format="pyarrow"),
        l2,
        empty=final_empty(
            l2, {"user_id": pa.int64(), "window_start": pa.timestamp("us")}
        ),
    )
    l3 = GroupSpec(keys=("window_start",))
    wau = grouped(
        per_window,
        l3,
        empty=final_empty(l3, {"window_start": pa.timestamp("us")}),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t.column("window_start"),
                "wau": t.column("cnt"),
            }
        )

    return _pin_schema(
        wau.map_batches(post, batch_format="pyarrow").sort(["window_start"]),
        pa.schema([("window_start", pa.timestamp("us")), ("wau", pa.int64())]),
    )


VALUE_PCTS = (50, 90, 99)


def value_percentiles(sf_dir: str) -> Dataset:
    """Exact per-type value percentiles — ``(event_type, n_events, p50,
    p90, p99)`` — via the same mergeable counting-histogram rule as
    ``size_percentiles`` (smallest value with cum·100 ≥ n·p), over exact
    integer cents.  The exchange moves types × distinct-cents rows
    (value-range bounded, corpus-size independent); one task reads the
    percentiles off the cumulative counts.  Oracle:
    ``oracle.VALUE_PERCENTILES``."""
    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": pc.cast(
                    pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    spec = GroupSpec(keys=("event_type", "cents"))
    g = grouped(
        read_events(sf_dir, ["event_type", "value"]).map_batches(
            to_cents, batch_format="pyarrow"
        ),
        spec,
        empty=final_empty(
            spec, {"event_type": pa.string(), "cents": pa.int64()}
        ),
    )

    def fin(df: pd.DataFrame) -> pa.Table:
        if not len(df):  # dtype-stable empty result
            return pa.schema(
                [("event_type", pa.string()), ("n_events", pa.int64())]
                + [(f"p{p}", pa.float64()) for p in VALUE_PCTS]
            ).empty_table()
        rows = []
        for et, sub in df.sort_values(["event_type", "cents"]).groupby(
            "event_type", sort=True
        ):
            cum = sub["cnt"].to_numpy().cumsum()
            cents = sub["cents"].to_numpy()
            n = int(cum[-1])
            row = {"event_type": et, "n_events": np.int64(n)}
            for p in VALUE_PCTS:
                idx = int(np.searchsorted(cum * 100, n * p, side="left"))
                row[f"p{p}"] = cents[idx] / 100.0
            rows.append(row)
        out = pd.DataFrame(
            rows,
            columns=["event_type", "n_events"]
            + [f"p{p}" for p in VALUE_PCTS],
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return _pin_schema(
        g.repartition(1)
        .map_batches(fin, batch_format="pandas", batch_size=None),
        pa.schema(
            [("event_type", pa.string()), ("n_events", pa.int64())]
            + [(f"p{p}", pa.float64()) for p in VALUE_PCTS]
        ),
    )


def session_duration_percentiles(sf_dir: str) -> Dataset:
    """Exact session-duration distribution: one row ``(n_sessions, p50_s,
    p90_s, p99_s)`` over whole-second session durations (floor of the
    exact integer-microsecond span — seconds granularity is what bounds
    the histogram: distinct whole-second durations ≤ the session-gap
    ceiling, corpus-size independent).  Same counting-histogram rule as
    ``size_percentiles``.  The corpus-sized work is sessionization's
    bucketed exchange; this adds a (dur_s → count) grouped() histogram
    and a one-task read-off.  Oracle:
    ``oracle.SESSION_DURATION_PERCENTILES``."""
    def dur_rows(df: pd.DataFrame) -> pd.DataFrame:
        # pin resolution before the int view (M8[us]/M8[ns] version hazard)
        dur_us = (
            df["end_ts"].astype("datetime64[us]").astype("int64")
            - df["start_ts"].astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame({"dur_s": (dur_us // 1_000_000).astype("int64")})

    spec = GroupSpec(keys=("dur_s",))
    hist = grouped(
        sessionization(sf_dir).map_batches(dur_rows, batch_format="pandas"),
        spec,
        empty=final_empty(spec, {"dur_s": pa.int64()}),
    )

    def fin(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.schema(
                [("n_sessions", pa.int64())]
                + [(f"p{p}_s", pa.int64()) for p in (50, 90, 99)]
            ).empty_table()
        df = df.sort_values("dur_s")
        cum = df["cnt"].to_numpy().cumsum()
        dur = df["dur_s"].to_numpy()
        n = int(cum[-1])
        out = {"n_sessions": np.array([n], np.int64)}
        for p in (50, 90, 99):
            idx = int(np.searchsorted(cum * 100, n * p, side="left"))
            out[f"p{p}_s"] = np.array([dur[idx]], np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame(out), preserve_index=False
        ).replace_schema_metadata(None)

    return _pin_schema(
        hist.repartition(1).map_batches(
            fin, batch_format="pandas", batch_size=None
        ),
        pa.schema(
            [("n_sessions", pa.int64())]
            + [(f"p{p}_s", pa.int64()) for p in (50, 90, 99)]
        ),
    )


CHURN_DAYS = 1  # inactive when last event >= this many whole days old
# (the synthetic corpora span ~30 days with near-daily user activity, so a
# week-scale threshold would select nothing at any sf; the operator is the
# same shape at any threshold)


def user_churn(sf_dir: str) -> Dataset:
    """Churned users: ``(user_id, last_ts, days_inactive)`` for every user
    whose last event is at least ``CHURN_DAYS`` whole days before the
    corpus's global max timestamp — the batch analogue of the reference's
    lag watermark (TailCommand.java:750-763 reports how far behind a
    stream is; this reports how far behind each USER is).

    Scale shape: one grouped() pass collapses events to one
    ``(user_id, max_ts)`` row per user (the exchange moves per-block
    partials, bounded by users x blocks, never raw events); the global max
    is a scalar tree-reduce over that already-collapsed table; the filter
    then runs distributed against the broadcast scalar.  ``days_inactive``
    is exact integer microseconds floor-divided to whole days on both
    engines.  Oracle: ``oracle.USER_CHURN``."""
    last = grouped(
        read_events(sf_dir, ["user_id", "ts"]),
        GroupSpec(keys=("user_id",), count=False, max_cols=("ts",)),
        empty=pa.schema(
            [("user_id", pa.int64()), ("max_ts", pa.timestamp("us"))]
        ).empty_table(),
    ).materialize()  # consumed twice (scalar max + filter); without this
    # the sort-shuffle fallback plan would re-run the whole merge
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("last_ts", pa.timestamp("us")),
         ("days_inactive", pa.int64())]
    )
    mx = last.max("max_ts")  # scalar tree-reduce; O(1) driver state
    if mx is None:  # empty corpus: no users, no churn
        return ray.data.from_arrow(out_schema.empty_table())
    mx_us = int(pd.Timestamp(mx).value // 1000)

    def fin(t: pa.Table) -> pa.Table:
        last_us = pc.cast(t.column("max_ts"), pa.int64())
        days = pc.divide(pc.subtract(mx_us, last_us), 86_400_000_000)
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "last_ts": t.column("max_ts"),
                "days_inactive": days,
            }
        )
        return out.filter(pc.greater_equal(days, CHURN_DAYS))

    return _pin_schema(
        last.map_batches(fin, batch_format="pyarrow").sort(["user_id"]),
        out_schema,
    )


def bounce_rate(sf_dir: str) -> Dataset:
    """Per-day session bounce counts: ``(day, n_sessions, n_bounces)`` by
    session START day, a bounce being a single-event session.  Counts stay
    integers end-to-end (the rate is the consumer's division) so parity is
    bit-exact.  Reuses the session-memoized :func:`sessionization` table —
    a sweep pays the user-bucketed exchange once; this adds only a tiny
    (day -> counts) grouped() rollup.  Oracle: ``oracle.BOUNCE_RATE``."""
    def rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t.column("start_ts"), unit="day"),
                "bounce": pc.cast(
                    pc.equal(t.column("n_events"), 1), pa.int64()
                ),
            }
        )

    g = grouped(
        sessionization(sf_dir).map_batches(rows, batch_format="pyarrow"),
        GroupSpec(keys=("day",), count=True, sum_cols=("bounce",)),
        empty=pa.schema(
            [("day", pa.timestamp("us")), ("cnt", pa.int64()),
             ("sum_bounce", pa.int64())]
        ).empty_table(),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": t.column("day"),
                "n_sessions": t.column("cnt"),
                "n_bounces": t.column("sum_bounce"),
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(["day"]),
        pa.schema(
            [("day", pa.timestamp("us")), ("n_sessions", pa.int64()),
             ("n_bounces", pa.int64())]
        ),
    )


def event_transitions(sf_dir: str) -> Dataset:
    """First-order Markov transition counts: ``(from_type, to_type, cnt)``
    over consecutive same-user events ordered by ``(ts, event_id)`` — the
    path-mining primitive behind ``top_event_paths`` generalized to the
    full transition matrix (bounded at |event types|^2 rows).

    Same scale shape as :func:`inter_event_gaps`: the user-bucketed
    exchange co-locates each user's events, the bucket task pairs
    consecutive rows vectorized (shift + same-user mask) and collapses to
    per-bucket transition partials, grouped() merges them.  Oracle:
    ``oracle.EVENT_TRANSITIONS``."""
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # dtype="string" (not object): an empty object column converts to a
        # NULL-typed arrow column, which poisons the merge's concat when an
        # all-empty bucket block lands in its own batch
        empty = pd.DataFrame(
            {
                "from_type": pd.Series([], dtype="string"),
                "to_type": pd.Series([], dtype="string"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        et = df["event_type"].to_numpy()
        sub = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        if not len(sub):
            return empty
        agg = sub.groupby(["from_type", "to_type"], sort=False).size()
        out = agg.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    ev = read_events(sf_dir, ["user_id", "ts", "event_type", "event_id"])
    per_bucket = _user_bucket_apply(sf_dir, ev, pairs, session_buckets(sf_dir))
    g = grouped(
        per_bucket,
        GroupSpec(keys=("from_type", "to_type"), count=False, sum_cols=("n",)),
        empty=pa.schema(
            [("from_type", pa.string()), ("to_type", pa.string()),
             ("sum_n", pa.int64())]
        ).empty_table(),
    )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "from_type": t.column("from_type"),
                "to_type": t.column("to_type"),
                "cnt": t.column("sum_n"),
            }
        )

    return _pin_schema(
        g.map_batches(post, batch_format="pyarrow").sort(
            ["from_type", "to_type"]
        ),
        pa.schema(
            [("from_type", pa.string()), ("to_type", pa.string()),
             ("cnt", pa.int64())]
        ),
    )
