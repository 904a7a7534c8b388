"""Merge-semantics + invariance tests (SURVEY.md §5.1/§5.5).

Pins that our partial→final aggregation implements the reference's CORRECT
``EntryAccumulator.merge`` (component-wise count/total/min/max,
EntryAccumulator.java:210-229) and NOT the lossy ``ScanCommand.java:338-356``
replay which destroys min/max; and that grouped stats are invariant under
repartitioning (the salting/partial-combine correctness property)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from oplog_analyzer_ray.pipelines.agg import GroupSpec, grouped


def _make_ds(sizes_by_key, num_blocks):
    keys, sizes = [], []
    for k, vals in sizes_by_key.items():
        keys += [k] * len(vals)
        sizes += vals
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "size": pa.array(sizes, pa.int64())})
    return ray.data.from_arrow(t).repartition(num_blocks)


SPEC = GroupSpec(keys=("k",), sum_cols=("size",), min_cols=("size",),
                 max_cols=("size",))


def _stats(ds):
    out = {}
    for row in grouped(ds, SPEC).take_all():
        out[row["k"]] = (row["cnt"], row["sum_size"], row["min_size"],
                         row["max_size"])
    return out


def test_merge_preserves_min_max_across_blocks():
    data = {"a": [100, 1, 999, 50], "b": [7]}
    # force the extremes into different blocks: 4 blocks over 5 rows
    got = _stats(_make_ds(data, num_blocks=4))
    assert got["a"] == (4, 1150, 1, 999)  # lossy replay would give min==max==avg
    assert got["b"] == (1, 7, 7, 7)


def test_invariant_under_repartitioning():
    rng = np.random.default_rng(7)
    data = {f"k{i}": rng.integers(1, 10_000, size=int(n)).tolist()
            for i, n in enumerate([1, 3, 17, 200])}
    a = _stats(_make_ds(data, num_blocks=1))
    b = _stats(_make_ds(data, num_blocks=13))
    assert a == b


def test_null_values_excluded_like_sql():
    t = pa.table({"k": pa.array(["a", "a", "b"], pa.string()),
                  "v": pa.array([None, 5, None], pa.int64())})
    ds = ray.data.from_arrow(t)
    spec = GroupSpec(keys=("k",), sum_cols=("v",), count_valid=("v",))
    rows = {r["k"]: r for r in grouped(ds, spec).take_all()}
    assert rows["a"]["sum_v"] == 5 and rows["a"]["cntv_v"] == 1
    assert rows["a"]["cnt"] == 2  # COUNT(*) still counts null rows
    assert rows["b"]["sum_v"] is None and rows["b"]["cntv_v"] == 0


def test_grouped_multi_equals_separate_grouped():
    """grouped_multi (one fused scan, union-schema partials) must equal
    independent grouped() calls spec-by-spec — including null aggregation
    semantics across the union schema."""
    import pandas as pd

    from oplog_analyzer_ray.pipelines.agg import grouped_multi

    rng = np.random.default_rng(19)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 800, n).astype(str),
            "s": np.array(["x", "y", "z"])[rng.integers(0, 3, n)],
            "v": rng.integers(-100, 100, n),
        }
    )
    df.loc[rng.integers(0, n, 500), "v"] = None  # exercise null skipping
    specs = [
        GroupSpec(keys=("k",), sum_cols=("v",), min_cols=("v",),
                  max_cols=("v",), count_valid=("v",)),
        GroupSpec(keys=("s", "k"), sum_cols=("v",)),
        GroupSpec(keys=("s",), count=True),
    ]

    def norm(d, keys):
        return (
            d.to_pandas()
            .sort_values(list(keys))
            .reset_index(drop=True)
        )

    multi = grouped_multi(ray.data.from_pandas(df).repartition(9), specs)
    for got, spec in zip(multi, specs):
        want = grouped(ray.data.from_pandas(df).repartition(9), spec)
        w = norm(want, spec.keys)
        g = norm(got, spec.keys)[w.columns]
        pd.testing.assert_frame_equal(g, w)


def test_exchange_fanout_fallback_equals_hand_path(monkeypatch):
    """Past MAX_EXCHANGE_FANOUT the exchange falls back to Ray's sort
    shuffle; both plans must produce identical stats."""
    import pandas as pd

    from oplog_analyzer_ray.pipelines import agg

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {"k": rng.integers(0, 500, 8000).astype(str),
         "size": rng.integers(0, 9999, 8000)}
    )
    monkeypatch.setattr(agg, "SMALL_MERGE_ROWS", 0)  # force an exchange
    hand = grouped(ray.data.from_pandas(df).repartition(6), SPEC).to_pandas()
    monkeypatch.setattr(agg, "MAX_EXCHANGE_FANOUT", 0)  # force sort fallback
    sort = grouped(ray.data.from_pandas(df).repartition(6), SPEC).to_pandas()
    pd.testing.assert_frame_equal(
        hand.sort_values("k").reset_index(drop=True),
        sort.sort_values("k").reset_index(drop=True),
    )


def test_copartitioned_hot_keys_matches_general_path(tmp_path):
    """Under a genuinely id-sharded layout (every conv in exactly one
    part), the zero-shuffle co-partitioned top-K equals the general
    grouped()+topk path.  The layout is built here by hash-sharding a
    synthetic event table — the precondition the operator documents."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.pipelines.agg import copartitioned_hot_keys, topk

    rng = np.random.default_rng(11)
    n = 20_000
    conv = np.array([f"conv{i:04d}" for i in rng.zipf(1.3, n) % 500])
    ns = np.array(["bucket%d.reply" % (hash(c) % 3) for c in conv])
    size = rng.integers(10, 5000, n)
    df = pd.DataFrame({"ns": ns, "conv_id": conv, "size": size})
    data = str(tmp_path / "sharded")
    for p in range(4):  # id-sharded: conv -> exactly one part
        sub = df[pd.util.hash_array(df["conv_id"].to_numpy()) % 4 == p]
        d = os.path.join(data, f"part=shard-{p}")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(sub, preserve_index=False),
                       os.path.join(d, "events.parquet"))

    got = copartitioned_hot_keys(data, k=20).to_pandas()

    routed = ray.data.read_parquet(data, columns=["ns", "conv_id", "size"])
    g = grouped(routed, GroupSpec(keys=("ns", "conv_id"), sum_cols=("size",)))

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ns": t.column("ns"),
                "conv_id": t.column("conv_id"),
                "cnt": t.column("cnt"),
                "total_size": t.column("sum_size"),
            }
        )

    want = topk(
        g.map_batches(post, batch_format="pyarrow"),
        20,
        [("cnt", "descending"), ("ns", "ascending"), ("conv_id", "ascending")],
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got[["ns", "conv_id", "cnt", "total_size"]].reset_index(drop=True),
        want[["ns", "conv_id", "cnt", "total_size"]].reset_index(drop=True),
    )


def test_hash_bucket_apply_paths_agree():
    """The task-based exchange and the streamed sort-based fallback are two
    plans for the SAME operator: identical results for a per-key reduction,
    at several widths including the degenerate buckets=1."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from oplog_analyzer_ray.pipelines.agg import hash_bucket_apply

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 97, 5000),
            "v": rng.integers(0, 1000, 5000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)

    def per_key_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        g = t.group_by(["k"]).aggregate([("v", "sum")])
        return pa.table({"k": g.column("k"), "s": g.column("v_sum")})

    outs = []
    for use_exchange, buckets in [(True, 1), (True, 8), (True, 33), (False, 8)]:
        out = (
            hash_bucket_apply(
                ds, ("k",), per_key_sum, buckets, use_exchange=use_exchange
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        outs.append(out)
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)
    want = df.groupby("k", as_index=False)["v"].sum().rename(columns={"v": "s"})
    pd.testing.assert_frame_equal(outs[0], want.astype({"s": "int64"}))


def test_hash_bucket_apply_string_keys_dict_encoded_roundtrip():
    """The group exchange dictionary-encodes repeated STRING key columns per
    slice; fn must see plain (decoded) strings and results must match the
    sort path exactly — the regression for the encode/decode pair on
    _split_group_task/_apply_group_task."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from oplog_analyzer_ray.pipelines.agg import hash_bucket_apply

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "user_id": [f"user_{i:03d}" for i in rng.integers(0, 40, 4000)],
            "v": rng.integers(0, 100, 4000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)

    def per_key(t: pa.Table) -> pa.Table:
        # the exchange must hand fn PLAIN strings, never dictionary arrays
        # (fn runs in remote tasks — raising is how the check propagates)
        if pa.types.is_dictionary(t.schema.field("user_id").type):
            raise TypeError("dictionary-encoded key leaked into fn")
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.string()),
                 "s": pa.array([], pa.int64())}
            )
        g = t.group_by(["user_id"]).aggregate([("v", "sum")])
        return pa.table({"user_id": g.column("user_id"), "s": g.column("v_sum")})

    got = (
        hash_bucket_apply(ds, ("user_id",), per_key, 8, use_exchange=True)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("user_id", as_index=False)["v"]
        .sum()
        .rename(columns={"v": "s"})
        .astype({"s": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)


def test_hash_bucket_apply_empty_input_keeps_schema():
    """A fully-empty exchanged dataset with an ``empty`` template yields
    schema-correct empty blocks (downstream sort/select stays typed)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from oplog_analyzer_ray.pipelines.agg import hash_bucket_apply

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "v": pd.Series([], dtype="int64")})
    )
    empty = pa.table(
        {"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
    )

    def per_key(t: pa.Table) -> pa.Table:
        g = t.group_by(["k"]).aggregate([("v", "sum")])
        return pa.table({"k": g.column("k"), "s": g.column("v_sum")})

    out = hash_bucket_apply(
        ds, ("k",), per_key, 4, use_exchange=True, empty=empty
    )
    got = out.sort(["k"]).to_pandas()
    assert got.columns.tolist() == ["k", "s"] or got.empty
    # the arrow schema of every block is the template's
    for ref in out.to_arrow_refs():
        import ray as _ray

        t = _ray.get(ref)
        if hasattr(t, "schema"):
            assert t.schema.names == ["k", "s"]


def test_grouped_empty_fallback_paths(monkeypatch):
    """grouped(empty=...) must survive a fully-empty input in EVERY merge
    plan: the single-task concat path, the task exchange, and the Ray
    sort-shuffle fallback (forced here by shrinking the plan thresholds)."""
    import ray.data as rd

    from oplog_analyzer_ray.pipelines import agg

    spec = agg.GroupSpec(keys=("k",), count=True, sum_cols=("v",))
    final_empty = pa.schema(
        [("k", pa.string()), ("cnt", pa.int64()), ("sum_v", pa.int64())]
    ).empty_table()

    def all_empty(t: pa.Table) -> pa.Table:
        # typed 0-row output; Ray stores it as a schema-less empty block
        return pa.schema(
            [("k", pa.string()), ("v", pa.int64())]
        ).empty_table()

    src = rd.from_arrow(
        pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    ).map_batches(all_empty, batch_format="pyarrow")

    # 1) small-cardinality concat path (default thresholds)
    out = agg.grouped(src, spec, empty=final_empty)
    assert out.count() == 0 and out.schema().names == ["k", "cnt", "sum_v"]

    # 2) sort-shuffle fallback (thresholds floored so the plan falls through)
    monkeypatch.setattr(agg, "SMALL_MERGE_ROWS", -1)
    monkeypatch.setattr(agg, "MAX_EXCHANGE_FANOUT", 0)
    out2 = agg.grouped(src, spec, empty=final_empty)
    assert out2.count() == 0 and out2.schema().names == ["k", "cnt", "sum_v"]

    # 3) task exchange (fanout restored, small-merge still disabled)
    monkeypatch.setattr(agg, "MAX_EXCHANGE_FANOUT", 1 << 18)
    out3 = agg.grouped(src, spec, empty=final_empty)
    assert out3.count() == 0 and out3.schema().names == ["k", "cnt", "sum_v"]

    # without the fallback the failure must be the documented clear error
    monkeypatch.setattr(agg, "SMALL_MERGE_ROWS", 65_536)
    with pytest.raises(Exception, match="schema-less|empty"):
        agg.grouped(src, spec).count()


def test_grouped_nullable_key_buckets():
    """A null-bearing int64 key block must hash its NON-null keys to the
    same buckets as a null-free block: pandas to_pandas() promotes nullable
    int64 to float64, and hash_array(7) != hash_array(7.0) — without the
    fill_null-first fix the same key's partials split across buckets and
    the merge emits duplicate groups."""
    a = pa.table({"k": pa.array([7, 7], pa.int64()),
                  "v": pa.array([1, 2], pa.int64())})
    b = pa.table({"k": pa.array([7, None, None], pa.int64()),
                  "v": pa.array([4, 8, 16], pa.int64())})
    ds = ray.data.from_arrow_refs(
        [ray.put(a), ray.put(b)]
    )
    out = grouped(
        ds, GroupSpec(keys=("k",), count=True, sum_cols=("v",)), buckets=64
    ).to_pandas()
    import pandas as pd

    by_k = {None if pd.isna(r.k) else int(r.k): (r.cnt, r.sum_v)
            for r in out.itertuples(index=False)}
    assert len(out) == 2
    assert by_k[7] == (3, 7)      # one merged row, not split partials
    assert by_k[None] == (2, 24)  # nulls co-locate too



def test_grouped_null_bool_key(ray_session):
    """Null-bearing bool key columns must bucket deterministically: the
    null fill previously built pa.scalar(0, type=bool_) which raises
    ArrowInvalid inside the split task."""
    import pyarrow as pa

    import ray.data

    from oplog_analyzer_ray.pipelines.agg import GroupSpec, grouped

    t = pa.table({"k": pa.array([True, None, False, None, True])})
    out = (
        grouped(ray.data.from_arrow(t), GroupSpec(keys=("k",)), buckets=4)
        .to_pandas()
        .sort_values("cnt")
        .reset_index(drop=True)
    )
    # True x2, False x1, null x2 — three distinct groups survive the fill
    assert sorted(out["cnt"].tolist()) == [1, 2, 2]


def test_grouped_buckets_one_past_small_merge(ray_session):
    """buckets=1 with more partial rows than SMALL_MERGE_ROWS must take the
    single-merge-task fast path: options(num_returns=1) returns a bare
    ObjectRef, so the split/merge loop raised TypeError before the guard."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from oplog_analyzer_ray.pipelines.agg import (
        SMALL_MERGE_ROWS,
        GroupSpec,
        grouped,
    )

    n = SMALL_MERGE_ROWS + 1024  # all-distinct keys -> n partial rows
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64))})
    out = grouped(ray.data.from_arrow(t), GroupSpec(keys=("k",)), buckets=1)
    assert out.count() == n


def test_grouped_multi_empty_input_with_empties():
    """merge_union_partials previously dead-ended a fully-empty input in a
    ValueError whose advice (pass grouped(..., empty=...)) was impossible
    to follow from grouped_multi/route_aggregate (review finding); the new
    ``empties=`` parameter yields one typed zero-row report per spec."""
    from oplog_analyzer_ray.pipelines.agg import final_empty, grouped_multi

    specs = [
        GroupSpec(keys=("k",), sum_cols=("v",)),
        GroupSpec(keys=("s",), count=True),
    ]
    empties = [
        final_empty(specs[0], {"k": pa.string(), "v": pa.int64()}),
        final_empty(specs[1], {"s": pa.string()}),
    ]
    src = pa.schema(
        [("k", pa.string()), ("s", pa.string()), ("v", pa.int64())]
    ).empty_table()
    outs = grouped_multi(ray.data.from_arrow(src), specs, empties=empties)
    for out, want in zip(outs, empties):
        assert out.schema().names == want.schema.names
        assert out.count() == 0

    # and without empties the loud contract error still fires
    with pytest.raises(ValueError, match="empty"):
        for d in grouped_multi(ray.data.from_arrow(src), specs):
            d.count()
