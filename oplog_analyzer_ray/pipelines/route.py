"""Routing fan-out: per-sink partitioned Parquet writers + resumable manifest.

Grafts the reference's per-shard dump writers (ST4, TailCommand.java:227-342;
SampleCommand.java:359-400) into ``write_parquet(partition_cols=["part",
"sink"])``: one directory per (input shard, sink) so output is resumable and
never one giant file.  The ``part`` lineage column is derived from the input
file path (``include_paths=True``) and rides through the parse stage.

Resume protocol (north_rule; SURVEY.md §7.2 step 7):
1. load manifest; drop input shards already committed;
2. clean any partial output dirs of UNcommitted shards (a crashed run's
   half-written files) — makes re-processing idempotent;
3. run one streaming job per commit group: read → parse → enrich → write;
4. collect per-unit metrics from written parquet FOOTERS (row counts, ts
   column max) — no second data pass — and commit atomically.

A fresh run and a crash+resume run produce identical sink counts
(tests/test_route_resume.py).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..stages.enrich import make_enrich_fn, put_lookups
from ..stages.parse import parse_classify
from ..state.manifest import Manifest
from ..synth import ensure_transcripts



def _unit_of(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _add_part(batch: pa.Table) -> pa.Table:
    """Derive the ``part`` lineage column from the input file path.

    The path is CONSTANT per block (one read task per input shard), so the
    basename is computed once and broadcast with a vectorized ``take`` —
    running the regex per row cost 4+ s on a 30M-row corpus for a value
    with 128 distinct instances."""
    import numpy as np

    paths = batch.column("path")
    n = batch.num_rows
    if n == 0:
        part = pa.array([], pa.string())
    elif paths[0].as_py() == paths[n - 1].as_py():
        val = _unit_of(paths[0].as_py())
        part = pc.take(
            pa.array([val], pa.string()),
            pa.array(np.zeros(n, dtype=np.int32)),
        )
    else:  # coalesced block spanning files: regex only the distinct paths
        u = pc.unique(paths)
        mapped = pc.replace_substring_regex(
            u, r"^.*/([^/]+)\.parquet$", r"\1"
        )
        part = pc.take(mapped, pc.index_in(paths, value_set=u))
    return batch.drop_columns(["path"]).append_column("part", part)


def collect_unit_metrics(data_dir: str, units: list[str]) -> list[dict]:
    """Per-unit footer metrics, one Ray task per unit.

    The footer parse is GIL-bound python-side (a 16-thread pool measured
    ~0.9 s for 1024 files), so fan it out as tasks — on a cluster this also
    reads each unit's footers on whatever node holds them."""
    import ray

    @ray.remote(num_cpus=0.25)
    def one(u: str) -> dict:
        return _unit_metrics(data_dir, u)

    return ray.get([one.remote(u) for u in units])


def _unit_metrics(data_dir: str, unit: str) -> dict:
    """Exact per-unit metrics from written parquet footers (no data pass)."""
    part_dir = os.path.join(data_dir, f"part={unit}")
    sink_counts: dict[str, int] = {}
    out_files: list[str] = []
    max_ts = None
    rows = 0
    if not os.path.isdir(part_dir):
        # a fully-filtered unit (e.g. --start-ts past the shard's last
        # event) writes no partition dir: commit it as legitimately empty
        # so the resume ledger still marks it finished
        return {
            "unit": unit,
            "rows": 0,
            "sink_counts": {},
            "max_ts": None,
            "output_files": [],
        }
    for sink_ent in sorted(os.scandir(part_dir), key=lambda e: e.name):
        if not sink_ent.name.startswith("sink="):
            continue
        sink = sink_ent.name.split("=", 1)[1]
        n = 0
        for f in sorted(os.scandir(sink_ent.path), key=lambda e: e.name):
            if not f.name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f.path).metadata
            n += md.num_rows
            ts_idx = md.schema.to_arrow_schema().get_field_index("ts")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                if st is not None and st.has_min_max:
                    m = st.max.isoformat()
                    max_ts = m if max_ts is None or m > max_ts else max_ts
            out_files.append(os.path.relpath(f.path, data_dir))
        sink_counts[sink] = n
        rows += n
    return {
        "unit": unit,
        "rows": rows,
        "sink_counts": sink_counts,
        "max_ts": max_ts,
        "output_files": out_files,
    }


def _commit_group(manifest, group, data_dir: str, wall: float) -> None:
    """Commit one group's finished units: footer-derived metrics + the M10
    lag watermark (commit wallclock minus the partition's event-time
    watermark, UTC-pinned, floored at 0 — TailCommand.java:1073-1082).
    The one definition behind route() and route_aggregate(), which had
    drifted copies of this loop."""
    import datetime as _dt

    commit_time = time.time()
    metrics = collect_unit_metrics(data_dir, [_unit_of(f) for f in group])
    entries = []
    for f, e in zip(group, metrics):
        e["input_file"] = f
        e["wall_secs_group"] = round(wall, 3)
        if e["max_ts"]:
            # the event-time watermark is UTC; pin the tz before
            # .timestamp() or the lag is off by the host's UTC offset
            wm = (
                _dt.datetime.fromisoformat(e["max_ts"])
                .replace(tzinfo=_dt.timezone.utc)
                .timestamp()
            )
            e["lag_secs"] = round(max(0.0, commit_time - wm), 3)
        entries.append(e)
    manifest.commit(entries)


def route(
    sf_dir: str,
    out_root: str,
    units_per_commit: int | None = None,
    max_commits: int | None = None,
    shard_indexes: list[int] | None = None,
    start_ts=None,
    end_ts=None,
) -> Manifest:
    """Parse → enrich → fan out to per-(part, sink) parquet; resumable.

    ``shard_indexes`` selects a subset of the sorted input shards by index
    (F8, the ``--shardIndex`` graft, ScanCommand.java:166-196).
    ``start_ts`` / ``end_ts`` push the CLOSED time-range seek into the
    parquet scan itself (S1/M9/F7, the ``--startTs``/``--endTime`` grafts,
    ScanCommand.java:50, 101-134, 259-267): row groups wholly outside
    [start, end] never leave storage."""
    src_dir = ensure_transcripts(sf_dir)
    files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    if shard_indexes is not None:
        files = [files[i] for i in shard_indexes]
    data_dir = os.path.join(out_root, "data")
    manifest = Manifest(os.path.join(out_root, "manifest.json"))
    # refuse resume under a DIFFERENT row-filter window: committed units
    # hold only in-window rows, so mixing windows silently loses data
    manifest.ensure_meta(
        {
            "start_ts": None if start_ts is None else str(start_ts),
            "end_ts": None if end_ts is None else str(end_ts),
        }
    )
    todo = [f for f in files if _unit_of(f) not in manifest.finished()]
    if not todo:
        return manifest

    # idempotent re-processing: clear partial output of uncommitted units
    for f in todo:
        part_dir = os.path.join(data_dir, f"part={_unit_of(f)}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)

    g = units_per_commit or len(todo)
    groups = [todo[i : i + g] for i in range(0, len(todo), g)]
    if max_commits is not None:
        groups = groups[:max_commits]
    lookups_ref = put_lookups()
    for group in groups:
        t0 = time.monotonic()
        # one block per input shard: blocks stay part-aligned end-to-end, so
        # the partitioned write emits one file per (part, sink) instead of
        # one per (task, part-fragment, sink) — output file count bounds the
        # read-planning cost of every later pass over the routed data
        read_kwargs = {"include_paths": True, "override_num_blocks": len(group)}
        if start_ts is not None or end_ts is not None:
            import pyarrow.dataset as pads

            expr = None
            if start_ts is not None:
                expr = pads.field("ts") >= start_ts
            if end_ts is not None:
                upper = pads.field("ts") <= end_ts
                expr = upper if expr is None else (expr & upper)
            read_kwargs["filter"] = expr
        ds = ray.data.read_parquet(group, **read_kwargs)
        ds = ds.map_batches(_add_part, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(
            parse_classify, batch_format="pyarrow", zero_copy_batch=True
        )
        ds = ds.map_batches(
            make_enrich_fn(lookups_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # zstd like the fused path: 2.4x fewer routed bytes than snappy
        ds.write_parquet(
            data_dir, partition_cols=["part", "sink"], compression="zstd"
        )
        _commit_group(manifest, group, data_dir, time.monotonic() - t0)
    return manifest


def tail_follow(
    sf_dir: str,
    out_root: str,
    poll_secs: float = 1.0,
    idle_polls: int = 3,
    max_polls: int | None = None,
) -> Manifest:
    """Continuous tail: a blocking long-poll loop over the
    watermark-incremental :func:`route` — the ``TailableAwait`` graft
    (TailCommand.java:534-552).  Each poll routes any input shards not yet
    committed in the manifest; between polls the loop sleeps ``poll_secs``
    (the reference's await-timeout analogue).  The loop exits after
    ``idle_polls`` consecutive polls that found no new input (or after
    ``max_polls`` total) — a production deployment sets both high / None
    and runs forever; the bounded exits make the loop testable.

    Crash semantics are strictly better than the reference's
    restart-at-latest (which loses the gap): killing the loop and rerunning
    resumes from the manifest like any :func:`route` run — no records
    skipped, no records duplicated (per-unit atomic commits)."""
    manifest = Manifest(os.path.join(out_root, "manifest.json"))
    idle = 0
    polls = 0
    while True:
        polls += 1
        before = len(manifest.finished())
        manifest = route(sf_dir, out_root)
        idle = 0 if len(manifest.finished()) > before else idle + 1
        if idle >= idle_polls or (max_polls is not None and polls >= max_polls):
            return manifest
        time.sleep(poll_secs)


def read_routed(out_root: str) -> "ray.data.Dataset":
    """Read the routed output back (hive-partitioned on part/sink)."""
    return ray.data.read_parquet(os.path.join(out_root, "data"))


def _write_and_partial(batch: pa.Table, data_dir: str, plan) -> pa.Table:
    """Fused sink+aggregate map stage: write this block's rows to the
    hive-partitioned routed layout AND return its union-schema aggregation
    partials (tiny: groups-per-block rows).

    The basename is a content hash over the FULL identity-column contents
    of the block (vectorized siphash per column, sha1 over the digest
    arrays), so a RETRIED task overwrites its own files byte-for-byte
    instead of duplicating rows (Ray Data's own write_parquet gets the same
    guarantee from task-indexed filenames) while two DISTINCT blocks can
    never collide.  Round 3 hashed only the first/last key values + row
    count — two batches of one hot (conv_id, turn_idx) group with equal
    endpoints and counts silently overwrote each other under
    ``overwrite_or_ignore``."""
    import hashlib

    import pandas as pd
    import pyarrow.dataset as pads

    if batch.num_rows == 0:
        return plan.multi_partial(batch)
    h = hashlib.sha1()
    for c in ("part", "sink", "conv_id", "turn_idx", "event_seq"):
        if c not in batch.column_names:
            continue
        vals = batch.column(c).to_numpy(zero_copy_only=False)
        h.update(pd.util.hash_array(vals, categorize=False).tobytes())
    h.update(str(batch.num_rows).encode())
    # zstd over the default snappy: 2.4x fewer routed bytes (2.16 -> 0.90 GB
    # at sf5) for a small CPU premium — a straight win on both the
    # bandwidth-starved wide configs (16 cpus: 9.4 -> 7.6 s) and the
    # CPU-bound narrow ones (4 cpus: 21.7 -> 20.4 s), and 2.4x less disk
    # and network for every later pass over the routed data
    fmt = pads.ParquetFileFormat()
    pads.write_dataset(
        batch,
        data_dir,
        format="parquet",
        file_options=fmt.make_write_options(compression="zstd"),
        partitioning=pads.partitioning(
            pa.schema([("part", pa.string()), ("sink", pa.string())]),
            flavor="hive",
        ),
        basename_template=f"fused-{h.hexdigest()[:16]}-{{i}}.parquet",
        existing_data_behavior="overwrite_or_ignore",
    )
    return plan.multi_partial(batch)


def route_aggregate(
    sf_dir: str,
    out_root: str,
    specs: list,
    units_per_commit: int | None = None,
    shard_indexes: list[int] | None = None,
    empties: list | None = None,
):
    """ONE-SCAN route + aggregate: the routed per-(part, sink) parquet write
    and the grouped-aggregation partials come out of the SAME streaming pass
    over the input — the corpus is never re-read for the report stage.

    Why: the classic route() → read_routed() → grouped_multi() pipeline
    pays a full second pass (read planning + decompress + decode of the
    aggregate columns) over data it just wrote; at 100 TB that second pass
    is petabyte-scale I/O for values that were in memory moments earlier.
    Here the fused map stage writes each part-aligned block to the routed
    layout and emits its per-block partials as the stage OUTPUT, so only
    blocks × groups partial rows flow on — the report is a byproduct of the
    write scan, the way the reference accumulates per-shard stats while
    dumping (TailCommand.java:227-342 + 1003-1007).

    Resume-aware: units already committed in the manifest are not re-routed
    — their partials are recovered by a column-pruned read of ONLY their
    partition dirs.  Returns ``(manifest, [Dataset-per-spec])`` with results
    identical to route() + grouped_multi(read_routed()) (pinned by
    tests/test_route_aggregate.py).
    """
    from .agg import (
        COMPACT_BATCH,
        PARTIAL_BATCH,
        _combine_partials,
        merge_union_partials,
        union_plan,
    )

    plan = union_plan(specs)
    src_dir = ensure_transcripts(sf_dir)
    files = sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    if shard_indexes is not None:
        files = [files[i] for i in shard_indexes]
    data_dir = os.path.join(out_root, "data")
    manifest = Manifest(os.path.join(out_root, "manifest.json"))
    # same window ledger as route(): this path routes UNFILTERED rows, so a
    # root previously committed under a ts window must refuse the resume
    manifest.ensure_meta({"start_ts": None, "end_ts": None})
    done = manifest.finished()
    todo = [f for f in files if _unit_of(f) not in done]

    partial_mats = []

    # resumed units: recover their partials from the routed layout
    # (column-pruned — only the spec columns leave storage)
    done_dirs = [
        os.path.join(data_dir, f"part={_unit_of(f)}")
        for f in files
        if _unit_of(f) in done
    ]
    done_files = []
    for d in done_dirs:
        if os.path.isdir(d):
            done_files += glob.glob(os.path.join(d, "sink=*", "*.parquet"))
    if done_files:
        from ray.data.datasource.partitioning import Partitioning

        cols = list(
            dict.fromkeys(c for s in plan.specs for c in s.needed_columns)
        )
        partial_mats.append(
            ray.data.read_parquet(
                done_files,
                columns=cols,
                partitioning=Partitioning("hive", base_dir=data_dir),
            )
            .map_batches(
                plan.multi_partial,
                batch_format="pyarrow",
                batch_size=PARTIAL_BATCH,
                zero_copy_batch=True,
            )
            .map_batches(
                _combine_partials,
                fn_kwargs={"spec": plan.union_spec},
                batch_format="pyarrow",
                batch_size=COMPACT_BATCH,
            )
            .materialize()
        )

    # idempotent re-processing: clear partial output of uncommitted units
    for f in todo:
        part_dir = os.path.join(data_dir, f"part={_unit_of(f)}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
    os.makedirs(data_dir, exist_ok=True)

    # a fully-committed rerun (the idempotent resume the docstring
    # promises) has todo == [] — range(0, 0, 0) would raise
    if todo:
        g = units_per_commit or len(todo)
        groups = [todo[i : i + g] for i in range(0, len(todo), g)]
    else:
        groups = []
    lookups_ref = put_lookups() if todo else None
    for group in groups:
        t0 = time.monotonic()
        ds = ray.data.read_parquet(
            group, include_paths=True, override_num_blocks=len(group)
        )
        ds = ds.map_batches(_add_part, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(
            parse_classify, batch_format="pyarrow", zero_copy_batch=True
        )
        ds = ds.map_batches(
            make_enrich_fn(lookups_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # the write+partial stage MUST stay block-aligned (one task per input
        # shard): chaining a batch_size-ed combine directly onto it would
        # FUSE, and Ray then feeds the whole chain 2M-row batches — 30M rows
        # collapse to ~15 tasks and the read unfuses (measured 62 s vs 17 s
        # at 16 cpus).  The per-block partials go STRAIGHT to the exchange —
        # no compaction tier: per-block pre-aggregation already collapsed
        # each block to one row per (spec, group), and cross-block overlap
        # is tiny for keyed specs (measured 7.71M -> 7.29M rows for 3.5 s of
        # barely-parallel group_by work at 16 cpus; the hash exchange
        # re-buckets the same rows either way).
        raw = ds.map_batches(
            _write_and_partial,
            fn_kwargs={"data_dir": data_dir, "plan": plan},
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()  # drives the fused read→parse→enrich→write scan
        partial_mats.append(raw)
        _commit_group(manifest, group, data_dir, time.monotonic() - t0)

    if not partial_mats:
        # fully-committed manifest whose data dir is gone (or an empty
        # corpus): nothing to merge — typed empty reports when the caller
        # provided them, else the loud no-partials contract error below
        if empties is not None:
            return manifest, [ray.data.from_arrow(e) for e in empties]
    return manifest, merge_union_partials(partial_mats, plan, empties=empties)
