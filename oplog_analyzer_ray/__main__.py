"""CLI entry points mirroring the reference's subcommand surface
(OplogAnalyzer.java:11-13: scan / tail / analyze / sample → here
route / report / analyze / sample over transcript Parquet).

Owns its Ray session (guarded init; scripts always shut down cleanly —
the library itself never calls ray.init, per the driver contract).

Usage:
  python -m oplog_analyzer_ray route   --sf-dir DIR --out OUT [--units-per-commit N] [--shard-index 0,2]
  python -m oplog_analyzer_ray tail    --sf-dir DIR --out OUT [--poll-secs S] [--idle-polls N]
  python -m oplog_analyzer_ray report  --sf-dir DIR [--top N]
  python -m oplog_analyzer_ray analyze --sf-dir DIR
  python -m oplog_analyzer_ray sample  --sf-dir DIR [--k N]
  python -m oplog_analyzer_ray curate  --sf-dir DIR --out OUT [--conversations]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def parse_iso_ts(s: str) -> _dt.datetime:
    """M9: ISO-8601 CLI timestamp → filter bound (ScanCommand.java:101-134)."""
    return _dt.datetime.fromisoformat(s)


def cmd_route(args) -> None:
    from .pipelines.route import route

    manifest = route(
        args.sf_dir,
        args.out,
        units_per_commit=args.units_per_commit,
        shard_indexes=args.shard_indexes,
        start_ts=(
            parse_iso_ts(args.start_ts)
            if getattr(args, "start_ts", None)
            else None
        ),
        end_ts=(
            parse_iso_ts(args.end_ts)
            if getattr(args, "end_ts", None)
            else None
        ),
    )
    totals = manifest.sink_totals()
    print(f"routed {sum(totals.values())} events over "
          f"{len(manifest.finished())} partitions -> {args.out}")
    for sink, n in sorted(totals.items()):
        print(f"  {sink:<10} {n}")
    print(f"watermark: {manifest.watermark()}")


def cmd_tail(args) -> None:
    from .pipelines.route import tail_follow

    manifest = tail_follow(
        args.sf_dir,
        args.out,
        poll_secs=args.poll_secs,
        idle_polls=args.idle_polls,
        max_polls=args.max_polls,
    )
    totals = manifest.sink_totals()
    print(f"tailed {sum(totals.values())} events over "
          f"{len(manifest.finished())} partitions -> {args.out}")
    print(f"watermark: {manifest.watermark()}")


def cmd_report(args) -> None:
    from .functions.format import byte_display, max_width, truncate_middle
    from .pipelines.core import hot_keys_topk, sink_counts

    rows = sink_counts(args.sf_dir).take_all()
    w = max_width([r["ns"] for r in rows], "ns")
    print(f"{'sink':<10} {'ns':<{w}} {'op':<3} {'count':>9} "
          f"{'total':>10} {'avg':>9} {'max':>9}")
    for r in rows:
        print(
            f"{r['sink']:<10} {truncate_middle(r['ns'], w):<{w}} "
            f"{r['op_class']:<3} {r['cnt']:>9} "
            f"{byte_display(r['total']):>10} {byte_display(r['avg_size']):>9} "
            f"{byte_display(r['max_size']):>9}"
        )
    print("\ntop conversations by event count:")
    for r in hot_keys_topk(args.sf_dir, k=args.top).take_all():
        print(f"  {r['ns']:<24} {r['conv_id']:<14} {r['cnt']:>7} "
              f"{byte_display(r['total_size']):>10}")


def cmd_analyze(args) -> None:
    from .pipelines.analyze import shard_skew, shard_workloads, skew_recommendation
    from .pipelines.core import collection_patterns

    if getattr(args, "csv_out", None):
        # --sheet graft: the reference exports the analyze report to a
        # workbook (AnalyzeCommand's -x/--sheet); here one CSV per table
        import os

        os.makedirs(args.csv_out, exist_ok=True)
        from .pipelines.analyze import update_freq_by_shard

        tables = {
            "shard_workloads": shard_workloads(args.sf_dir).to_pandas(),
            "collection_patterns": collection_patterns(args.sf_dir).to_pandas(),
            "shard_skew": shard_skew(args.sf_dir).to_pandas(),
            "update_freq_by_shard": update_freq_by_shard(args.sf_dir).to_pandas(),
        }
        for name, df in tables.items():
            df.to_csv(os.path.join(args.csv_out, f"{name}.csv"), index=False)
        print(f"wrote {len(tables)} report tables to {args.csv_out}")

    print("== shard workloads ==")
    for r in shard_workloads(args.sf_dir).take_all():
        print(f"  {r['shard']:<10} ops={r['total_ops']:<8} "
              f"bytes={r['total_bytes']:<10} avg={r['avg_bytes_per_op']:<6} "
              f"{r['workload_group']}")
    print("== collection patterns ==")
    for r in collection_patterns(args.sf_dir).take_all():
        print(f"  {r['ns']:<24} n={r['cnt']:<8} avg={r['avg_size']:<6} "
              f"{r['pattern']}")
    print("== cross-shard skew ==")
    for r in shard_skew(args.sf_dir).to_pylist():
        flag = " OUTLIER" if r["outlier"] else ""
        print(f"  {r['shard']:<10} ops_dev={r['ops_dev_pct']:+.2f}% "
              f"bytes_dev={r['bytes_dev_pct']:+.2f}%{flag}")
    rec = skew_recommendation(args.sf_dir)
    print(f"avg-size ratio {rec['avg_size_ratio']}; "
          f"{'REVIEW RECOMMENDED' if rec['recommend_review'] else 'balanced'}; "
          f"{rec['n_outliers']} outlier shard(s)")
    from .pipelines.analyze import shard_key_recommendations, update_freq_by_shard

    print("== per-shard update frequency ==")
    for r in update_freq_by_shard(args.sf_dir).to_pylist():
        flag = " OUTLIER" if r["outlier"] else ""
        print(f"  {r['ns']:<24} {r['shard']:<10} ops={r['total_updates']:<7} "
              f"ids={r['unique_ids']:<6} ops_dev={r['ops_dev_pct']:+.1f}% "
              f"size_dev={r['size_dev_pct']:+.1f}%{flag}")
    recs = shard_key_recommendations(args.sf_dir)
    print("== shard key recommendations ==")
    if not recs:
        print("  (none: no heavy-updates namespaces)")
    for r in recs:
        print(f"  {r['ns']}: {r['recommendation']}")


def cmd_sample(args) -> None:
    from .pipelines.sample import sample_membership, sampled_events
    from .state.shardkeys import shard_key_catalog, shard_key_lookup

    member = sample_membership(args.sf_dir, args.k)
    followed = sampled_events(args.sf_dir, args.k)
    if getattr(args, "out", None):
        # the reference's sample phase writes per-shard dumps + a JSON stats
        # report AND prepends the config.collections shard-key docs to the
        # output (SampleCommand.java:359-400, 412-425, 452-475); here:
        # partitioned parquet of the followed events, the membership table,
        # the shard-key catalog, and a stats JSON leading with the keys
        import json
        import os

        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        followed.write_parquet(
            os.path.join(args.out, "events"), partition_cols=["ns"]
        )
        pq.write_table(member, os.path.join(args.out, "membership.parquet"))
        pq.write_table(
            shard_key_catalog(), os.path.join(args.out, "shard_keys.parquet")
        )
        counts = {}
        for row in member.to_pylist():
            counts[row["ns"]] = counts.get(row["ns"], 0) + 1
        stats = {
            "shard_keys": shard_key_lookup(),
            "k": args.k,
            "membership_pairs": member.num_rows,
            "ids_per_ns": counts,
            "followed_events": followed.count(),
        }
        with open(os.path.join(args.out, "sample_stats.json"), "w") as f:
            json.dump(stats, f, indent=1)
        print(f"wrote sample ({stats['followed_events']} events, "
              f"{member.num_rows} ids) to {args.out}")
    else:
        n = followed.count()
        print(f"membership: {member.num_rows} (ns, conv) pairs; "
              f"followed events: {n}")


def cmd_curate(args) -> None:
    """Training-corpus curation: write the curated keep-lists (documents
    and, with --conversations, the agentic conversation keep-list) as
    parquet plus a summary JSON."""
    import json
    import os

    from .pipelines.curate import curated_corpus

    os.makedirs(args.out, exist_ok=True)
    # materialize once: write_parquet + count on a lazy Dataset would
    # otherwise re-run the whole curation DAG twice
    kept = curated_corpus(args.sf_dir).materialize()
    kept.write_parquet(os.path.join(args.out, "documents_keep"))
    stats = {"documents_kept": kept.count()}
    if args.conversations:
        from .pipelines.core import curated_conversations

        conv = curated_conversations(args.sf_dir).materialize()
        conv.write_parquet(os.path.join(args.out, "conversations_keep"))
        stats["conversations_kept"] = conv.count()
    with open(os.path.join(args.out, "curate_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(
        "curated: " + ", ".join(f"{k}={v}" for k, v in stats.items())
        + f" -> {args.out}"
    )


def cmd_qa(args) -> None:
    """Training-data QA report: split leakage (near-dup clusters spanning
    train/val/test), the dedup cluster-size histogram, and — when the
    corpus ships embeddings — the ANN recall@k report.  One JSON object on
    stdout; every section is a bounded report table (the heavy chains are
    session-memoized, so the three sections share one dedup derivation)."""
    import json

    from .pipelines.corpus import corpus_path
    from .pipelines.curate import split_leakage_report
    from .pipelines.dedup import dedup_cluster_sizes

    out = {
        "split_leakage": split_leakage_report(args.sf_dir)
        .to_pandas()
        .to_dict(orient="records"),
        "dedup_cluster_sizes": dedup_cluster_sizes(args.sf_dir)
        .to_pandas()
        .to_dict(orient="records"),
    }
    import os

    if os.path.exists(corpus_path(args.sf_dir, "embeddings")):
        from .pipelines.similarity import ann_recall_report

        out["ann_recall"] = (
            ann_recall_report(args.sf_dir).to_pandas().to_dict(orient="records")
        )
    print(json.dumps(out))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="oplog_analyzer_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("route")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--units-per-commit", type=int, default=None)
    p.add_argument("--shard-index", dest="shard_indexes", default=None,
                   type=lambda s: [int(x) for x in s.split(",")])
    p.add_argument("--start-ts", default=None,
                   help="ISO-8601 time-range seek pushed into the scan "
                        "(the --startTs graft)")
    p.add_argument("--end-ts", default=None,
                   help="ISO-8601 upper time bound pushed into the scan "
                        "(the -e/--endTime graft; closed interval)")
    p.set_defaults(fn=cmd_route)

    p = sub.add_parser("tail")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--poll-secs", type=float, default=1.0,
                   help="sleep between polls (TailableAwait timeout graft)")
    p.add_argument("--idle-polls", type=int, default=3,
                   help="exit after this many consecutive quiet polls")
    p.add_argument("--max-polls", type=int, default=None,
                   help="hard poll cap (None = run until idle)")
    p.set_defaults(fn=cmd_tail)

    p = sub.add_parser("report")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--top", type=int, default=10)
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("analyze")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--csv-out", default=None,
                   help="also export report tables as CSV files to this dir")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("sample")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--out", default=None,
                   help="write followed events (parquet, partitioned by ns) "
                        "+ membership + stats JSON to this dir")
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("curate")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True,
                   help="write keep-list parquet + summary JSON here")
    p.add_argument("--conversations", action="store_true",
                   help="also write the agentic conversation keep-list")
    p.set_defaults(fn=cmd_curate)

    p = sub.add_parser("qa")
    p.add_argument("--sf-dir", required=True)
    p.set_defaults(fn=cmd_qa)

    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)
    try:
        args.fn(args)
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
