"""End-to-end CLI smoke via real subprocesses (argparse layer + own Ray
session), mirroring how a reference user would invoke the tool."""

import json
import subprocess
import sys


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


def test_cli_report_subprocess():
    r = _run(["-m", "oplog_analyzer_ray", "--num-cpus", "4", "report",
              "--sf-dir", "/root/testdata/sf0.001", "--top", "3"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "top conversations" in r.stdout


def test_bench_headline_prints_one_json_line(tmp_path):
    r = _run(["bench.py", "--sf-dir", "/root/testdata/sf0.001",
              "--cpus", "4", "--headline-only"], timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert d["unit"] == "sec" and d["rows"] > 0 and "queries" in d
    assert set(d) >= {"metric", "value", "queries", "sf", "num_cpus"}


def test_cli_curate_subprocess(tmp_path):
    out = str(tmp_path / "curated")
    r = _run(["-m", "oplog_analyzer_ray", "--num-cpus", "4", "curate",
              "--sf-dir", "/root/testdata/sf0.001", "--out", out,
              "--conversations"], timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.load(open(f"{out}/curate_stats.json"))
    assert stats["documents_kept"] > 0
    assert stats["conversations_kept"] > 0
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/documents_keep/*.parquet')"
    ).fetchone()[0]
    assert n == stats["documents_kept"]


def test_cli_qa_subprocess():
    r = _run(["-m", "oplog_analyzer_ray", "--num-cpus", "4", "qa",
              "--sf-dir", "/root/testdata/sf0.001"], timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert {"split_leakage", "dedup_cluster_sizes", "ann_recall"} <= set(d)
    assert sum(row["n_docs"] for row in d["split_leakage"]) == 500
    assert all(0.0 <= row["recall_lsh"] <= 1.0 for row in d["ann_recall"])
    assert sum(r_["n_docs"] for r_ in d["dedup_cluster_sizes"]) == 500
