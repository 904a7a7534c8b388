"""Robustness stress harness — the BASELINE.md "stress" section's source.

Generates DETERMINISTIC synthetic corpora under /tmp (no external data) and
drives the dedup chain at adversarial scale.  Three modes:

- ``dupheavy``: every document x COPIES exact copies (the LSH worst case for
  exact-duplicate banding) — full chain end-to-end.
- ``perturbed``: large corpus of near-unique docs — linear-op timings.
- ``adversarial``: GROUPS groups x COPIES near-copies of a base doc — the
  quadratic candidate-pair case.  The Jaccard verify is driven TO
  COMPLETION in bounded, resumable WAVES: candidates are hash-partitioned
  into --waves slices and ``dedup.verify_candidates`` runs per wave, so no
  single exchange carries more than pairs/waves shingle payloads through
  the object store; each wave logs (pairs_in, verified, secs) and the
  harness prints cumulative progression — kill/restart loses at most one
  wave of work.

Usage (each mode prints one JSON line at the end):
    python stress.py --mode adversarial --groups 5000 --copies 100 \
        --waves 16 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_TOKENS = 60
SHARDS = 32
VOCAB = 50_000


def _write_corpus(root: str, texts: list[str]) -> str:
    """documents/ directory layout, SHARDS zstd shards, TESTDATA schema."""
    n = len(texts)
    docdir = os.path.join(root, "documents")
    shutil.rmtree(docdir, ignore_errors=True)
    os.makedirs(docdir)
    ids = np.arange(n, dtype=np.int64)
    bounds = np.linspace(0, n, SHARDS + 1).astype(int)
    for s in range(SHARDS):
        lo, hi = bounds[s], bounds[s + 1]
        t = pa.table(
            {
                "doc_id": pa.array(ids[lo:hi]),
                "text": pa.array(texts[lo:hi], pa.string()),
                "lang": pa.array(["en"] * (hi - lo)),
                "source": pa.array(["stress"] * (hi - lo)),
                "n_chars": pa.array(
                    [len(x) for x in texts[lo:hi]], pa.int64()
                ),
            }
        )
        pq.write_table(
            t, os.path.join(docdir, f"part-{s:04d}.parquet"),
            compression="zstd",
        )
    return root


def _gen_groups(groups: int, copies: int, perturb: int, seed: int = 11):
    """groups x copies docs; copy c of group g perturbs ``perturb`` token
    positions with copy-unique tokens (near-copies: 3-gram Jaccard stays
    far above the 0.05 threshold at perturb=1-2 over 60 tokens)."""
    rng = np.random.RandomState(seed)
    texts: list[str] = []
    for g in range(groups):
        base = rng.randint(0, VOCAB, size=DOC_TOKENS)
        toks = [f"t{v:05d}" for v in base]
        pos = rng.randint(0, DOC_TOKENS, size=(copies, perturb))
        for c in range(copies):
            row = list(toks)
            for k in range(perturb):
                row[pos[c, k]] = f"g{g}c{c}k{k}"
            texts.append(" ".join(row))
    return texts


def _init(cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def mode_adversarial(args) -> dict:
    from oplog_analyzer_ray.pipelines import dedup

    root = "/tmp/stress_adversarial"
    os.makedirs(root, exist_ok=True)
    print(
        f"generating {args.groups}x{args.copies} near-copy corpus...",
        file=sys.stderr,
        flush=True,
    )
    _write_corpus(root, _gen_groups(args.groups, args.copies, perturb=1))

    _init(args.cpus)
    t0 = time.time()
    cands = dedup._candidate_pairs_ds(root).materialize()
    n_cands = cands.count()
    t_cands = time.time() - t0
    print(f"candidates: {n_cands} pairs in {t_cands:.1f}s", file=sys.stderr,
          flush=True)

    # wave partition: deterministic hash of the pair — each wave's exchange
    # carries ~pairs/waves shingle payloads, bounding object-store pressure
    def wave_filter(t: pa.Table, wave: int) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        h = (a * np.int64(2654435761) + b) % np.int64(args.waves)
        return t.filter(pa.array(h == wave))

    n_verified = 0
    t_verify = 0.0
    per_wave = []
    for w in range(args.waves):
        tw = time.time()
        wave_cands = cands.map_batches(
            wave_filter, fn_kwargs={"wave": w}, batch_format="pyarrow"
        )
        got = dedup.verify_candidates(root, wave_cands).materialize()
        nw = got.count()
        dt = time.time() - tw
        n_verified += nw
        t_verify += dt
        per_wave.append(round(dt, 1))
        print(
            f"wave {w + 1}/{args.waves}: verified {nw} "
            f"(cumulative {n_verified}) in {dt:.1f}s "
            f"(verify total {t_verify:.1f}s)",
            file=sys.stderr,
            flush=True,
        )
    return {
        "mode": "adversarial",
        "docs": args.groups * args.copies,
        "candidate_pairs": n_cands,
        "sec_candidates": round(t_cands, 1),
        "verified_pairs": n_verified,
        "sec_verify_total": round(t_verify, 1),
        "sec_per_wave": per_wave,
        "waves": args.waves,
        "cpus": args.cpus,
    }


def mode_dupheavy(args) -> dict:
    from oplog_analyzer_ray.pipelines import curate, dedup

    root = "/tmp/stress_dupheavy"
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(7)
    base = [
        " ".join(f"t{v:05d}" for v in rng.randint(0, VOCAB, size=DOC_TOKENS))
        for _ in range(args.groups)
    ]
    _write_corpus(root, [t for t in base for _ in range(args.copies)])
    _init(args.cpus)
    out = {"mode": "dupheavy", "docs": args.groups * args.copies,
           "cpus": args.cpus}
    for name, fn in (
        ("near_dup_jaccard", dedup.near_dup_jaccard),
        ("dedup_clusters", dedup.dedup_clusters),
        ("dedup_keep_best", dedup.dedup_keep_best),
        ("curated_corpus", curate.curated_corpus),
    ):
        t0 = time.time()
        n = fn(root).materialize().count()
        out[name] = {"rows": n, "sec": round(time.time() - t0, 1)}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    return out


def mode_perturbed(args) -> dict:
    from oplog_analyzer_ray.pipelines import dedup, text

    root = "/tmp/stress_perturbed"
    os.makedirs(root, exist_ok=True)
    _write_corpus(
        root, _gen_groups(args.groups, args.copies, perturb=DOC_TOKENS // 2)
    )
    _init(args.cpus)
    out = {"mode": "perturbed", "docs": args.groups * args.copies,
           "cpus": args.cpus}
    for name, fn in (
        ("minhash_signatures", dedup.minhash_signatures),
        ("exact_dedup", dedup.exact_dedup),
        ("pack_sequences", text.pack_sequences),
        ("quality_budget_selection", text.quality_budget_selection),
        ("tfidf_topk", text.tfidf_topk),
        ("train_val_split", text.train_val_split),
    ):
        t0 = time.time()
        r = fn(root)
        n = r.materialize().count() if hasattr(r, "materialize") else r.num_rows
        out[name] = {"rows": n, "sec": round(time.time() - t0, 1)}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("adversarial", "dupheavy", "perturbed"),
                   required=True)
    p.add_argument("--groups", type=int, default=5000)
    p.add_argument("--copies", type=int, default=100)
    p.add_argument("--waves", type=int, default=16)
    p.add_argument("--cpus", type=int, default=32)
    args = p.parse_args()
    out = {"adversarial": mode_adversarial, "dupheavy": mode_dupheavy,
           "perturbed": mode_perturbed}[args.mode](args)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
