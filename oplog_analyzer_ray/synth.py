"""Deterministic synthetic transcript corpus generator.

There is no transcripts table in /root/testdata — BASELINE.json's
``input_hint`` mandates the shape and the round brief says to synthesise it
deterministically. This module is a pure function of (n_turns, seed): same
inputs → byte-identical Arrow table on any machine (numpy PCG64 stream).

Corpus properties (FIXTURES.md F1/F5):
- Zipf-skewed ``conv_id`` frequencies → hot conversations (exercises the
  hot-key top-K and salted aggregation paths; the reference's hot-_id
  statistics, IdStatisticsManager.java:38-90).
- ``text`` embeds bracketed op-like tokens ``[tool:name]`` parseable by the
  vectorized regex stage; a fraction of assistant turns carry >=2 tokens
  (the applyOps multi-event analogue, ScanCommand.java:361-393); ~1% are
  corrupt (parse-failure → reject path); some system turns are
  ``[config]``-housekeeping (config-namespace exclusion analogue,
  TailCommand.java:566-568).
- ``ts`` strictly monotone globally (hence per conv_id) from a fixed epoch.
- ASCII-only text so char length == byte length in every engine.

The on-disk cache layout (several parquet files per corpus) doubles as the
multi-shard input for partition/resume tests.
"""

from __future__ import annotations

import os
import shutil
import string
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import CONFIG_PREFIX, CORRUPT_PREFIX

GENERATOR_VERSION = 2
SEED = 42
EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
TURNS_PER_SF = 6_000_000  # sf0.01 -> 60k turns (matches lineitem row scale)
DEFAULT_CACHE_ROOT = "/tmp/graft_transcripts_v%d" % GENERATOR_VERSION
NUM_FILES = 8  # minimum input shards; also the resume-test partition grain
ROW_GROUP_SIZE = 10_000  # small row groups so reads can split across CPUs


def num_files_for(n_turns: int) -> int:
    """More shards at larger scale so the read stage parallelises; 8 at the
    test scales (the resume-test partition grain), up to 128 for bench runs."""
    return max(NUM_FILES, min(128, n_turns // 25_000))

_REAL_TOOLS = np.array(["search", "code", "browser", "calc"])


def _base_prose(rng: np.random.Generator, n_chars: int = 8192) -> str:
    """A deterministic ASCII word soup; rows slice windows out of it."""
    words = []
    letters = np.array(list(string.ascii_lowercase))
    while sum(len(w) + 1 for w in words) < n_chars:
        ln = int(rng.integers(2, 9))
        words.append("".join(letters[rng.integers(0, 26, ln)]))
    return " ".join(words)[:n_chars]


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_convs = max(50, n_turns // 20)

    # Zipf-skewed conversation assignment (rank^-1.1)
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    probs = ranks**-1.1
    probs /= probs.sum()
    conv_num = rng.choice(n_convs, size=n_turns, p=probs).astype(np.int64)
    conv_id = np.char.add("conv", np.char.zfill(conv_num.astype(str), 8))

    turn_idx = (
        pd.Series(conv_num).groupby(conv_num).cumcount().to_numpy().astype(np.int32)
    )

    role = rng.choice(
        np.array(["user", "assistant", "system", "tool"]),
        size=n_turns,
        p=[0.38, 0.42, 0.08, 0.12],
    )
    is_assistant = role == "assistant"
    is_system = role == "system"
    is_toolrole = role == "tool"

    tool = np.full(n_turns, "none", dtype=object)
    a_idx = np.flatnonzero(is_assistant)
    tool[a_idx] = rng.choice(
        np.array(["search", "code", "browser", "calc", "none"]),
        size=a_idx.size,
        p=[0.18, 0.12, 0.06, 0.04, 0.60],
    )
    t_idx = np.flatnonzero(is_toolrole)
    tool[t_idx] = rng.choice(_REAL_TOOLS, size=t_idx.size)

    # token counts: assistant turns with a tool get 1 token; 6% of those get 2-3
    # (multi-event applyOps analogue)
    k = np.zeros(n_turns, dtype=np.int64)
    has_tool = is_assistant & (tool != "none")
    k[has_tool] = 1
    multi_pick = rng.random(n_turns) < 0.06
    multi = has_tool & multi_pick
    k[multi] = rng.integers(2, 4, size=int(multi.sum()))

    # note tokens (counted by total_elements but not diff_fields)
    n_notes = np.where(rng.random(n_turns) < 0.10, rng.integers(1, 3, n_turns), 0)

    corrupt = rng.random(n_turns) < 0.01
    config = is_system & (rng.random(n_turns) < 0.5)

    # body lengths, lognormal clipped to [10, 4096]
    body_len = np.clip(
        rng.lognormal(mean=5.1, sigma=0.9, size=n_turns), 10, 4096
    ).astype(np.int64)

    base = _base_prose(np.random.default_rng(seed + 1))
    base2 = base + " " + base  # window slicing without bounds checks
    offsets = (np.arange(n_turns) * 37) % 4096

    tok_tools = rng.integers(0, 4, size=(n_turns, 3))  # pre-drawn token tool ids
    note_ids = rng.integers(0, 26, size=(n_turns, 2))

    texts = np.empty(n_turns, dtype=object)
    letters = string.ascii_lowercase
    tools_list = _REAL_TOOLS.tolist()
    for i in range(n_turns):
        if corrupt[i]:
            texts[i] = CORRUPT_PREFIX + base2[offsets[i] : offsets[i] + 24]
            continue
        parts = []
        if config[i]:
            parts.append(CONFIG_PREFIX)
        for j in range(k[i]):
            parts.append("[tool:%s]" % tools_list[tok_tools[i, j]])
        for j in range(n_notes[i]):
            parts.append("[note:%s]" % letters[note_ids[i, j]])
        parts.append(base2[offsets[i] : offsets[i] + body_len[i]])
        texts[i] = " ".join(parts)

    ts = EPOCH_US + np.arange(n_turns, dtype=np.int64) * 137_000  # 137ms steps

    return pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' -> 0.01"""
    base = os.path.basename(os.path.normpath(sf_dir))
    if not base.startswith("sf"):
        raise ValueError(f"not an sf dir: {sf_dir}")
    return float(base[2:])


def transcripts_dir_for(sf_dir: str, cache_root: str = DEFAULT_CACHE_ROOT) -> str:
    return os.path.join(cache_root, os.path.basename(os.path.normpath(sf_dir)))


def ensure_transcripts(
    sf_dir: str,
    n_turns: int | None = None,
    cache_root: str = DEFAULT_CACHE_ROOT,
    num_files: int | None = None,
) -> str:
    """Generate (once, atomically) the transcript corpus for an sf dir.

    Returns the directory containing ``part-*.parquet`` shards. Atomic via
    write-to-tempdir + rename, so concurrent callers and resumed runs see
    either nothing or the complete corpus.
    """
    out_dir = transcripts_dir_for(sf_dir, cache_root)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        return out_dir
    if n_turns is None:
        n_turns = max(1000, int(TURNS_PER_SF * sf_from_dir(sf_dir)))
    if num_files is None:
        num_files = num_files_for(n_turns)
    table = generate_transcripts(n_turns)
    os.makedirs(cache_root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=cache_root)
    try:
        rows_per = (table.num_rows + num_files - 1) // num_files
        for f in range(num_files):
            chunk = table.slice(f * rows_per, rows_per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk,
                os.path.join(tmp, f"part-{f:03d}.parquet"),
                row_group_size=ROW_GROUP_SIZE,
            )
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not (os.path.isdir(out_dir) and os.listdir(out_dir)):
            raise
    return out_dir
