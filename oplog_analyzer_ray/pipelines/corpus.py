"""Side-table corpus layout resolution shared by documents / events /
embeddings.

One layout contract everywhere: ``<name>.parquet`` (what the synthetic sf
dirs ship) or a ``<name>/`` directory of parquet files (what a real
multi-file corpus looks like).  Footer-level helpers (row counts, byte
sizes) iterate the file list so they stay bounded per FILE, never per
corpus.
"""

from __future__ import annotations

import os


def corpus_path(sf_dir: str, name: str) -> str:
    """``<sf_dir>/<name>.parquet`` if it exists, else ``<sf_dir>/<name>/``
    if that directory exists, else the single-file path (letting the read
    raise the canonical file-not-found)."""
    single = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.exists(single):
        return single
    multi = os.path.join(sf_dir, name)
    if os.path.isdir(multi):
        return multi
    return single


def corpus_files(sf_dir: str, name: str) -> list[str]:
    """The corpus parquet files, sorted (single-element list for the
    single-file layout)."""
    p = corpus_path(sf_dir, name)
    if os.path.isdir(p):
        return sorted(
            os.path.join(p, e.name)
            for e in os.scandir(p)
            if e.name.endswith(".parquet")
        )
    return [p]


def corpus_rows(sf_dir: str, name: str) -> int:
    """Total rows from the parquet footers — no data scan."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows for f in corpus_files(sf_dir, name)
    )


def corpus_bytes(sf_dir: str, name: str) -> int:
    """On-disk corpus size summed across however many files it spans."""
    return sum(os.path.getsize(f) for f in corpus_files(sf_dir, name))


def clean_read_schema(sf_dir: str, name: str, columns: list[str] | None):
    """Metadata-free Arrow schema for ``read_parquet(columns=...)`` —
    pruned to the selected columns (Ray requires schema ≡ selection).

    Why: corpora written via pandas carry ``b'pandas'`` schema metadata, and
    a ``pa.Schema`` WITH metadata is unhashable (``hash()`` raises
    "unhashable type: 'dict'") — Ray's read/sort schema-dedup then logs a
    warning per block bundle.  Passing the stripped schema at the scan
    keeps every downstream block metadata-free.  Footer-only: no data scan.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = pq.read_schema(corpus_files(sf_dir, name)[0]).remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])
