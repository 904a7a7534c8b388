"""Dynamic external point-lookup join (ST1's live-store contract).

The reference's ``fetchDocSizes`` queries a LIVE external collection with
micro-batched ``$in`` point lookups and falls back to the oplog entry size
on a miss (TailCommand.java:398-463, 447).  ``stages/enrich.py`` grafts the
static small side of that join (broadcast once via ``ray.put``); this module
grafts the dynamic side: an actor-pool ``map_batches`` stage that

- opens ONE read-only connection to the store per actor (``__init__``),
- keeps a per-actor key cache so repeated conv_ids across batches never
  re-query the store (the reference's in-memory doc-size map),
- batch-queries only the cache misses, in bounded ``IN (...)`` micro-batches
  (the ``$in`` chunking; sqlite's host-parameter limit is the in-sandbox
  analogue of a real store's request-size cap), and
- joins vectorized (``pc.index_in`` over the batch's distinct keys), with
  store misses falling back to the event's own ``size``.

The in-sandbox store backend is sqlite (stdlib — the container has no
external service); the interface the stage needs is just
``SELECT key, value ... WHERE key IN (...)``, which is the shape of any
feature-store / document-store point-lookup API.  At cluster scale,
partition the stream by the lookup key first so each actor's cache has
locality, and size ``concurrency`` to the store's aggregate QPS budget.

Store synthesis: deterministic from the corpus (no external data) — conv
``n`` is present iff ``n % 10 != 7`` (a ~90% hit rate, so the miss-fallback
path is always exercised) with ``doc_size = 700 + (n * 37) % 5000``.  The
oracle re-derives the same contents inline in SQL (oracle.py
EXT_DOCSIZE_HOT_KEYS), so the whole lookup path is value-checked.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pyarrow as pa
import pyarrow.compute as pc

STORE_VERSION = 1
STORE_CACHE_ROOT = "/tmp/graft_ext_store_v%d" % STORE_VERSION
IN_CHUNK = 512  # keys per IN(...) micro-batch (sqlite host-param cap is 999)


def _store_doc_size(conv_num: int) -> int | None:
    """The deterministic store contents (mirrored in SQL by the oracle)."""
    if conv_num % 10 == 7:
        return None  # absent from the store → stage falls back to size
    return 700 + (conv_num * 37) % 5000


def ensure_store(sf_dir: str) -> str:
    """Build (once, atomically) the sqlite side store for an sf dir.

    In production the store simply exists (it is the external system); here
    it is synthesized from the corpus' distinct conv_ids — a bounded build:
    only the conv_id column is scanned, distinct'd in DuckDB, never the
    corpus rows."""
    import duckdb

    from ..synth import ensure_transcripts

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(STORE_CACHE_ROOT, f"{name}.db")
    if os.path.exists(path):
        return path
    corpus = ensure_transcripts(sf_dir)
    convs = duckdb.sql(
        "SELECT DISTINCT conv_id FROM "
        f"read_parquet('{os.path.join(corpus, 'part-*.parquet')}')"
    ).fetchall()
    os.makedirs(STORE_CACHE_ROOT, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=STORE_CACHE_ROOT, suffix=".db.tmp")
    os.close(fd)
    con = sqlite3.connect(tmp)
    con.execute(
        "CREATE TABLE doc_sizes (conv_id TEXT PRIMARY KEY, doc_size INTEGER)"
    )
    rows = []
    for (cid,) in convs:
        v = _store_doc_size(int(cid[4:]))
        if v is not None:
            rows.append((cid, v))
    con.executemany("INSERT INTO doc_sizes VALUES (?, ?)", rows)
    con.commit()
    con.close()
    os.replace(tmp, path)  # atomic: concurrent builders converge
    return path


class ExternalDocSizeStage:
    """Actor-pool stage: adds ``ext_doc_size`` (store value, miss → the
    event's own ``size``) and ``store_hit`` (int8 0/1) to each batch.

    Usage::

        db = ensure_store(sf_dir)                  # once, on the driver
        ds.map_batches(ExternalDocSizeStage,
                       fn_constructor_kwargs={"db_path": db},
                       batch_format="pyarrow", concurrency=(1, 4))
    """

    def __init__(self, db_path: str, in_chunk: int = IN_CHUNK):
        # one read-only connection per ACTOR, not per batch.  Ray actors
        # run __call__ on a worker thread distinct from __init__'s, so the
        # thread guard must be off (calls are serialized per actor — only
        # one batch is ever in flight on this connection).
        self._con = sqlite3.connect(
            f"file:{db_path}?mode=ro", uri=True, check_same_thread=False
        )
        self._in_chunk = in_chunk
        self._cache: dict[str, int | None] = {}  # None = confirmed miss
        self.store_queries = 0  # roundtrip counter (asserted in tests)

    def _fetch_misses(self, keys: list[str]) -> None:
        misses = [k for k in keys if k not in self._cache]
        for s in range(0, len(misses), self._in_chunk):
            chunk = misses[s : s + self._in_chunk]
            marks = ",".join("?" * len(chunk))
            found = dict(
                self._con.execute(
                    "SELECT conv_id, doc_size FROM doc_sizes "
                    f"WHERE conv_id IN ({marks})",
                    chunk,
                ).fetchall()
            )
            self.store_queries += 1
            for k in chunk:  # cache misses too: never re-ask the store
                self._cache[k] = found.get(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        uniq = pc.unique(batch.column("conv_id"))
        self._fetch_misses(uniq.to_pylist())
        vals = pa.array(
            [self._cache[k] for k in uniq.to_pylist()], pa.int64()
        )
        idx = pc.index_in(batch.column("conv_id"), value_set=uniq)
        looked = pc.take(vals, idx)
        hit = pc.cast(pc.is_valid(looked), pa.int8())
        ext = pc.coalesce(looked, pc.cast(batch.column("size"), pa.int64()))
        batch = batch.append_column("ext_doc_size", ext)
        return batch.append_column("store_hit", hit)
