"""Multimodal (binary-payload) stage plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed by
an actor-pool ``map_batches`` stage — the shape a real image/audio decode
stage would have (model/codec loaded once per actor in ``__init__``, small
batches because payloads are wide).

The actual codec is STUBBED: this container has no image/audio libraries, so
``MediaFeatureStage`` ships a deterministic fake "decode" (byte length, md5
fingerprint, fake frame count) and raises ``NotImplementedError`` if a real
codec is requested.  The Ray-side plumbing — schema, actor signature, batch
size, output layout — is real and tested, and the fake features have an
exact DuckDB oracle (octet_length/md5), so the pipeline contract is verified
end-to-end even without a codec.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..pipelines.text import documents_path

# wide payloads → small batches so batch × concurrency fits worker heap
MEDIA_BATCH_SIZE = 64
FAKE_FRAME_BYTES = 1024


def _payload_view(batch: pa.Table, name: str = "payload"):
    """Zero-copy view over a non-null binary column: ``(offsets, mv, bytes)``
    where ``offsets`` is the int64 row-boundary array, ``mv`` a memoryview of
    the value buffer (slice it for per-row hashing — no bytes copy) and
    ``bytes`` the same buffer as a numpy uint8 array (fancy-index it for
    vectorized byte gathers).  This is the shape a real codec stage should
    consume: Arrow buffer slices, not ``to_pylist()`` Python bytes copies."""
    a = batch.column(name).combine_chunks()
    if isinstance(a, pa.ChunkedArray):
        a = (
            a.chunk(0)
            if a.num_chunks
            else pa.array([], type=a.type)
        )
    dt = np.int64 if pa.types.is_large_binary(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=dt)[
        a.offset : a.offset + len(a) + 1
    ].astype(np.int64)
    buf = a.buffers()[2]
    mv = memoryview(buf) if buf is not None else memoryview(b"")
    data = np.frombuffer(mv, dtype=np.uint8)
    return offs, mv, data


def _ragged_arange(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, within_row_index) for a ragged explode of ``counts``."""
    total = int(counts.sum())
    row = np.repeat(np.arange(len(counts)), counts)
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return row, within


class MediaFeatureStage:
    """Actor-pool feature extractor over binary payloads.

    ``codec=None`` (the only supported value here) uses the deterministic
    fake decode; any real codec name raises at actor construction — the
    stub boundary is explicit and fails fast, not silently wrong.
    """

    def __init__(self, codec: str | None = None):
        if codec is not None:
            raise NotImplementedError(
                f"media codec {codec!r} not available in this environment; "
                "only the deterministic stub (codec=None) is supported"
            )
        self._md5 = hashlib.md5  # "codec" loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, mv, _ = _payload_view(batch)
        md5 = self._md5
        fp8 = [
            md5(mv[offs[i] : offs[i + 1]]).hexdigest()[:8]
            for i in range(batch.num_rows)
        ]
        lens = offs[1:] - offs[:-1]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": pa.array(lens, pa.int64()),
                "fp8": pa.array(fp8, pa.string()),
                "n_frames": pa.array(
                    lens // FAKE_FRAME_BYTES + 1, pa.int64()
                ),
            }
        )


FRAME_SAMPLE_EVERY = 4  # keep every 4th fake frame


class MediaFrameSampleStage:
    """Actor-pool frame sampler: explodes each payload into its sampled
    frame rows (len(out) >= len(in) — the video-frame-sampling shape).  A
    "frame" in the stub is a FAKE_FRAME_BYTES byte slice; the slicing,
    per-frame fingerprinting, row explosion and small-batch actor plumbing
    are exactly what a real decoder stage needs, with the codec itself
    behind the same fail-fast stub boundary as MediaFeatureStage."""

    def __init__(self, codec: str | None = None):
        if codec is not None:
            raise NotImplementedError(
                f"media codec {codec!r} not available in this environment; "
                "only the deterministic stub (codec=None) is supported"
            )
        self._md5 = hashlib.md5

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, mv, _ = _payload_view(batch)
        lens = offs[1:] - offs[:-1]
        n_frames = lens // FAKE_FRAME_BYTES + 1
        n_samp = (n_frames + FRAME_SAMPLE_EVERY - 1) // FRAME_SAMPLE_EVERY
        row, within = _ragged_arange(n_samp)
        fidx = within * FRAME_SAMPLE_EVERY
        foff = fidx * FAKE_FRAME_BYTES
        fbytes = np.minimum(lens[row] - foff, FAKE_FRAME_BYTES)
        starts = offs[:-1][row] + foff
        md5 = self._md5
        ffp = [
            md5(mv[s : s + n]).hexdigest()[:8]
            for s, n in zip(starts, fbytes)
        ]
        return pa.table(
            {
                "media_id": pc.take(
                    batch.column("media_id"), pa.array(row, pa.int64())
                ),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_off": pa.array(foff, pa.int64()),
                "frame_bytes": pa.array(fbytes, pa.int64()),
                "frame_fp8": pa.array(ffp, pa.string()),
            }
        )


def media_frame_sample(sf_dir: str) -> Dataset:
    """Frame-sampling pipeline: payload → every-4th-frame rows with per-
    frame byte-slice fingerprints.  Oracle: unnest(range(...)) + BLOB
    substring/md5 SQL over the same rows."""
    docs = ray.data.read_parquet(
        documents_path(sf_dir), columns=["doc_id", "text"]
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    return (
        docs.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            MediaFrameSampleStage,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        )
        .sort(["media_id", "frame_idx"])
    )


RESIZE_FACTOR = 2  # fake "resolution" downsample: keep every 2nd byte


class MediaResizeStage:
    """Actor-pool resize: payload in, (smaller) payload out — the binary-
    OUT pattern the other media stages don't exercise (wide outputs need
    the same small-batch discipline as wide inputs).  The stub 'resize'
    keeps every RESIZE_FACTOR-th byte (deterministic, size-halving); a
    real image resize slots in behind the same codec boundary."""

    def __init__(self, codec: str | None = None):
        if codec is not None:
            raise NotImplementedError(
                f"media codec {codec!r} not available in this environment; "
                "only the deterministic stub (codec=None) is supported"
            )
        self._md5 = hashlib.md5

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, _, data = _payload_view(batch)
        lens = offs[1:] - offs[:-1]
        # every-RESIZE_FACTOR-th byte of each payload, as ONE vectorized
        # gather over the shared value buffer (== p[::RESIZE_FACTOR] per row)
        out_lens = (lens + RESIZE_FACTOR - 1) // RESIZE_FACTOR
        row, within = _ragged_arange(out_lens)
        src = offs[:-1][row] + within * RESIZE_FACTOR
        out_data = np.ascontiguousarray(data[src]) if len(src) else np.empty(0, np.uint8)
        out_offs = np.zeros(len(lens) + 1, dtype=np.int32)
        np.cumsum(out_lens, out=out_offs[1:])
        out_arr = pa.Array.from_buffers(
            pa.binary(),
            len(lens),
            [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(out_data.tobytes())],
        )
        mv = memoryview(out_data)
        md5 = self._md5
        fp8 = [
            md5(mv[out_offs[i] : out_offs[i + 1]]).hexdigest()[:8]
            for i in range(len(lens))
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": out_arr,
                "in_bytes": pa.array(lens, pa.int64()),
                "out_bytes": pa.array(out_lens, pa.int64()),
                "out_fp8": pa.array(fp8, pa.string()),
            }
        )


def media_resize(sf_dir: str) -> Dataset:
    """Resize pipeline: payload → downsampled payload + metadata.  The
    query surface drops the binary column (oracle compares the metadata +
    fingerprint; the payload is the downstream input, not the report)."""
    docs = ray.data.read_parquet(
        documents_path(sf_dir), columns=["doc_id", "text"]
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    return (
        docs.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            MediaResizeStage,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        )
        .map_batches(
            lambda t: t.drop_columns(["payload"]), batch_format="pyarrow"
        )
        .sort(["media_id"])
    )


def media_features(sf_dir: str) -> Dataset:
    """documents.text re-encoded as a binary payload column → actor-pool
    feature extraction.  Oracle: octet_length/md5 SQL over the same rows."""
    docs = ray.data.read_parquet(
        documents_path(sf_dir), columns=["doc_id", "text"]
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    return docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )
