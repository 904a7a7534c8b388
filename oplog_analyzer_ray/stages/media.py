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
import os

import pyarrow as pa

import ray.data
from ray.data import Dataset

# wide payloads → small batches so batch × concurrency fits worker heap
MEDIA_BATCH_SIZE = 64
FAKE_FRAME_BYTES = 1024


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
        payload = batch.column("payload").to_pylist()
        fps = [self._md5(p).hexdigest() for p in payload]
        n = [len(p) for p in payload]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": pa.array(n, pa.int64()),
                "fp8": pa.array([f[:8] for f in fps], pa.string()),
                "n_frames": pa.array(
                    [b // FAKE_FRAME_BYTES + 1 for b in n], pa.int64()
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
        mids, fidx, foff, fbytes, ffp = [], [], [], [], []
        ids = batch.column("media_id").to_pylist()
        for mid, p in zip(ids, batch.column("payload").to_pylist()):
            n_frames = len(p) // FAKE_FRAME_BYTES + 1
            for i in range(0, n_frames, FRAME_SAMPLE_EVERY):
                off = i * FAKE_FRAME_BYTES
                chunk = p[off : off + FAKE_FRAME_BYTES]
                mids.append(mid)
                fidx.append(i)
                foff.append(off)
                fbytes.append(len(chunk))
                ffp.append(self._md5(chunk).hexdigest()[:8])
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
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
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
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
        out = [p[::RESIZE_FACTOR] for p in batch.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, pa.binary()),
                "in_bytes": pa.array(
                    [len(p) for p in batch.column("payload").to_pylist()],
                    pa.int64(),
                ),
                "out_bytes": pa.array([len(p) for p in out], pa.int64()),
                "out_fp8": pa.array(
                    [self._md5(p).hexdigest()[:8] for p in out], pa.string()
                ),
            }
        )


def media_resize(sf_dir: str) -> Dataset:
    """Resize pipeline: payload → downsampled payload + metadata.  The
    query surface drops the binary column (oracle compares the metadata +
    fingerprint; the payload is the downstream input, not the report)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
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
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
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
