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
