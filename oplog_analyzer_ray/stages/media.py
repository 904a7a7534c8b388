"""Multimodal (binary-payload) stage plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed by
an actor-pool ``map_batches`` stage — the shape a real image/audio decode
stage would have (model/codec loaded once per actor in ``__init__``, small
batches because payloads are wide).

Codecs: this container has no image/audio libraries, so exotic formats stay
behind a fail-fast ``NotImplementedError`` boundary — but TWO real decodes
exist with stdlib only and are first-class codec choices:

- ``codec="ppm"`` / ``"pgm"``: binary PNM (P6/P5) parsed straight from the
  Arrow byte buffer (header token scan + numpy raster view) → real width /
  height / maxval / mean pixel value;
- ``codec="wav"``: RIFF WAVE via the stdlib ``wave`` module → real channel
  count / sample rate / sample count / RMS amplitude.

``codec=None`` keeps the deterministic fake decode (byte length, md5
fingerprint, fake frame count) used by the driver queries over the text
corpus (whose payloads are not media files).  The Ray-side plumbing —
schema, actor signature, batch size, output layout — is identical for all
codecs, and the fake features have an exact DuckDB oracle
(octet_length/md5), so the pipeline contract is verified end-to-end; the
real decodes are pinned by synthetic PPM/WAV fixtures in pytest
(tests/test_media_decode.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..pipelines.text import documents_path
from ..pipelines.agg import pin_schema as _pin_schema

# wide payloads → small batches so batch × concurrency fits worker heap
MEDIA_BATCH_SIZE = 64
FAKE_FRAME_BYTES = 1024

# documented output schemas, used as empty pins so a zero-row media input
# never surfaces a schema-less dataset (Ray skips actor UDFs on empty
# blocks and sort drops the empties)
_FEATURE_SCHEMA = pa.schema(
    [("media_id", pa.int64()), ("n_bytes", pa.int64()),
     ("fp8", pa.string()), ("n_frames", pa.int64())]
)
_FRAME_SCHEMA = pa.schema(
    [("media_id", pa.int64()), ("frame_idx", pa.int64()),
     ("frame_off", pa.int64()), ("frame_bytes", pa.int64()),
     ("frame_fp8", pa.string())]
)
_RESIZE_SCHEMA = pa.schema(
    [("media_id", pa.int64()), ("in_bytes", pa.int64()),
     ("out_bytes", pa.int64()), ("out_fp8", pa.string())]
)
_BASE_DECODE = [("media_id", pa.int64()), ("n_bytes", pa.int64()),
                ("fp8", pa.string())]
_DECODE_SCHEMAS = {
    "wav": pa.schema(
        _BASE_DECODE
        + [("n_channels", pa.int64()), ("sample_rate", pa.int64()),
           ("n_samples", pa.int64()), ("rms", pa.float64())]
    ),
    "ppm": pa.schema(
        _BASE_DECODE
        + [("width", pa.int64()), ("height", pa.int64()),
           ("maxval", pa.int64()), ("mean_value", pa.float64())]
    ),
}
_DECODE_SCHEMAS["pgm"] = _DECODE_SCHEMAS["ppm"]


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


def _decode_pnm(mv: memoryview, magic: bytes) -> tuple[int, int, int, float]:
    """Real binary-PNM decode from a zero-copy buffer slice: parse the
    whitespace/comment-tokenized header (P6=PPM RGB, P5=PGM gray), then view
    the raster as a numpy array (uint8, or big-endian uint16 when
    maxval > 255 — the PNM wire format).  Returns (width, height, maxval,
    mean pixel value).  Stdlib+numpy only — no image library."""
    b = bytes(mv[:2])
    if b != magic:
        raise ValueError(f"not a {magic.decode()} file (magic {b!r})")
    # header: magic, width, height, maxval as ASCII tokens; '#' starts a
    # comment running to end-of-line; ONE whitespace byte ends the header
    vals: list[int] = []
    i = 2
    n = len(mv)
    while len(vals) < 3:
        while i < n and mv[i : i + 1].tobytes().isspace():
            i += 1
        if i < n and mv[i] == ord("#"):
            while i < n and mv[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and not mv[j : j + 1].tobytes().isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(bytes(mv[i:j])))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = vals
    n_ch = 3 if magic == b"P6" else 1
    n_px = width * height * n_ch
    raster = np.frombuffer(mv, dtype=(">u2" if maxval > 255 else np.uint8),
                           count=n_px, offset=i)
    if raster.size != n_px:
        raise ValueError("truncated PNM raster")
    mean = float(raster.astype(np.float64).mean()) if n_px else 0.0
    return width, height, maxval, mean


def _decode_wav(mv: memoryview) -> tuple[int, int, int, float]:
    """Real WAV decode via the stdlib ``wave`` module: returns
    (n_channels, sample_rate, n_samples, RMS amplitude) with samples
    normalized to centered ints (8-bit WAV is unsigned — recentred at 0)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(mv))) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return nch, rate, nf, rms


class MediaFeatureStage:
    """Actor-pool feature extractor over binary payloads.

    ``codec=None`` uses the deterministic fake decode (the text-corpus
    driver queries); ``"ppm"``/``"pgm"``/``"wav"`` run the REAL stdlib
    decoders above (per-payload loop — a payload is one opaque media file,
    so the decode is inherently per-row; it IS the work of this stage);
    any other codec raises at actor construction — the boundary is
    explicit and fails fast, not silently wrong.
    """

    _REAL = ("ppm", "pgm", "wav")

    def __init__(self, codec: str | None = None):
        if codec is not None and codec not in self._REAL:
            raise NotImplementedError(
                f"media codec {codec!r} not available in this environment; "
                f"supported: None (deterministic stub) or {self._REAL}"
            )
        self._codec = codec
        self._md5 = hashlib.md5  # "codec" loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, mv, _ = _payload_view(batch)
        md5 = self._md5
        fp8 = [
            md5(mv[offs[i] : offs[i + 1]]).hexdigest()[:8]
            for i in range(batch.num_rows)
        ]
        lens = offs[1:] - offs[:-1]
        base = {
            "media_id": batch.column("media_id"),
            "n_bytes": pa.array(lens, pa.int64()),
            "fp8": pa.array(fp8, pa.string()),
        }
        if self._codec is None:
            return pa.table(
                base
                | {
                    "n_frames": pa.array(
                        lens // FAKE_FRAME_BYTES + 1, pa.int64()
                    )
                }
            )
        rows = [mv[offs[i] : offs[i + 1]] for i in range(batch.num_rows)]
        if self._codec == "wav":
            dec = [_decode_wav(r) for r in rows]
            return pa.table(
                base
                | {
                    "n_channels": pa.array([d[0] for d in dec], pa.int64()),
                    "sample_rate": pa.array([d[1] for d in dec], pa.int64()),
                    "n_samples": pa.array([d[2] for d in dec], pa.int64()),
                    "rms": pa.array([d[3] for d in dec], pa.float64()),
                }
            )
        magic = b"P6" if self._codec == "ppm" else b"P5"
        dec = [_decode_pnm(r, magic) for r in rows]
        return pa.table(
            base
            | {
                "width": pa.array([d[0] for d in dec], pa.int64()),
                "height": pa.array([d[1] for d in dec], pa.int64()),
                "maxval": pa.array([d[2] for d in dec], pa.int64()),
                "mean_value": pa.array([d[3] for d in dec], pa.float64()),
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
    from ..pipelines.corpus import clean_read_schema

    docs = ray.data.read_parquet(
        documents_path(sf_dir),
        columns=["doc_id", "text"],
        schema=clean_read_schema(sf_dir, "documents", ["doc_id", "text"]),
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    # pin: an empty documents corpus yields only skipped (schema-less)
    # actor-stage outputs, and the sort drops them
    return _pin_schema(
        docs.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            MediaFrameSampleStage,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        )
        .sort(["media_id", "frame_idx"]),
        _FRAME_SCHEMA,
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
    from ..pipelines.corpus import clean_read_schema

    docs = ray.data.read_parquet(
        documents_path(sf_dir),
        columns=["doc_id", "text"],
        schema=clean_read_schema(sf_dir, "documents", ["doc_id", "text"]),
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    return _pin_schema(
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
        .sort(["media_id"]),
        _RESIZE_SCHEMA,
    )


def media_features(sf_dir: str) -> Dataset:
    """documents.text re-encoded as a binary payload column → actor-pool
    feature extraction.  Oracle: octet_length/md5 SQL over the same rows."""
    from ..pipelines.corpus import clean_read_schema

    docs = ray.data.read_parquet(
        documents_path(sf_dir),
        columns=["doc_id", "text"],
        schema=clean_read_schema(sf_dir, "documents", ["doc_id", "text"]),
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary()),
            }
        )

    return _pin_schema(
        docs.map_batches(to_payload, batch_format="pyarrow").map_batches(
            MediaFeatureStage,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        ),
        _FEATURE_SCHEMA,
    )


def media_decode_features(media_path: str, codec: str) -> Dataset:
    """END-TO-END REAL DECODE pipeline: a parquet table of
    ``(media_id int64, payload binary)`` rows — actual PPM/PGM/WAV file
    bytes — through the same actor-pool stage as :func:`media_features`,
    with the named real codec.  This is the production shape for a media
    corpus: payloads stay opaque binary through the scan, decode once per
    actor-pool batch, only typed features leave the stage."""
    return _pin_schema(
        ray.data.read_parquet(media_path, columns=["media_id", "payload"])
        .map_batches(
            MediaFeatureStage,
            fn_constructor_kwargs={"codec": codec},
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
        )
        .sort(["media_id"]),
        _DECODE_SCHEMAS[codec],
    )
