"""Real stdlib media decodes (binary PPM/PGM, WAV) end-to-end.

The media stages' driver queries run the deterministic stub codec (the text
corpus holds no real media); these tests pin the REAL decode path — stdlib
``wave`` + raw PNM byte parsing — through the same actor-pool pipeline, on
synthetic fixtures whose ground truth is computed independently here.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ppm_bytes(width: int, height: int, pixels: np.ndarray, comment=False) -> bytes:
    """Binary P6 with an optional header comment (the parser must skip it)."""
    hdr = b"P6\n"
    if comment:
        hdr += b"# synthetic fixture\n"
    hdr += f"{width} {height}\n255\n".encode()
    return hdr + pixels.astype(np.uint8).tobytes()


def _pgm16_bytes(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Binary P5 with maxval > 255 (big-endian 16-bit raster)."""
    return f"P5\n{width} {height}\n65535\n".encode() + pixels.astype(
        ">u2"
    ).tobytes()


def _wav_bytes(rate: int, samples: np.ndarray, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_ppm_decode_end_to_end(tmp_path):
    from oplog_analyzer_ray.stages.media import media_decode_features

    rng = np.random.RandomState(7)
    px_a = rng.randint(0, 256, size=(4, 3, 3))   # 3x4, RGB
    px_b = rng.randint(0, 256, size=(2, 5, 3))   # 5x2, RGB, comment header
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [
                        _ppm_bytes(3, 4, px_a),
                        _ppm_bytes(5, 2, px_b, comment=True),
                    ],
                    pa.binary(),
                ),
            }
        ),
        tmp_path / "media.parquet",
    )
    got = (
        media_decode_features(str(tmp_path / "media.parquet"), "ppm")
        .to_pandas()
        .set_index("media_id")
    )
    assert got.loc[1, ["width", "height", "maxval"]].tolist() == [3, 4, 255]
    assert got.loc[2, ["width", "height", "maxval"]].tolist() == [5, 2, 255]
    assert got.loc[1, "mean_value"] == float(px_a.astype(np.float64).mean())
    assert got.loc[2, "mean_value"] == float(px_b.astype(np.float64).mean())


def test_pgm16_decode(tmp_path):
    from oplog_analyzer_ray.stages.media import media_decode_features

    px = np.arange(12, dtype=np.int64).reshape(3, 4) * 1000  # 16-bit values
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([10], pa.int64()),
                "payload": pa.array([_pgm16_bytes(4, 3, px)], pa.binary()),
            }
        ),
        tmp_path / "media.parquet",
    )
    got = media_decode_features(str(tmp_path / "media.parquet"), "pgm").to_pandas()
    assert got.loc[0, ["width", "height", "maxval"]].tolist() == [4, 3, 65535]
    assert got.loc[0, "mean_value"] == float(px.astype(np.float64).mean())


def test_wav_decode_end_to_end(tmp_path):
    from oplog_analyzer_ray.stages.media import media_decode_features

    t = np.arange(800)
    sa = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype("<i2")
    sb = np.zeros(100, dtype="<i2")  # silence: rms == 0
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array(
                    [_wav_bytes(8000, sa), _wav_bytes(16000, sb)], pa.binary()
                ),
            }
        ),
        tmp_path / "media.parquet",
    )
    got = (
        media_decode_features(str(tmp_path / "media.parquet"), "wav")
        .to_pandas()
        .set_index("media_id")
    )
    assert got.loc[1, ["n_channels", "sample_rate", "n_samples"]].tolist() == [
        1,
        8000,
        800,
    ]
    assert got.loc[2, ["n_channels", "sample_rate", "n_samples"]].tolist() == [
        1,
        16000,
        100,
    ]
    want_rms = float(np.sqrt(np.mean(sa.astype(np.float64) ** 2)))
    assert abs(got.loc[1, "rms"] - want_rms) < 1e-9
    assert got.loc[2, "rms"] == 0.0


def test_unknown_codec_fails_fast():
    import pytest

    from oplog_analyzer_ray.stages.media import MediaFeatureStage

    with pytest.raises(NotImplementedError):
        MediaFeatureStage(codec="jpeg")


def test_corrupt_pnm_raises():
    import pytest

    from oplog_analyzer_ray.stages.media import _decode_pnm

    with pytest.raises(ValueError):
        _decode_pnm(memoryview(b"P6\n3 4\n255\nxx"), b"P6")  # truncated raster
    with pytest.raises(ValueError):
        _decode_pnm(memoryview(b"JUNK"), b"P6")  # wrong magic


def test_decode_features_empty_media_table_keeps_schema(tmp_path):
    """A zero-row media table must surface each codec's documented typed
    schema instead of a schema-less dataset (review finding: the real-codec
    pipeline was left out of the empty-pin hardening its three fake-codec
    siblings got)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oplog_analyzer_ray.stages.media import media_decode_features

    pq.write_table(
        pa.schema(
            [("media_id", pa.int64()), ("payload", pa.binary())]
        ).empty_table(),
        tmp_path / "media.parquet",
    )
    for codec, extra in (
        ("wav", ["n_channels", "sample_rate", "n_samples", "rms"]),
        ("ppm", ["width", "height", "maxval", "mean_value"]),
        ("pgm", ["width", "height", "maxval", "mean_value"]),
    ):
        out = media_decode_features(str(tmp_path / "media.parquet"), codec)
        assert out.schema().names == ["media_id", "n_bytes", "fp8"] + extra
        assert out.count() == 0
