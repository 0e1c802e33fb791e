"""Real-codec tests: PNG/WAV round-trips and the Spark feature path.

The differential oracle covers the fake-decode path on opaque
payloads; these tests cover the REAL decode path with constructed
PNG and WAV fixtures, including pixel-exact reconstruction through
every PNG filter type and end-to-end dims through mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pytest

from calaveras_uniteus_etl_spark.functions import codecs
from calaveras_uniteus_etl_spark.operators.multimodal import (
    decode_media,
    extract_features,
)


def _rng(seed: int = 7) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_pixel_exact(channels):
    pixels = _rng(channels).integers(
        0, 256, size=(13, 9, channels), dtype=np.uint8
    )
    payload = codecs.encode_png(pixels)
    assert codecs.sniff_media(payload) == "png"
    out = codecs.decode_png(payload)
    assert (out["width"], out["height"], out["channels"]) == (9, 13, channels)
    np.testing.assert_array_equal(out["pixels"], pixels)


def test_png_all_filter_types_decode():
    """Exercise Sub/Up/Average/Paeth reconstruction, not just filter 0:
    re-encode rows with each filter type and check pixel equality."""
    import struct
    import zlib

    pixels = _rng(42).integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
    height, width, ch = pixels.shape
    stride = width * ch
    flat = pixels.reshape(height, stride).astype(np.int16)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        if ftype == 0:
            enc = line
        elif ftype == 1:
            left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
            enc = (line - left) % 256
        elif ftype == 2:
            enc = (line - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
            enc = (line - ((left + prev) >> 1)) % 256
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        codecs.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(payload)
    np.testing.assert_array_equal(out["pixels"], pixels)


def test_wav_roundtrip_sample_exact():
    samples = (
        (np.sin(np.linspace(0, 40 * np.pi, 32000)) * 20000)
        .astype(np.int16)
        .reshape(-1, 1)
    )
    payload = codecs.encode_wav(samples, sample_rate=16000)
    assert codecs.sniff_media(payload) == "wav"
    out = codecs.decode_wav(payload)
    assert out["sample_rate"] == 16000
    assert out["n_channels"] == 1
    assert out["n_frames"] == 32000
    assert out["duration_s"] == 2
    np.testing.assert_array_equal(out["samples"], samples)


def test_decode_media_dispatch_and_unknown():
    png = codecs.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert decode_media(png, "image")["width"] == 4
    with pytest.raises(ValueError):
        decode_media(b"not a media payload at all", "image")


def test_jpeg_without_pillow_yields_null_dims_not_fake(spark):
    """A recognized-but-undecodable payload must surface NULL dims
    (quarantine signal), never md5-derived fake dimensions."""
    fake_jpeg = codecs.JPEG_MAGIC + b"\x00" * 64
    df = spark.createDataFrame(
        [(1, bytearray(fake_jpeg), "image")],
        "doc_id long, payload binary, media_type string",
    )
    row = extract_features(df).collect()[0]
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        assert row.width is None and row.height is None
        assert row.n_bytes == len(fake_jpeg)


def test_extract_features_real_payloads_end_to_end(spark):
    png = codecs.encode_png(
        _rng(1).integers(0, 256, size=(33, 21, 3), dtype=np.uint8)
    )
    wav = codecs.encode_wav(
        _rng(2).integers(-30000, 30000, size=(48000, 2), dtype=np.int16),
        sample_rate=16000,
    )
    opaque = b"synthetic-not-a-media-file"
    df = spark.createDataFrame(
        [
            (1, bytearray(png), "image"),
            (2, bytearray(wav), "audio"),
            (3, bytearray(opaque), "image"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r.doc_id: r for r in extract_features(df).collect()}
    assert (rows[1].width, rows[1].height) == (21, 33)
    assert (rows[2].duration_s, rows[2].sample_rate) == (3, 16000)
    # opaque payload -> deterministic fake path (dims derived from md5)
    assert rows[3].width is not None and 1 <= rows[3].width <= 1920


def test_corrupt_payload_quarantines_instead_of_crashing(spark):
    """A payload with valid PNG magic but a truncated body must come
    back as a NULL-dims identity row, not kill the mapInPandas job."""
    from calaveras_uniteus_etl_spark.functions import codecs
    from calaveras_uniteus_etl_spark.operators.multimodal import extract_features

    good = codecs.encode_png([[0, 128], [255, 64]])
    corrupt = good[:20]  # magic + partial IHDR, truncated body
    media = spark.createDataFrame(
        [(1, bytearray(good), "image"), (2, bytearray(corrupt), "image")],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["width"] == 2 and rows[1]["height"] == 2
    # corrupt row survived the job with NULL dims (quarantine signal)
    assert rows[2]["width"] is None and rows[2]["height"] is None
    assert rows[2]["n_bytes"] == len(corrupt)


def test_subsecond_wav_duration_rounds_not_floors():
    from calaveras_uniteus_etl_spark.functions import codecs

    import numpy as np

    half_sec = codecs.encode_wav(np.zeros(8000, dtype=np.int16), 16000)
    assert codecs.decode_wav(half_sec)["duration_s"] == 1  # was 0 (floor)
    short = codecs.encode_wav(np.zeros(3000, dtype=np.int16), 16000)
    assert codecs.decode_wav(short)["duration_s"] == 0  # < 0.5 s rounds down
