"""Real-codec tests: PNG/WAV round-trips and the Spark feature path.

The differential oracle covers the fake-decode path on opaque
payloads; these tests cover the REAL decode path with constructed
PNG and WAV fixtures, including pixel-exact reconstruction through
every PNG filter type and end-to-end dims through mapInPandas.
"""

from __future__ import annotations

import time

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


# --- baseline JPEG codec (functions/jpeg.py) --------------------------------


def test_jpeg_dct_basis_is_orthonormal():
    from calaveras_uniteus_etl_spark.functions.jpeg import fdct_2d, idct_2d

    blk = _rng(3).uniform(-128, 127, (8, 8))
    np.testing.assert_allclose(idct_2d(fdct_2d(blk)), blk, atol=1e-9)


def test_jpeg_uniform_image_decodes_to_hand_computed_value():
    """DC-only path with a hand-checkable expectation: a uniform block
    quantizes to one DC coefficient, so every decoded pixel equals
    clip(round(q00*round(8*(v-128)/q00)/8)+128) exactly."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        QUANT_LUMA,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    q00 = int(QUANT_LUMA[0, 0])
    for v in (0, 73, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg_baseline(img))
        dc = round(8 * (v - 128) / q00) * q00
        expect = min(255, max(0, round(dc / 8) + 128))
        assert out["pixels"].shape == (16, 24, 1)
        assert np.all(out["pixels"] == expect), (v, expect)


def test_jpeg_grayscale_roundtrip_bounded_error():
    """Smooth gradient with non-multiple-of-8 dims: decode must be
    within tight quantization error of the source."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    img = (np.add.outer(np.arange(37), np.arange(53)) * 2 % 256).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert (out["width"], out["height"], out["channels"]) == (53, 37, 1)
    err = np.abs(out["pixels"][:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 16, err.max()


@pytest.mark.parametrize("mode", ["444", "420", "422"])
def test_jpeg_rgb_roundtrip_all_subsamplings(mode):
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    r = np.tile(np.linspace(0, 255, 40), (32, 1))
    g = np.tile(np.linspace(0, 255, 32)[:, None], (1, 40))
    b = np.full((32, 40), 90.0)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    out = decode_jpeg(
        encode_jpeg_baseline(
            img,
            subsample_420=(mode == "420"),
            subsample_422=(mode == "422"),
        )
    )
    assert (out["width"], out["height"], out["channels"]) == (40, 32, 3)
    err = np.abs(out["pixels"].astype(int) - img.astype(int))
    assert err.max() <= (12 if mode == "444" else 20), (mode, err.max())


def test_jpeg_sos_order_differs_from_sof_order():
    """ISO 10918-1 §B.2.3: the entropy stream interleaves components in
    SOS scan-list order, which may differ from SOF frame order. A
    decoder that walks frame order assigns Cb/Cr data to the wrong
    planes — colors swap. The strongly-colored fixture makes that
    failure visible (error would be ~hundreds, not <=12)."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    r = np.tile(np.linspace(0, 255, 40), (32, 1))
    g = np.tile(np.linspace(0, 255, 32)[:, None], (1, 40))
    b = np.full((32, 40), 90.0)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    for order in ((2, 0, 1), (1, 2, 0), (2, 1, 0)):
        out = decode_jpeg(encode_jpeg_baseline(img, scan_order=order))
        err = np.abs(out["pixels"].astype(int) - img.astype(int))
        assert err.max() <= 12, (order, err.max())
    # subsampled variant too: the scan-order walk must compose with
    # per-component block grids
    out = decode_jpeg(
        encode_jpeg_baseline(img, subsample_420=True, scan_order=(2, 0, 1))
    )
    err = np.abs(out["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 20, err.max()


def test_jpeg_cmyk_and_ycck_roundtrip():
    """4-component JPEG: plain CMYK (Adobe transform 0) and YCCK
    (transform 2, the Photoshop default — YCbCr of the inverted CMY,
    K untouched). Decode reports channels=4 / colorspace 'cmyk' with
    quantization-bounded error, and the progressive twin stays
    pixel-exact to baseline for both transforms."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    c = np.tile(np.linspace(0, 255, 40), (32, 1))
    img = np.stack(
        [c, np.flipud(c), np.full((32, 40), 80.0), np.fliplr(c)], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img))
    assert (out["channels"], out["colorspace"]) == (4, "cmyk")
    assert np.abs(out["pixels"].astype(int) - img.astype(int)).max() <= 12
    outy = decode_jpeg(encode_jpeg_baseline(img, ycck=True))
    assert (outy["channels"], outy["colorspace"]) == (4, "cmyk")
    assert np.abs(outy["pixels"].astype(int) - img.astype(int)).max() <= 16
    noise = _rng(23).integers(0, 256, size=(24, 33, 4), dtype=np.uint8)
    for kw in ({}, {"ycck": True}):
        base = decode_jpeg(encode_jpeg_baseline(noise, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(noise, **kw))
        assert np.array_equal(base["pixels"], prog["pixels"]), kw
    with pytest.raises(ValueError):  # subsampling is a YCbCr-only knob
        encode_jpeg_baseline(img, subsample_420=True)


def test_jpeg_restart_markers_roundtrip():
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    r = np.tile(np.linspace(0, 255, 40), (32, 1))
    g = np.tile(np.linspace(0, 255, 32)[:, None], (1, 40))
    b = np.full((32, 40), 90.0)
    img = np.stack([r, g, b], axis=2).astype(np.uint8)
    for interval in (1, 3, 7):
        out = decode_jpeg(encode_jpeg_baseline(img, restart_interval=interval))
        err = np.abs(out["pixels"].astype(int) - img.astype(int))
        assert err.max() <= 12, (interval, err.max())


def test_jpeg_corrupt_and_unsupported_streams():
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):  # magic + garbage marker stream
        decode_jpeg(codecs.JPEG_MAGIC + b"\x00" * 64)
    good = bytearray(encode_jpeg_baseline(np.full((8, 8), 99, np.uint8)))
    with pytest.raises(ValueError):  # truncated entropy stream
        decode_jpeg(bytes(good[: len(good) // 2]))
    # a baseline stream relabeled SOF2 is a MALFORMED progressive
    # stream (its single scan claims the full 0..63 band, illegal for
    # a progressive DC scan) -> typed ValueError, quarantined
    sof0 = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:sof0]) + b"\xff\xc2" + bytes(good[sof0 + 2 :])
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # genuinely unsupported SOF variants still raise NotImplementedError
    loss = bytes(good[:sof0]) + b"\xff\xc3" + bytes(good[sof0 + 2 :])
    with pytest.raises(NotImplementedError):
        decode_jpeg(loss)


def test_jpeg_progressive_decodes_pixel_exact_to_baseline():
    """SOF2 and SOF0 carry the SAME quantized coefficients for the
    same input, so the two decodes must agree pixel-for-pixel — across
    color/gray, every subsampling, flat + noise content (EOB runs,
    ZRL, deep refinement), odd dims, and restart markers."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = _rng(11)
    noise = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    half = np.full((64, 64, 3), 200, np.uint8)
    half[32:] = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
    gray = np.outer(np.linspace(0, 255, 17), np.ones(23)).astype(np.uint8)
    cases = [
        (noise, {}),
        (noise, {"subsample_420": True}),
        (noise, {"subsample_422": True}),
        (half, {}),                      # long EOB runs then dense AC
        (np.full((128, 96, 3), 77, np.uint8), {}),  # all-EOB scans
        (gray, {}),
        (rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8), {}),
        (np.array([[[10, 200, 30]]], dtype=np.uint8), {}),
        (noise, {"restart_interval": 3}),
        (noise, {"subsample_420": True, "restart_interval": 2}),
    ]
    for img, kw in cases:
        base = decode_jpeg(encode_jpeg_baseline(img, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(img, **kw))
        assert np.array_equal(base["pixels"], prog["pixels"]), kw
        assert (prog["width"], prog["height"]) == (
            img.shape[1], img.shape[0],
        )


def test_jpeg_progressive_flows_through_extract_features(spark):
    """A progressive payload comes back with REAL dimensions through
    the mapInPandas extractor — no Pillow, no stub."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )

    img = _rng(13).integers(0, 256, size=(19, 27, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img)
    assert codecs.sniff_media(payload) == "jpeg"
    df = spark.createDataFrame(
        [(1, bytearray(payload), "image")],
        "doc_id long, payload binary, media_type string",
    )
    row = extract_features(df).collect()[0]
    assert (row.width, row.height) == (27, 19)


def test_jpeg_flows_through_extract_features(spark):
    """End-to-end: a real baseline JPEG payload comes back with REAL
    dimensions through the mapInPandas feature extractor — the path
    that previously required Pillow."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    img = _rng(9).integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    payload = encode_jpeg_baseline(img)
    assert codecs.sniff_media(payload) == "jpeg"
    df = spark.createDataFrame(
        [(1, bytearray(payload), "image")],
        "doc_id long, payload binary, media_type string",
    )
    row = extract_features(df).collect()[0]
    assert (row.width, row.height) == (17, 24)


def test_jpeg_decode_media_dispatch():
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    img = np.full((8, 8), 50, dtype=np.uint8)
    out = decode_media(encode_jpeg_baseline(img), "image")
    assert (out["width"], out["height"], out["channels"]) == (8, 8, 1)


# --- container metadata: MP4 box tree + MP3 frame header --------------------


def _box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + btype + body


def _make_mp4(
    duration_ms: int = 5000, width: int = 640, height: int = 360,
    audio_rate: int = 48000,
) -> bytes:
    """Minimal ISO-BMFF fixture: ftyp + moov(mvhd, video trak, audio
    trak), all headers spec-shaped (14496-12)."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # ctime, mtime
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + b"\x00" * 80,                          # rate..next_track_id
    )
    tkhd_v = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72
        + struct.pack(">II", width << 16, height << 16),
    )
    trak_v = _box(b"trak", tkhd_v)
    tkhd_a = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72 + struct.pack(">II", 0, 0),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", audio_rate, audio_rate * 5) + b"\x00" * 4,
    )
    hdlr = _box(
        b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"SoundHandler\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    trak_a = _box(b"trak", tkhd_a + mdia)
    moov = _box(b"moov", mvhd + trak_v + trak_a)
    return ftyp + moov


def _make_mp3(n_bytes: int = 32000, with_id3: bool = True) -> bytes:
    """CBR MPEG1 Layer III 128 kbps 44.1 kHz stream: a sync header at
    every 417-byte frame boundary (as a real CBR encoder emits), last
    frame truncated to hit n_bytes exactly."""
    id3 = b""
    if with_id3:
        tag_body = b"\x00" * 100
        id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 100 >> 7, 100 & 0x7F]) + tag_body
    # sync=FFF, MPEG1 (11), Layer III (01), no CRC (1) -> 0xFF 0xFB
    # bitrate idx 9 (128 kbps), samplerate idx 0 (44100), no padding
    # frame length = 144 * 128000 // 44100 = 417 bytes
    header = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = header + b"\x00" * (417 - len(header))
    audio_len = n_bytes - len(id3)
    n_frames = -(-audio_len // len(frame))  # ceil
    return id3 + (frame * n_frames)[:audio_len]


def test_mp4_metadata_parses_natively():
    from calaveras_uniteus_etl_spark.functions.containers import (
        parse_mp4_meta,
    )

    payload = _make_mp4(duration_ms=7499, width=1280, height=720,
                        audio_rate=44100)
    assert codecs.sniff_media(payload) == "mp4"
    meta = parse_mp4_meta(payload)
    assert meta["duration_s"] == 7  # 7.499 s rounds half-up to 7
    assert (meta["width"], meta["height"]) == (1280, 720)
    assert meta["sample_rate"] == 44100


def test_mp3_metadata_parses_natively():
    from calaveras_uniteus_etl_spark.functions.containers import (
        parse_mp3_meta,
    )

    payload = _make_mp3(n_bytes=32000)  # ~2 s at 128 kbps
    assert codecs.sniff_media(payload) == "mp3"
    meta = parse_mp3_meta(payload)
    assert meta["sample_rate"] == 44100
    assert meta["duration_s"] == 2
    bare = _make_mp3(n_bytes=160000, with_id3=False)  # 10 s, no ID3
    assert codecs.sniff_media(bare) == "mp3"
    assert parse_mp3_meta(bare)["duration_s"] == 10


def test_mp3_sniff_rejects_sync_lookalikes():
    """A payload that merely starts with 0xFF 0xEx sync bits must NOT
    classify as mp3 (it would be misrouted off the deterministic
    fake-decode path): the sniff demands non-reserved bitrate and
    samplerate indices AND a second valid header at the computed frame
    boundary when the payload extends past one frame."""
    from calaveras_uniteus_etl_spark.functions.containers import sniff_mp3

    # valid sync + version/layer but reserved bitrate index (0xF_)
    assert not sniff_mp3(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 4096)
    # free-format bitrate index 0 — rejected (length not computable)
    assert not sniff_mp3(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 4096)
    # reserved samplerate index (..11..)
    assert not sniff_mp3(bytes([0xFF, 0xFB, 0x9C, 0x00]) + b"\x00" * 4096)
    # fully valid first header but garbage where frame 2's sync should
    # be (417-byte MPEG1 L3 frame at 128 kbps / 44.1 kHz)
    assert not sniff_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 4096)
    # genuine multi-frame stream still sniffs
    assert sniff_mp3(_make_mp3(n_bytes=4096, with_id3=False))
    # single truncated frame accepted on the first header alone
    assert sniff_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 100)


def test_mp3_layer2_frame_header_parses():
    """Layer II CBR: bitrate table and 144-factor frame length differ
    from Layer III; the parser reports real duration/sample rate."""
    from calaveras_uniteus_etl_spark.functions.containers import (
        parse_mp3_meta,
        sniff_mp3,
    )

    # sync=FFF, MPEG1 (11), Layer II (10), no CRC (1) -> 0xFF 0xFD
    # bitrate idx 12 (256 kbps), samplerate idx 1 (48000), no padding
    # frame length = 144 * 256000 // 48000 = 768 bytes
    header = bytes([0xFF, 0xFD, 0xC4, 0x00])
    frame = header + b"\x00" * (768 - len(header))
    payload = frame * 42  # 32256 bytes ~= 1.008 s at 256 kbps
    assert sniff_mp3(payload)
    meta = parse_mp3_meta(payload)
    assert meta["sample_rate"] == 48000
    assert meta["duration_s"] == 1


def test_container_metadata_flows_through_extract_features(spark):
    mp4 = _make_mp4(duration_ms=5000, width=640, height=360)
    mp3 = _make_mp3(n_bytes=48000)  # 3 s at 128 kbps
    corrupt_mp4 = mp4[:16]  # ftyp only, no moov
    df = spark.createDataFrame(
        [
            (1, bytearray(mp4), "video"),
            (2, bytearray(mp3), "audio"),
            (3, bytearray(corrupt_mp4), "video"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r.doc_id: r for r in extract_features(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].duration_s) == (
        640, 360, 5,
    )
    assert (rows[2].sample_rate, rows[2].duration_s) == (44100, 3)
    # corrupt container quarantines with NULL dims, real identity
    assert rows[3].width is None and rows[3].duration_s is None
    assert rows[3].n_bytes == len(corrupt_mp4)


def test_container_sample_decode_stays_honest():
    with pytest.raises(NotImplementedError):
        decode_media(_make_mp4(), "video")
    with pytest.raises(NotImplementedError):
        decode_media(_make_mp3(), "audio")


def test_mp4_box_order_and_largesize_robustness():
    """moov placement and 64-bit largesize boxes must not confuse the
    walk; trailing mdat junk is ignored."""
    import struct

    base = _make_mp4(duration_ms=3000, width=320, height=240)
    ftyp_end = 8 + struct.unpack(">I", base[0:4])[0] - 8  # end of ftyp
    ftyp, moov = base[:ftyp_end], base[ftyp_end:]
    mdat = _box(b"mdat", b"\x00" * 64)
    # largesize wrapper: size=1 + 64-bit size field
    big_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 32)
        + b"\x00" * 32
    )
    from calaveras_uniteus_etl_spark.functions.containers import (
        parse_mp4_meta,
    )

    for payload in (
        ftyp + mdat + moov,            # moov after mdat (streaming layout)
        ftyp + big_mdat + moov,        # 64-bit largesize box before moov
        ftyp + moov + mdat,            # trailing data
    ):
        meta = parse_mp4_meta(payload)
        assert meta["duration_s"] == 3
        assert (meta["width"], meta["height"]) == (320, 240)


def test_mp3_sync_search_skips_leading_junk():
    """The frame-sync scan must tolerate non-frame bytes between the
    ID3 tag and the first frame header (padding, encoder junk)."""
    from calaveras_uniteus_etl_spark.functions.containers import (
        parse_mp3_meta,
    )

    body = _make_mp3(n_bytes=32000, with_id3=False)
    junk = b"\x00LAME3.100\x00\x00" 
    payload = body[:0] + junk + body  # junk before the first sync
    meta = parse_mp3_meta(payload)
    assert meta["sample_rate"] == 44100


def test_quarantine_contract_fuzz():
    """THE 100-TB property: _real_features must never raise for ANY
    corruption of a valid payload (or pure random bytes) — a typed
    codec error quarantines the row; anything else would kill the
    whole mapInPandas batch. Seeded corpus: byte flips, truncations,
    extensions, splices over every supported format."""
    import random
    import struct

    from calaveras_uniteus_etl_spark.functions.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )
    from calaveras_uniteus_etl_spark.operators import multimodal as mm

    img = _rng(0).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    samples = _rng(1).integers(-3000, 3000, 8000, dtype=np.int16)
    valid = {
        "png": codecs.encode_png(img),
        "wav": codecs.encode_wav(samples, 16000),
        "jpeg": encode_jpeg_baseline(img),
        "jpeg420rst": encode_jpeg_baseline(
            img, subsample_420=True, restart_interval=2
        ),
        "jpegprog": encode_jpeg_progressive(img),
        "jpegprogrst": encode_jpeg_progressive(
            img, subsample_420=True, restart_interval=2
        ),
        "jpegycck": encode_jpeg_baseline(
            _rng(4).integers(0, 256, (16, 16, 4), dtype=np.uint8), ycck=True
        ),
        "png_adam7": codecs.encode_png(img, interlace=True),
        "png_pal4": _make_depth_png(
            11, 9, 4, 3,
            b"".join(
                b"\x00" + _pack_bits(row, 4)
                for row in _rng(2).integers(0, 16, (9, 11), dtype=np.uint8)
            ),
            plte=np.arange(48, dtype=np.uint8).reshape(16, 3),
        ),
        "png_16bit": _make_depth_png(
            9, 6, 16, 0,
            b"".join(
                b"\x00" + row.byteswap().tobytes()
                for row in _rng(3).integers(0, 65536, (6, 9), dtype=np.uint16)
            ),
        ),
        "tiff": codecs.encode_tiff(img, packbits=True, rows_per_strip=4),
        "tiffbe": codecs.encode_tiff(img, big_endian=True),
        "bmp": codecs.encode_bmp(img),
        "mp4": _make_mp4(),
        "mp3": _make_mp3(n_bytes=4096),
    }
    random.seed(42)
    for kind, payload in valid.items():
        pb = bytearray(payload)
        for _ in range(400):
            b = bytearray(pb)
            mode = random.randrange(5)
            if mode == 0:
                for _ in range(random.randrange(1, 10)):
                    b[random.randrange(len(b))] = random.randrange(256)
            elif mode == 1:
                b = b[: random.randrange(1, len(b))]
            elif mode == 2:
                b += bytes(
                    random.randrange(256)
                    for _ in range(random.randrange(1, 64))
                )
            elif mode == 3:
                i, j = sorted(random.randrange(len(b)) for _ in range(2))
                b = b[:i] + b[j:]
            else:
                b[random.randrange(len(b))] = random.randrange(256)
                b = b[: random.randrange(8, len(b) + 1)]
            out = mm._real_features(bytes(b), "image")  # must not raise
            assert out is None or isinstance(out, dict)
    for _ in range(500):
        junk = bytes(
            random.randrange(256) for _ in range(random.randrange(1, 512))
        )
        out = mm._real_features(junk, "image")
        assert out is None or isinstance(out, dict)


def test_jpeg_implausible_dims_quarantine():
    """A flipped SOF byte asking for a 65535x65535 plane must raise a
    typed error, never attempt a 34 GB allocation."""
    import struct

    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    good = bytearray(encode_jpeg_baseline(np.full((8, 8), 99, np.uint8)))
    sof = bytes(good).find(b"\xff\xc0")
    # SOF0 payload: len(2) precision(1) height(2) width(2) ...
    good[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_tiff_roundtrips_all_layouts():
    """Baseline TIFF: grey/RGB/RGBA, both byte orders, PackBits and
    uncompressed, single- and multi-strip — pixel-exact; WhiteIsZero
    photometric inverts; corrupt tag counts / short strips are typed."""
    import struct

    rng = _rng(37)
    for shape in [(20, 30), (17, 23, 3), (9, 11, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = img if img.ndim == 3 else img[:, :, None]
        for be in (False, True):
            for pb in (False, True):
                for rps in (None, 5):
                    t = codecs.encode_tiff(
                        img, big_endian=be, packbits=pb, rows_per_strip=rps
                    )
                    assert codecs.sniff_media(t) == "tiff"
                    out = codecs.decode_tiff(t)
                    np.testing.assert_array_equal(out["pixels"], ref)
    # PhotometricInterpretation 0 (WhiteIsZero) inverts grey
    g = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    t = bytearray(codecs.encode_tiff(g))
    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack_from("<H", t, e)[0] == 262:
            struct.pack_into("<HH", t, e + 8, 0, 0)
    np.testing.assert_array_equal(
        codecs.decode_tiff(bytes(t))["pixels"][:, :, 0], 255 - g
    )
    # typed errors: truncated header, short strip, huge tag count
    with pytest.raises(ValueError):
        codecs.decode_tiff(codecs.TIFF_MAGIC_LE + b"\x00" * 2)
    good = bytearray(codecs.encode_tiff(g))
    struct.pack_into("<I", good, 4 + 2, 0xFFFFFF)  # corrupt: garbage IFD
    with pytest.raises((ValueError, NotImplementedError)):
        codecs.decode_tiff(bytes(good))


def test_bmp_roundtrips_and_sniff_hardening():
    """24/32-bit BMP: bottom-up and top-down, BGR(A)->RGB(A)
    pixel-exact; 'BM' + garbage must NOT sniff as bmp (2-byte magic is
    too weak alone — DIB header size + planes=1 required)."""
    rng = _rng(41)
    for shape in [(15, 21, 3), (8, 9, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for td in (False, True):
            b = codecs.encode_bmp(img, top_down=td)
            assert codecs.sniff_media(b) == "bmp"
            np.testing.assert_array_equal(
                codecs.decode_bmp(b)["pixels"], img
            )
    assert codecs.sniff_media(b"BM" + bytes(64)) is None
    with pytest.raises(ValueError):
        codecs.decode_bmp(codecs.encode_bmp(
            rng.integers(0, 256, (5, 5, 3), dtype=np.uint8))[:30])


def test_codec_hardening_review_findings():
    """Round-9 review regressions: (1) duplicate SOF in a progressive
    stream is a typed ValueError, not a KeyError escaping the
    quarantine; (2) planar TIFF refuses instead of silently
    interleaving garbage; (3) BITMAPCOREHEADER BMPs sniff correctly
    (planes at offset 22, not 26) so a real payload never fake-decodes;
    (4) a PNG deflate bomb is length-bounded at inflate time."""
    import struct
    import zlib

    from calaveras_uniteus_etl_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )
    from calaveras_uniteus_etl_spark.operators import multimodal as mm

    rng = _rng(47)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    stream = encode_jpeg_progressive(img)
    i = stream.find(b"\xff\xc2")
    (seglen,) = struct.unpack(">H", stream[i + 2 : i + 4])
    j = stream.find(b"\xff\xda")
    dup = stream[:j] + stream[i : i + 2 + seglen] + stream[j:]
    with pytest.raises(ValueError):
        decode_jpeg(dup)
    assert mm._real_features(dup, "image")["width"] is None

    t = bytearray(codecs.encode_tiff(
        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    ))
    n = struct.unpack_from("<H", t, 8)[0]
    for k in range(n):
        e = 10 + 12 * k
        if struct.unpack_from("<H", t, e)[0] == 262:
            struct.pack_into("<H", t, e, 284)   # -> PlanarConfiguration
            struct.pack_into("<HH", t, e + 8, 2, 0)
    with pytest.raises(NotImplementedError):
        codecs.decode_tiff(bytes(t))

    core = (b"BM" + struct.pack("<IHHI", 32, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 4, 2, 1, 24) + b"\x00" * 32)
    assert codecs.sniff_media(core) == "bmp"
    f = mm._real_features(core, "image")
    assert f is not None and f["width"] is None  # quarantine, not fake

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    bomb = (codecs.PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * (10 << 20)))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        codecs.decode_png(bomb)


def test_tiff_bmp_flow_through_extract_features(spark):
    from calaveras_uniteus_etl_spark.functions import codecs as c

    img = _rng(43).integers(0, 256, size=(19, 27, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(c.encode_tiff(img, packbits=True)), "image"),
            (2, bytearray(c.encode_bmp(img)), "image"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r.doc_id: r for r in extract_features(df).collect()}
    assert (rows[1].width, rows[1].height) == (27, 19)
    assert (rows[2].width, rows[2].height) == (27, 19)


# --- indexed-color PNG + GIF ------------------------------------------------


def _make_palette_png(idx: np.ndarray, palette: np.ndarray,
                      trns: bytes | None = None,
                      interlace: bool = False) -> bytes:
    """Hand-built indexed-color PNG (color type 3, filter 0 rows;
    optionally Adam7-interlaced)."""
    import struct
    import zlib

    h, w = idx.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in codecs._ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(
                b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
            )
        raster = b"".join(parts)
    else:
        raster = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    out = codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
    out += chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    out += chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    return out


def _make_depth_png(width, height, bit_depth, color_type, raster,
                    plte=None, trns=None, interlace=0) -> bytes:
    import struct
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    out = codecs.PNG_MAGIC + chunk(b"IHDR", struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")


def _pack_bits(vals: np.ndarray, d: int) -> bytes:
    """One row of d-bit samples packed MSB-first (PNG sub-byte layout)."""
    bits = np.zeros((len(vals), d), dtype=np.uint8)
    for i in range(d):
        bits[:, i] = (vals >> (d - 1 - i)) & 1
    flat = bits.reshape(-1)
    flat = np.concatenate(
        [flat, np.zeros((-len(flat)) % 8, dtype=np.uint8)]
    )
    return np.packbits(flat).tobytes()


def test_png_sub_byte_and_16bit_depths_decode():
    """The full legal depth matrix (ISO 15948 11.1): 1/2/4-bit grey
    scaled to 0..255, 1/2/4-bit palette indices, 16-bit grey/RGB as
    uint16 — each against a hand-packed raster, composing with Adam7
    where the spec allows."""
    rng = _rng(31)
    # sub-byte grey, exact integer scaling 255/(2^d-1)
    for d in (1, 2, 4):
        w, h = 13, 7
        vals = rng.integers(0, 1 << d, (h, w), dtype=np.uint8)
        raster = b"".join(b"\x00" + _pack_bits(vals[y], d) for y in range(h))
        out = codecs.decode_png(_make_depth_png(w, h, d, 0, raster))
        exp = (vals.astype(np.uint16) * (255 // ((1 << d) - 1))).astype(
            np.uint8
        )[:, :, None]
        np.testing.assert_array_equal(out["pixels"], exp)
        assert out["bit_depth"] == d
    # 4-bit palette, 1-bit palette with tRNS alpha
    palette = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = rng.integers(0, 16, (9, 11), dtype=np.uint8)
    raster = b"".join(b"\x00" + _pack_bits(idx[y], 4) for y in range(9))
    out = codecs.decode_png(_make_depth_png(11, 9, 4, 3, raster, plte=palette))
    np.testing.assert_array_equal(out["pixels"], palette[idx])
    pal2 = np.array([[255, 255, 255], [0, 0, 0]], dtype=np.uint8)
    idx2 = rng.integers(0, 2, (8, 10), dtype=np.uint8)
    raster = b"".join(b"\x00" + _pack_bits(idx2[y], 1) for y in range(8))
    out = codecs.decode_png(
        _make_depth_png(10, 8, 1, 3, raster, plte=pal2, trns=bytes([0]))
    )
    assert out["channels"] == 4
    np.testing.assert_array_equal(
        out["pixels"][:, :, 3], np.where(idx2 == 0, 0, 255)
    )
    # 16-bit grey + RGB keep full precision as uint16
    vals16 = rng.integers(0, 65536, (6, 9), dtype=np.uint16)
    raster = b"".join(
        b"\x00" + vals16[y].byteswap().tobytes() for y in range(6)
    )
    out = codecs.decode_png(_make_depth_png(9, 6, 16, 0, raster))
    assert out["pixels"].dtype == np.uint16 and out["bit_depth"] == 16
    np.testing.assert_array_equal(out["pixels"][:, :, 0], vals16)
    # 16-bit RGB under Adam7
    w, h = 12, 10
    img16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    parts = []
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = img16[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            parts.append(b"".join(
                b"\x00" + sub[y].byteswap().tobytes()
                for y in range(sub.shape[0])
            ))
    out = codecs.decode_png(
        _make_depth_png(w, h, 16, 2, b"".join(parts), interlace=1)
    )
    np.testing.assert_array_equal(out["pixels"], img16)
    # 2-bit grey under Adam7 (sub-byte per-pass strides)
    w, h = 11, 9
    g2 = rng.integers(0, 4, (h, w), dtype=np.uint8)
    parts = []
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = g2[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            parts.append(b"".join(
                b"\x00" + _pack_bits(sub[y], 2)
                for y in range(sub.shape[0])
            ))
    out = codecs.decode_png(
        _make_depth_png(w, h, 2, 0, b"".join(parts), interlace=1)
    )
    np.testing.assert_array_equal(
        out["pixels"], (g2.astype(np.uint16) * 85).astype(np.uint8)[:, :, None]
    )
    # illegal depth/type combos are typed errors (16-bit palette)
    with pytest.raises(ValueError):
        codecs.decode_png(_make_depth_png(4, 4, 16, 3, b""))
    with pytest.raises(ValueError):
        codecs.decode_png(_make_depth_png(4, 4, 2, 2, b""))


def test_png_adam7_interlaced_decodes_pixel_exact():
    """Adam7 sub-images scatter back to the identical raster across
    gray/RGB/RGBA, odd dims, degenerate 1-pixel-wide/-tall shapes
    (empty passes), and indexed-color with tRNS."""
    rng = _rng(29)
    for shape in [(32, 40, 3), (17, 23), (9, 7, 4), (1, 1, 3),
                  (2, 3, 3), (100, 1, 3), (1, 100)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        plain = codecs.decode_png(codecs.encode_png(img))
        inter = codecs.decode_png(codecs.encode_png(img, interlace=True))
        assert np.array_equal(plain["pixels"], inter["pixels"]), shape
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = rng.integers(0, 4, (13, 11), dtype=np.uint8)
    out = codecs.decode_png(
        _make_palette_png(idx, palette, trns=bytes([0, 255, 255, 255]),
                          interlace=True)
    )
    assert out["channels"] == 4
    np.testing.assert_array_equal(out["pixels"][:, :, :3], palette[idx])
    np.testing.assert_array_equal(
        out["pixels"][:, :, 3], np.where(idx == 0, 0, 255)
    )
    # short pass data is a typed quarantine, not a crash
    good = bytearray(codecs.encode_png(
        rng.integers(0, 256, (20, 20, 3), dtype=np.uint8), interlace=True
    ))
    with pytest.raises(ValueError):
        # valid zlib stream that inflates to too few pass bytes
        import struct
        import zlib

        short = zlib.compress(b"\x00" * 10)
        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))
        ihdr = struct.pack(">IIBBBBB", 20, 20, 8, 2, 0, 0, 1)
        codecs.decode_png(codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
                          + chunk(b"IDAT", short) + chunk(b"IEND", b""))


def test_palette_png_decodes_to_rgb_and_rgba():
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = _rng(11).integers(0, 4, (7, 5), dtype=np.uint8)
    out = codecs.decode_png(_make_palette_png(idx, palette))
    assert (out["width"], out["height"], out["channels"]) == (5, 7, 3)
    np.testing.assert_array_equal(out["pixels"], palette[idx])
    # tRNS: index 0 fully transparent, others opaque
    out = codecs.decode_png(
        _make_palette_png(idx, palette, trns=bytes([0, 255, 255, 255]))
    )
    assert out["channels"] == 4
    np.testing.assert_array_equal(out["pixels"][:, :, :3], palette[idx])
    np.testing.assert_array_equal(
        out["pixels"][:, :, 3], np.where(idx == 0, 0, 255)
    )


def test_palette_png_corruption_is_typed():
    palette = np.array([[1, 2, 3]], dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    good = _make_palette_png(idx, palette)
    # out-of-range palette index
    bad_idx = np.full((3, 3), 7, dtype=np.uint8)
    with pytest.raises(ValueError):
        codecs.decode_png(_make_palette_png(bad_idx, palette))
    assert codecs.decode_png(good)["channels"] == 3


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_pixel_exact(interlace):
    img = (_rng(12).integers(0, 5, (13, 9, 3), dtype=np.uint8)) * 50
    payload = codecs.encode_gif(img, interlace=interlace)
    assert codecs.sniff_media(payload) == "gif"
    out = codecs.decode_gif(payload)
    assert (out["width"], out["height"], out["channels"]) == (9, 13, 3)
    np.testing.assert_array_equal(out["pixels"], img)
    assert out["n_frames"] == 1


def test_gif_flows_through_extract_features(spark):
    img = (_rng(13).integers(0, 3, (16, 11, 3), dtype=np.uint8)) * 100
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_gif(img)), "image")],
        "doc_id long, payload binary, media_type string",
    )
    row = extract_features(df).collect()[0]
    assert (row.width, row.height) == (11, 16)


def test_gif_and_palette_png_quarantine_fuzz():
    """Extend the quarantine property to the two new decode paths."""
    import random

    from calaveras_uniteus_etl_spark.operators import multimodal as mm

    img = (_rng(14).integers(0, 6, (12, 12, 3), dtype=np.uint8)) * 40
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    idx = _rng(15).integers(0, 3, (10, 8), dtype=np.uint8)
    valid = {
        "gif": codecs.encode_gif(img),
        "gif_i": codecs.encode_gif(img, interlace=True),
        "plte": _make_palette_png(idx, palette),
    }
    random.seed(99)
    for payload in valid.values():
        pb = bytearray(payload)
        for _ in range(400):
            b = bytearray(pb)
            mode = random.randrange(4)
            if mode == 0:
                for _ in range(random.randrange(1, 8)):
                    b[random.randrange(len(b))] = random.randrange(256)
            elif mode == 1:
                b = b[: random.randrange(1, len(b))]
            elif mode == 2:
                b += bytes(
                    random.randrange(256)
                    for _ in range(random.randrange(1, 32))
                )
            else:
                i, j = sorted(random.randrange(len(b)) for _ in range(2))
                b = b[:i] + b[j:]
            out = mm._real_features(bytes(b), "image")  # must not raise
            assert out is None or isinstance(out, dict)


def test_round10_advice_regressions():
    """Round-10 advice regressions: (1) a crafted IFD whose AGGREGATE
    value count is huge (many per-tag-cap-passing entries sharing one
    value region) is a typed ValueError, not an hour of unpack_from;
    (2) unwanted tags are never materialized, so a 65k-entry IFD of
    irrelevant tags terminates immediately; (3) palette/CMYK
    photometrics refuse instead of returning wrong pixels; (4) a bare
    'ID3' prefix on garbage no longer sniffs as mp3."""
    import struct

    from calaveras_uniteus_etl_spark.functions.containers import sniff_mp3

    # (1) 64 entries, each tag 273 BYTE count 65536 (passes the
    # per-tag cap) sharing ONE in-bounds value region -> aggregate
    # 4.2M values; must trip the IFD aggregate cap, not run to term
    n_bomb = 64
    region = 8 + 2 + 12 * n_bomb + 4
    entries = b"".join(
        struct.pack("<HHII", 273, 1, 1 << 16, region) for _ in range(n_bomb)
    )
    bomb = (
        b"II*\x00" + struct.pack("<I", 8)
        + struct.pack("<H", n_bomb) + entries + struct.pack("<I", 0)
        + b"\x00" * (1 << 16)
    )
    with pytest.raises(ValueError, match="aggregate"):
        codecs.decode_tiff(bomb)

    # (2) 60k entries of an unconsumed tag id: skipped without
    # materializing values; fails fast on the missing width tag
    many = b"".join(
        struct.pack("<HHII", 700, 3, 1 << 16, 8) for _ in range(60000)
    )
    junk_ifd = (
        b"II*\x00" + struct.pack("<I", 8)
        + struct.pack("<H", 60000) + many + struct.pack("<I", 0)
    )
    t0 = time.monotonic()
    with pytest.raises(ValueError):
        codecs.decode_tiff(junk_ifd)
    assert time.monotonic() - t0 < 5.0

    # (3) photometric 3 without a ColorMap / 5 (CMYK) refuse — never
    # raw indices as grey or CMYK relabeled RGBA
    rng = _rng(53)
    grey = codecs.encode_tiff(rng.integers(0, 256, (6, 7), dtype=np.uint8))
    rgba = codecs.encode_tiff(
        rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    )
    for payload, photometric, exc, msg in (
        (grey, 3, ValueError, "ColorMap"),
        (rgba, 5, NotImplementedError, "photometric"),
    ):
        t = bytearray(payload)
        n = struct.unpack_from("<H", t, 8)[0]
        for i in range(n):
            e = 10 + 12 * i
            if struct.unpack_from("<H", t, e)[0] == 262:
                struct.pack_into("<HH", t, e + 8, photometric, 0)
        with pytest.raises(exc, match=msg):
            codecs.decode_tiff(bytes(t))

    # (4) sniff_mp3: ID3 prefix alone is not enough
    assert not sniff_mp3(b"ID3" + b"\xff" * 64)          # corrupt syncsafe
    assert not sniff_mp3(b"ID3\x04\x00\x00" + bytes([0, 0, 0, 32])
                         + b"\x00" * 32 + b"garbage-not-a-frame" * 40)
    tag_only = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 32]) + b"\x00" * 32
    assert sniff_mp3(tag_only)                           # tag-only: explicit
    # (4b, round-11 advice) a forged header declaring a syncsafe tag
    # size LARGER than the payload must not accept via the tag-only
    # path — the declared tag has to actually fit
    forged = b"ID3\x04\x00\x00" + bytes([0x0F, 0x7F, 0x7F, 0x7F])
    assert not sniff_mp3(forged + b"arbitrary bytes here" * 10)
    assert not sniff_mp3(forged)                         # header alone
    assert sniff_mp3(_make_mp3(n_bytes=4096, with_id3=True))
    # padding between tag and first frame still sniffs (parse_mp3_meta
    # tolerates it, so the router must too)
    body = _make_mp3(n_bytes=2048, with_id3=False)
    assert sniff_mp3(tag_only + b"\x00" * 100 + body)


def test_progressive_idct_association_matches_idct_2d_bitwise():
    """The vectorized progressive IDCT must share idct_2d's float
    summation association EXACTLY (batched matmul, not einsum): any
    reordering can flip np.round on .5 ties and break the
    'progressive == baseline pixel-exact' contract. Bitwise-compare
    the batch against a per-block idct_2d loop, on tie-prone ramps as
    well as noise."""
    from calaveras_uniteus_etl_spark.functions.jpeg import (
        ZIGZAG,
        _reconstruct_progressive,
        idct_2d,
    )

    rng = _rng(59)
    qt = {0: rng.integers(1, 64, (8, 8)).astype(np.float64)}
    cases = [
        rng.integers(-1024, 1024, (3, 4, 64)).astype(np.float64),
        np.tile(np.arange(64, dtype=np.float64), (2, 5, 1)),  # ramp/ties
        np.zeros((2, 2, 64)),
    ]
    for zz in cases:
        frame = {"comps": [{"id": 1, "tq": 0}]}
        planes = _reconstruct_progressive(frame, {1: zz}, qt)
        by, bx = zz.shape[:2]
        raster = np.zeros((by, bx, 64))
        raster[:, :, ZIGZAG] = zz
        blocks = raster.reshape(by, bx, 8, 8) * qt[0]
        expect = np.zeros((by * 8, bx * 8))
        for i in range(by):
            for j in range(bx):
                expect[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = (
                    idct_2d(blocks[i, j]) + 128.0
                )
        # bitwise equality, not allclose: same primitive, same order
        assert np.array_equal(planes[1], expect)


def test_tiff_lzw_predictor_tiles_roundtrip_and_fixture():
    """TIFF LZW (early-change, MSB-first), Predictor 2, and tile
    organization: (1) the encoder reproduces a HAND-COMPUTED spec
    stream byte-for-byte (codes 256,7,258,8,8,258,6,6,257 @ 9 bits for
    input 7 7 7 8 8 7 7 6 6 — worked by hand from the TIFF 6.0 LZW
    algorithm, so encoder+decoder cannot share a self-consistent
    wrong convention on the base algorithm); (2) width transitions
    9→10→11→12 and the 4094-restart roundtrip (random + run-heavy +
    KwKwK inputs); (3) every layout × compression × predictor combo
    is pixel-exact; (4) predictor 2 actually helps on gradients."""
    import struct

    from calaveras_uniteus_etl_spark.functions.codecs import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    hand = bytes.fromhex("8001e0408044080c068080")
    assert _lzw_encode_tiff(bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])) == hand
    assert _lzw_decode_tiff(hand, 9) == bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])

    rng = _rng(61)
    for data in [
        rng.integers(0, 256, 300, dtype=np.uint8).tobytes(),   # 9->10
        rng.integers(0, 256, 2000, dtype=np.uint8).tobytes(),  # ->11
        rng.integers(0, 256, 400_000, dtype=np.uint8).tobytes(),  # restart
        b"abcabcab" * 30000,   # deep strings
        b"a" * 10000,          # KwKwK chains
    ]:
        assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data

    for shape in [(20, 30), (17, 23, 3), (9, 11, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = img if img.ndim == 3 else img[:, :, None]
        for kw in [
            dict(lzw=True),
            dict(lzw=True, predictor=2),
            dict(predictor=2),
            dict(packbits=True, predictor=2),
            dict(tile=(8, 8)),
            dict(tile=(16, 8), lzw=True),
            dict(tile=(8, 16), lzw=True, predictor=2, big_endian=True),
            dict(lzw=True, rows_per_strip=5, big_endian=True),
            dict(deflate=True),
            dict(deflate=True, predictor=2, big_endian=True),
            dict(tile=(8, 8), deflate=True, predictor=2),
        ]:
            t = codecs.encode_tiff(img, **kw)
            assert codecs.sniff_media(t) == "tiff", kw
            np.testing.assert_array_equal(
                codecs.decode_tiff(t)["pixels"], ref
            )

    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    assert len(codecs.encode_tiff(grad, lzw=True, predictor=2)) < len(
        codecs.encode_tiff(grad, lzw=True)
    )

    # typed quarantine: truncated LZW stream; forged tile count; an
    # unsupported predictor; a segment count too small for the image
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    t = codecs.encode_tiff(img, lzw=True)
    with pytest.raises(ValueError):
        codecs.decode_tiff(t[: len(t) - 40])
    # deflate: bounded inflate (a bomb segment yields exactly one
    # segment's bytes or a typed error), corrupt stream is typed
    td = codecs.encode_tiff(img, deflate=True)
    with pytest.raises(ValueError):
        codecs.decode_tiff(td[: len(td) - 40])
    tiled = bytearray(codecs.encode_tiff(img, tile=(8, 8)))

    def patch_tag(buf, tag, value):
        n = struct.unpack_from("<H", buf, 8)[0]
        for i in range(n):
            e = 10 + 12 * i
            if struct.unpack_from("<H", buf, e)[0] == tag:
                struct.pack_into("<HH", buf, e + 8, value, 0)

    patch_tag(tiled, 322, 16)  # claims 16-wide tiles -> count mismatch
    with pytest.raises(ValueError, match="tile count"):
        codecs.decode_tiff(bytes(tiled))
    pred3 = bytearray(codecs.encode_tiff(img, predictor=2))
    patch_tag(pred3, 317, 3)
    with pytest.raises(NotImplementedError, match="predictor"):
        codecs.decode_tiff(bytes(pred3))


def test_tiff_lzw_payloads_quarantine_fuzz(spark):
    """The new TIFF paths obey the quarantine contract: LZW/tiled/
    predictor payloads flow through _real_features with REAL dims, and
    300 structural corruptions of each never raise out of the batch."""
    import random

    from calaveras_uniteus_etl_spark.operators import multimodal as mm

    rng = _rng(67)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    valid = {
        "lzw": codecs.encode_tiff(img, lzw=True),
        "lzw_pred": codecs.encode_tiff(img, lzw=True, predictor=2),
        "tiled": codecs.encode_tiff(img, tile=(8, 8), lzw=True),
        "deflate": codecs.encode_tiff(img, deflate=True, predictor=2),
    }
    for payload in valid.values():
        out = mm._real_features(payload, "image")
        assert (out["width"], out["height"]) == (17, 24)
    random.seed(71)
    for payload in valid.values():
        for _ in range(300):
            b = bytearray(payload)
            mode = random.randrange(4)
            if mode == 0:
                for _ in range(random.randrange(1, 8)):
                    b[random.randrange(len(b))] = random.randrange(256)
            elif mode == 1:
                b = b[: random.randrange(1, len(b))]
            elif mode == 2:
                b += bytes(
                    random.randrange(256)
                    for _ in range(random.randrange(1, 32))
                )
            else:
                i, j = sorted(random.randrange(len(b)) for _ in range(2))
                b = b[:i] + b[j:]
            out = mm._real_features(bytes(b), "image")  # must not raise
            assert out is None or isinstance(out, dict)


def test_tiff_palette_roundtrips_and_refuses_missing_colormap():
    """Photometric-3 TIFF: indices expand through the 3×256 16-bit
    ColorMap (8-bit scaled v·257, recovered by >>8) across every
    compression/layout; a palette payload whose ColorMap is absent is
    a typed ValueError, never raw indices returned as grey."""
    import struct

    rng = _rng(73)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (19, 13), dtype=np.uint8)
    for kw in [
        dict(),
        dict(lzw=True),
        dict(big_endian=True, packbits=True),
        dict(tile=(8, 8), deflate=True),
        dict(lzw=True, predictor=2),
    ]:
        out = codecs.decode_tiff(codecs.encode_tiff(idx, palette=pal, **kw))
        assert out["channels"] == 3, kw
        np.testing.assert_array_equal(out["pixels"], pal[idx])
    t = bytearray(codecs.encode_tiff(idx, palette=pal))
    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack_from("<H", t, e)[0] == 320:
            struct.pack_into("<H", t, e, 999)
    with pytest.raises(ValueError, match="ColorMap"):
        codecs.decode_tiff(bytes(t))
