"""Real media codecs built on the standard library (+ numpy).

The container ships no PIL/libav/librosa, but three formats need no
external codec at all: PNG (zlib inflate + per-scanline unfilter),
WAV (RIFF header + PCM frames via the stdlib ``wave`` module), and
baseline JPEG (Huffman + IDCT in :mod:`functions.jpeg`). These
decoders are complete, honest implementations for those formats —
pixel-exact PNG reconstruction for 8-bit grey/RGB/RGBA, full PCM
sample recovery for WAV, and spec-faithful baseline-sequential JPEG
(4:4:4/4:2:2/4:2:0, restart markers) — so the multimodal plumbing
(operators/multimodal.py) has a REAL decode path end to end.

Remaining formats (progressive JPEG, MP3, MP4, ...) still require an
external codec: :func:`decode_image_any` falls through to Pillow
behind an import guard and raises ``NotImplementedError`` when it is
absent.

``sniff_media`` keys the dispatch on magic bytes, so opaque synthetic
payloads (the driver's testdata) keep using the deterministic fake
decode — the differential oracle for x11/x39/x40 is unaffected.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
RIFF_MAGIC = b"RIFF"
JPEG_MAGIC = b"\xff\xd8\xff"

# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(payload: bytes) -> str | None:
    """Identify a payload by magic bytes; None = unknown/opaque."""
    from calaveras_uniteus_etl_spark.functions import containers

    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(RIFF_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(JPEG_MAGIC):
        return "jpeg"
    if containers.sniff_mp4(payload):
        return "mp4"
    if containers.sniff_mp3(payload):
        return "mp3"
    return None


def _png_chunks(payload: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) into raw sample bytes."""
    if len(raw) < height * (1 + stride):
        # a VALID zlib stream can still inflate to fewer bytes than the
        # raster needs (corrupt IDAT): typed error so the mapInPandas
        # feature pass quarantines the row instead of crashing on an
        # out-of-range read
        raise ValueError("PNG raster shorter than height x stride")
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.uint16)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit non-interlaced grey/grey+A/RGB/RGBA PNG.

    Returns width/height/channels and the pixel array
    (height x width x channels, uint8). Raises on formats outside that
    envelope (16-bit, palette, interlaced) — honesty over silent junk.
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    width = height = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError("palette PNG not supported")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS[color_type]
    if not width or not height or width * height * channels > (1 << 28):
        # corrupt IHDR dims would drive a giant raster allocation:
        # quarantine the row, never OOM the mapInPandas batch
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    pixels = _unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": pixels,
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 per scanline) — the test/fixture
    twin of :func:`decode_png`, also handy for sink-side thumbnails."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV payload via the stdlib wave module.

    Returns sample_rate/n_channels/n_frames/duration_s and the sample
    array (n_frames x n_channels, int16 for 16-bit PCM).
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            sample_rate = w.getframerate()
            n_frames = w.getnframes()
            sampwidth = w.getsampwidth()
            frames = w.readframes(n_frames)
    except RuntimeError as exc:
        # the stdlib wave module raises BARE RuntimeError on some
        # corrupt chunk layouts (seek past end); retype it so the
        # feature pass quarantines instead of crashing the batch
        raise ValueError("corrupt WAV chunk structure") from exc
    if sampwidth == 2:
        samples = np.frombuffer(frames, dtype="<i2").reshape(-1, n_channels)
    elif sampwidth == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8)
            .reshape(-1, n_channels)
            .astype(np.int16)
            - 128
        )
    else:
        raise NotImplementedError(f"{8 * sampwidth}-bit PCM not supported")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_frames,
        # round-half-up (not Python's banker's round): floor division
        # reported 0 s for any clip under a second, indistinguishable
        # from an empty file
        "duration_s": int(n_frames / max(sample_rate, 1) + 0.5),
        "samples": samples,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Minimal 16-bit PCM WAV writer — test/fixture twin of
    :func:`decode_wav`."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_image_any(payload: bytes) -> dict:
    """Decode any image: PNG and baseline JPEG natively, everything
    else via Pillow if installed, else NotImplementedError
    (clearly-marked stub path)."""
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload)
    if payload.startswith(JPEG_MAGIC):
        from calaveras_uniteus_etl_spark.functions.jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            pass  # progressive/12-bit/arithmetic: try Pillow below
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "non-PNG/baseline-JPEG image decode requires Pillow, which "
            "is not installed in this environment"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return {
        "width": img.width,
        "height": img.height,
        "channels": arr.shape[2],
        "pixels": arr,
    }
