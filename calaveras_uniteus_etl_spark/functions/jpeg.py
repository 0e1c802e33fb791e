"""JPEG codec in pure Python + numpy (no Pillow/libjpeg).

Decoder: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2),
8-bit precision, Huffman entropy coding — together the overwhelmingly
dominant JPEG variants on the open web. Grayscale, YCbCr, and
4-component CMYK / YCCK (Adobe APP14 transform tag) with arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0 all fall out of the general
MCU walk), restart markers (DRI/RSTn) included; progressive
streams support the full Annex G toolbox (spectral selection, DC/AC
successive approximation, EOB runs, embedded correction bits).
12-bit, lossless, hierarchical, and arithmetic-coded streams raise
``NotImplementedError`` — those fall through to the import-guarded
Pillow path in :func:`codecs.decode_image_any`, exactly like the
pre-existing non-PNG stub.

Encoder: the test/fixture twin (same role as ``codecs.encode_wav``) —
baseline with the JPEG Annex K example tables, plus
:func:`encode_jpeg_progressive` emitting the classic successive-
approximation scan script (identical quantized coefficients, so
progressive and baseline decode pixel-exactly equal). It exists so
the test suite can build real entropy-coded streams whose decoded
output has a hand-checkable bound (quantization error only),
including DC-only images where the exact pixel value is computable by
hand: a uniform block decodes to clip(round(q[0,0] *
round(8*(v-128)/q[0,0]) / 8) + 128).

Reference parity note: the reference system ships no image codec at
all (SURVEY §2 "multimodal" rows are engine extensions); this module
exists to make the Spark-side decode path real rather than stubbed.

Format facts from the public JPEG spec (ITU-T T.81 / ISO 10918-1):
marker layout §B, canonical Huffman construction §C.2, the zig-zag
order Figure 5, the example quantization and Huffman tables Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants -------------------------------------------------------

# zig-zag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example tables (the de-facto "quality 50" tables)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (bits[1..16] counts, values)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: spatial = A.T @ coeffs @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _alpha = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _A[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct_2d(coeffs: np.ndarray) -> np.ndarray:
    """Exact (float64) 2-D inverse DCT of one 8x8 block."""
    return _A.T @ coeffs @ _A


def fdct_2d(block: np.ndarray) -> np.ndarray:
    """Forward twin of :func:`idct_2d`."""
    return _A @ block @ _A.T


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """(code_length, code) -> symbol per T.81 §C.2 canonical order."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, ssss: int) -> int:
    """T.81 EXTEND: map ssss magnitude bits to a signed coefficient."""
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.

    Stops at any non-stuffing marker; RSTn markers are consumed by
    ``skip_restart`` (they byte-align and reset DC predictors).
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or another marker: pad with 1-bits (spec-legal
                # trailing garbage for a final partial byte)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def skip_restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: restart marker missing")
        self.pos += 2


class _RestartPending(Exception):
    """Raised inside _fill when an RSTn marker is next in the stream."""


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline or progressive JPEG to
    ``{width, height, channels, pixels}``.

    ``pixels`` is uint8 HxWxC (C=1 grayscale, C=3 RGB via the JFIF
    YCbCr transform). Raises ``NotImplementedError`` for 12-bit /
    arithmetic / lossless streams and ``ValueError`` for corrupt ones.
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:
        # truncated header/table/segment body walking off the end
        raise ValueError("truncated JPEG stream") from exc


def _decode_jpeg(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    scan = None
    coef = None  # progressive: {cid: (blocks_y, blocks_x, 64) int32}
    blocks_nonint = None  # progressive: {cid: (bh, bw) non-interleaved dims
    adobe_transform = None  # APP14: 0=CMYK/unknown, 1=YCbCr, 2=YCCK

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (spec §B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x00 or pos + 2 > len(payload):
            raise ValueError(f"invalid marker 0x{marker:02X} at {pos - 2}")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            raise ValueError(f"bad segment length {seglen} at {pos}")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(
                        seg, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg, dtype=">u2", count=64, offset=p
                    ).astype(np.int64)
                    p += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl
                qt[tid] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nval = sum(bits)
                values = list(seg[p + 17 : p + 17 + nval])
                huff[(tclass, tid)] = _canonical_codes(bits, values)
                p += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progr.
            if frame is not None:
                # one SOF per frame (T.81 B.2.1); a second one in a
                # corrupt stream would orphan the progressive
                # coefficient store's MCU geometry — typed error, not
                # a KeyError escaping the quarantine contract
                raise ValueError("duplicate SOF marker")
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            height, width = struct.unpack(">HH", seg[1:5])
            if not width or not height or width * height > (1 << 26):
                # zero or implausible dims (a flipped SOF byte can ask
                # for a 65535x65535 plane = 34 GB): quarantine, never
                # let one corrupt file OOM the whole mapInPandas batch
                raise ValueError(
                    f"implausible JPEG dimensions {width}x{height}"
                )
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "w": width, "h": height, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) not supported"
            )
        elif marker == 0xEE:  # APP14 (Adobe color-transform tag)
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            if not frame["progressive"]:
                pos += seglen
                break
            # progressive: Ss/Se/Ah/Al select the spectral band and
            # approximation bits; decode this scan's entropy data into
            # the coefficient store and keep walking markers (a SOF2
            # stream carries many scans before EOI).
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if coef is None:
                coef, blocks_nonint = _alloc_coef_store(frame)
            reader = _BitReader(payload, pos + seglen)
            try:
                _progressive_scan(
                    reader, frame, scan, ss, se, ahal >> 4, ahal & 0x0F,
                    restart_interval, huff, coef, blocks_nonint,
                )
            except _RestartPending as exc:
                # an RSTn where the scan expects entropy bits only
                # happens in corrupt streams (valid encoders restart
                # exactly on the DRI grid the walk already consumes)
                raise ValueError(
                    "unexpected restart marker in progressive scan"
                ) from exc
            pos = reader.pos
            continue
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("JPEG stream has no frame/scan")

    if frame["progressive"]:
        max_h = max(c["h"] for c in frame["comps"])
        max_v = max(c["v"] for c in frame["comps"])
        planes = _reconstruct_progressive(frame, coef, qt)
        return _compose_image(frame, planes, max_h, max_v, adobe_transform)

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan:
        if sc["id"] not in by_id:
            raise ValueError(f"SOS component {sc['id']} not in frame")
        by_id[sc["id"]]["dc_t"] = sc["dc"]
        by_id[sc["id"]]["ac_t"] = sc["ac"]
    for c in comps:
        if "dc_t" not in c:
            raise ValueError(f"frame component {c['id']} missing from scan")
        if (0, c["dc_t"]) not in huff or (1, c["ac_t"]) not in huff:
            raise ValueError("scan references an undefined Huffman table")
        if c["tq"] not in qt:
            raise ValueError("frame references an undefined quant table")
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"bad sampling factors {c['h']}x{c['v']}")
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * max_h))
    mcuy = -(-frame["h"] // (8 * max_v))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for c in comps
    }

    # The entropy-coded segment interleaves component data in SOS scan
    # order (ISO 10918-1 §B.2.3) — a spec-legal stream may list scan
    # components in a different order than the SOF frame header, so the
    # MCU walk must follow the scan list, not frame order.
    scan_comps = [by_id[sc["id"]] for sc in scan]

    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.skip_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in scan_comps:
                dct = huff[(0, c["dc_t"])]
                act = huff[(1, c["ac_t"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = _decode_block(reader, dct, act, pred, c)
                        dq = np.zeros(64)
                        dq[ZIGZAG] = coeffs * 1.0
                        block = dq.reshape(8, 8) * q
                        px = idct_2d(block) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px

    return _compose_image(frame, planes, max_h, max_v, adobe_transform)


def _compose_image(
    frame: dict, planes: dict, max_h: int, max_v: int, adobe=None
) -> dict:
    """Upsample subsampled planes to full resolution, crop to the frame
    dimensions, and color-convert (shared baseline/progressive tail).
    ``adobe`` is the APP14 transform tag: a 4-component stream is YCCK
    when it says 2, plain (Adobe-convention) CMYK otherwise."""
    full = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        if c["h"] != max_h or c["v"] != max_v:
            p = np.repeat(
                np.repeat(p, max_v // c["v"], axis=0), max_h // c["h"], axis=1
            )
        full.append(p[: frame["h"], : frame["w"]])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        return {
            "width": frame["w"], "height": frame["h"],
            "channels": 1, "pixels": out, "colorspace": "gray",
        }
    if len(full) == 4:
        if adobe == 2:  # YCCK: invert the YCbCr transform, un-invert CMY
            y, cb, cr, k = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            full = [255.0 - r, 255.0 - g, 255.0 - b, k]
        out = np.clip(np.round(np.stack(full, axis=2)), 0, 255).astype(
            np.uint8
        )
        return {
            "width": frame["w"], "height": frame["h"],
            "channels": 4, "pixels": out, "colorspace": "cmyk",
        }
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {
        "width": frame["w"], "height": frame["h"],
        "channels": 3, "pixels": out, "colorspace": "rgb",
    }


def _decode_block(reader, dct, act, pred, comp) -> np.ndarray:
    """One 8x8 block of zig-zag-ordered quantized coefficients."""
    coeffs = np.zeros(64, dtype=np.int64)
    while True:
        try:
            ssss = reader.decode_symbol(dct)
            if ssss > 15:
                # a corrupt DHT can map a code to any byte; category
                # 16+ is not legal baseline (T.81 F.1.2.1)
                raise ValueError(f"invalid DC category {ssss}")
            diff = _extend(reader.read_bits(ssss), ssss) if ssss else 0
            pred[comp["id"]] += diff
            if abs(pred[comp["id"]]) > (1 << 40):
                # valid streams keep |DC| < 2^15; runaway predictors
                # only come from corrupt entropy data and would
                # eventually overflow the int64 coefficient buffer
                raise ValueError("corrupt DC predictor")
            coeffs[0] = pred[comp["id"]]
            k = 1
            while k < 64:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL: 16 zeros
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past end of block")
                coeffs[k] = _extend(reader.read_bits(s), s)
                k += 1
            return coeffs
        except _RestartPending:
            # marker mid-block means the byte-aligned restart starts
            # exactly here: consume it, reset predictors, redo block
            reader.skip_restart()
            for cid in pred:
                pred[cid] = 0
            coeffs[:] = 0


# --- progressive (SOF2) scan decoding (T.81 Annex G) ------------------------
#
# A progressive stream delivers the SAME quantized coefficients as a
# sequential one, split across many scans: by spectral band (Ss..Se,
# DC-only or an AC range) and by bit precision (successive
# approximation: a first pass at Al bits of headroom, then 1-bit
# refinement passes Ah -> Al = Ah-1). Decoding therefore accumulates
# into a per-component zig-zag coefficient store; reconstruction after
# EOI is the ordinary dequantize + IDCT tail shared with baseline.


def _alloc_coef_store(frame: dict):
    """Per-component coefficient store on the MCU-padded block grid,
    plus each component's NON-interleaved block dims (AC scans and
    single-component DC scans walk those, not the padded grid)."""
    comps = frame["comps"]
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"bad sampling factors {c['h']}x{c['v']}")
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * max_h))
    mcuy = -(-frame["h"] // (8 * max_v))
    coef = {}
    nonint = {}
    for c in comps:
        coef[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )
        # T.81 A.1.1: samples = ceil(dim * sampling / max_sampling),
        # blocks = ceil(samples / 8)
        sw = -(-frame["w"] * c["h"] // max_h)
        sh = -(-frame["h"] * c["v"] // max_v)
        nonint[c["id"]] = (-(-sh // 8), -(-sw // 8))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    return coef, nonint


def _progressive_scan(
    reader, frame, scan, ss, se, ah, al, restart_interval, huff, coef,
    blocks_nonint,
) -> None:
    """Decode one SOS of a progressive stream into the coefficient
    store. DC scans (Ss=0) may interleave components; AC scans carry
    exactly one component (T.81 G.1.1.1)."""
    by_id = {c["id"]: c for c in frame["comps"]}
    for sc in scan:
        if sc["id"] not in by_id:
            raise ValueError(f"SOS component {sc['id']} not in frame")
    if al > 13 or ah > 14 or (ah and ah != al + 1):
        raise ValueError(f"bad successive approximation Ah={ah} Al={al}")
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0 (T.81 G.1.1.1)")
        for sc in scan:
            if ah == 0 and (0, sc["dc"]) not in huff:
                raise ValueError("DC scan references an undefined table")
        _progressive_dc_scan(
            reader, frame, scan, ah, al, restart_interval, huff, coef,
            blocks_nonint, by_id,
        )
        return
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if se < ss or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")
    sc = scan[0]
    if (1, sc["ac"]) not in huff:
        raise ValueError("AC scan references an undefined Huffman table")
    act = huff[(1, sc["ac"])]
    store = coef[sc["id"]]
    bh, bw = blocks_nonint[sc["id"]]
    if ah == 0:
        _ac_first_scan(reader, act, store, bh, bw, ss, se, al,
                       restart_interval)
    else:
        _ac_refine_scan(reader, act, store, bh, bw, ss, se, al,
                        restart_interval)


def _progressive_dc_scan(
    reader, frame, scan, ah, al, restart_interval, huff, coef,
    blocks_nonint, by_id,
) -> None:
    pred = {sc["id"]: 0 for sc in scan}
    interleaved = len(scan) > 1

    def decode_dc(sc, by, bx):
        store = coef[sc["id"]]
        if ah == 0:
            dct = huff[(0, sc["dc"])]
            ssss = reader.decode_symbol(dct)
            if ssss > 15:
                raise ValueError(f"invalid DC category {ssss}")
            diff = _extend(reader.read_bits(ssss), ssss) if ssss else 0
            pred[sc["id"]] += diff
            if abs(pred[sc["id"]]) > (1 << 26):
                raise ValueError("corrupt DC predictor")
            store[by, bx, 0] = pred[sc["id"]] << al
        else:
            if reader.read_bit():
                store[by, bx, 0] |= 1 << al

    unit = 0  # restart-interval unit: MCUs (interleaved) or blocks
    if interleaved:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.skip_restart()
                    for cid in pred:
                        pred[cid] = 0
                unit += 1
                for sc in scan:  # scan-list order (G.1.1.1.1)
                    c = by_id[sc["id"]]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            decode_dc(
                                sc, my * c["v"] + vy, mx * c["h"] + vx
                            )
    else:
        sc = scan[0]
        bh, bw = blocks_nonint[sc["id"]]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.skip_restart()
                    pred[sc["id"]] = 0
                unit += 1
                decode_dc(sc, by, bx)


def _ac_first_scan(
    reader, act, store, bh, bw, ss, se, al, restart_interval
) -> None:
    """First AC pass for a band: ordinary RLE plus EOBn run codes
    (symbol r<<4 with r<15: a run of 2^r + ext-bits all-EOB blocks)."""
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.skip_restart()
                eobrun = 0
            unit += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            block = store[by, bx]
            k = ss
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:  # EOBn
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past end of spectral band")
                block[k] = _extend(reader.read_bits(s), s) << al
                k += 1


def _ac_refine_scan(
    reader, act, store, bh, bw, ss, se, al, restart_interval
) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    significant coefficients arrive as (run, magnitude-1) symbols with
    a sign bit; every already-nonzero coefficient passed over — and,
    inside an EOB run, every nonzero coefficient in the band — carries
    one embedded correction bit."""
    p1 = 1 << al
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.skip_restart()
                eobrun = 0
            unit += 1
            block = store[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_symbol(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:  # EOBn (covers this block too)
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        newval = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError(
                                "refinement magnitude must be 1"
                            )
                        newval = p1 if reader.read_bit() else -p1
                    # advance r zero-history positions, refining the
                    # nonzero-history coefficients passed over
                    while k <= se:
                        if block[k] != 0:
                            if reader.read_bit() and not (block[k] & p1):
                                block[k] += p1 if block[k] >= 0 else -p1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        block[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB run: refine remaining nonzero coeffs in the band
                while k <= se:
                    if block[k] != 0 and reader.read_bit() and not (
                        block[k] & p1
                    ):
                        block[k] += p1 if block[k] >= 0 else -p1
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, coef, qt) -> dict:
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks of each component)."""
    if coef is None:
        raise ValueError("progressive JPEG stream has no scan data")
    planes = {}
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise ValueError("frame references an undefined quant table")
        zz = coef[c["id"]]  # (by, bx, 64) zig-zag order
        by, bx = zz.shape[:2]
        raster = np.zeros((by, bx, 64))
        raster[:, :, ZIGZAG] = zz
        blocks = raster.reshape(by, bx, 8, 8) * qt[c["tq"]]
        # spatial = A.T @ coeffs @ A for every block at once.  Batched
        # matmul (not einsum) so the float summation association is
        # identical to idct_2d's by construction — a different
        # contraction order can flip np.round on exact-.5 ties and
        # break the "progressive == baseline pixel-exact" contract.
        px = np.matmul(np.matmul(_A.T, blocks), _A) + 128.0
        planes[c["id"]] = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return planes


# --- encoder twin (fixtures/tests) -----------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _encode_codes(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length); inverse of :func:`_canonical_codes`."""
    return {
        v: (code, length)
        for (length, code), v in _canonical_codes(bits, values).items()
    }


def _ssss(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, ssss: int) -> int:
    return v if v >= 0 else v + (1 << ssss) - 1


def _encode_block(
    writer, coeffs: np.ndarray, dc_codes, ac_codes, pred: list[int]
) -> None:
    diff = int(coeffs[0]) - pred[0]
    pred[0] = int(coeffs[0])
    s = _ssss(diff)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(_amplitude(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _ssss(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(_amplitude(v, s), s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)


def _prepare_frame(
    pixels, subsample_420: bool, subsample_422: bool, ycck: bool = False
):
    """Color-convert + chroma-subsample into per-component sample
    planes with their table/sampling specs (shared by the baseline and
    progressive encoders). 4-channel input is CMYK: stored as-is
    (Adobe transform 0) or YCCK-converted (transform 2, the Photoshop
    default) — ``table_sel`` says which DC/AC table class each
    component codes with."""
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    cmyk = px.ndim == 3 and px.shape[2] == 4
    h, w = px.shape[:2]
    if subsample_420 and subsample_422:
        raise ValueError("pick one of subsample_420 / subsample_422")
    if cmyk and (subsample_420 or subsample_422):
        raise ValueError("chroma subsampling is a YCbCr-only option")
    sh = 2 if ((subsample_420 or subsample_422) and not gray) else 1
    sv = 2 if (subsample_420 and not gray) else 1

    if gray:
        planes = [px.astype(np.float64)]
        quants = [QUANT_LUMA]
        comp_spec = [(1, 0x11, 0)]
        scan_spec = [(1, 0x00)]
        samp = [(1, 1)]
        table_sel = [0]
    elif cmyk:
        c = px[:, :, 0].astype(np.float64)
        m = px[:, :, 1].astype(np.float64)
        ye = px[:, :, 2].astype(np.float64)
        k = px[:, :, 3].astype(np.float64)
        if ycck:
            # YCCK (Adobe transform 2): YCbCr forward transform of the
            # INVERTED CMY, K passes through untouched
            r, g, b = 255.0 - c, 255.0 - m, 255.0 - ye
            planes = [
                0.299 * r + 0.587 * g + 0.114 * b,
                -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
                k,
            ]
        else:
            planes = [c, m, ye, k]
        quants = [QUANT_LUMA] * 4
        comp_spec = [(i + 1, 0x11, 0) for i in range(4)]
        scan_spec = [(i + 1, 0x00) for i in range(4)]
        samp = [(1, 1)] * 4
        table_sel = [0, 0, 0, 0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sh == 2 or sv == 2:
            # pad to the subsampling grid, then box filter the chroma
            ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            cr = cr.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        planes = [y, cb, cr]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        luma_hv = (sh << 4) | sv
        comp_spec = [(1, luma_hv, 0), (2, 0x11, 1), (3, 0x11, 1)]
        scan_spec = [(1, 0x00), (2, 0x11), (3, 0x11)]
        samp = [(sh, sv), (1, 1), (1, 1)]
        table_sel = [0, 1, 1]
    return gray, h, w, planes, quants, comp_spec, scan_spec, samp, table_sel


def _emit_jpeg_headers(
    sof_marker: int, gray: bool, h: int, w: int, comp_spec, restart_interval
):
    """SOI + DQT + SOF + DHT (+DRI) prologue; returns (out, segment)."""
    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for tid, q in enumerate([QUANT_LUMA] + ([] if gray else [QUANT_CHROMA])):
        segment(0xDB, bytes([tid]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comp_spec))
    for cid, hv, tq in comp_spec:
        sof += bytes([cid, hv, tq])
    segment(sof_marker, sof)
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tcid, (bits, values) in specs:
        segment(0xC4, bytes([tcid]) + bytes(bits) + bytes(values))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    return out, segment


def encode_jpeg_baseline(
    pixels: np.ndarray,
    *,
    subsample_420: bool = False,
    subsample_422: bool = False,
    restart_interval: int = 0,
    scan_order: tuple[int, ...] | None = None,
    ycck: bool = False,
) -> bytes:
    """Encode uint8 HxW (grayscale), HxWx3 (RGB), or HxWx4 (CMYK,
    stored per Adobe transform 0, or YCCK when ``ycck=True``) as a
    baseline JPEG with the Annex K tables — the fixture twin of
    :func:`decode_jpeg` (same role as ``codecs.encode_wav``).

    ``subsample_420`` / ``subsample_422`` switch color images from
    4:4:4 to 2x2- / 2x1-box-filtered chroma; ``restart_interval``
    emits DRI + RSTn markers every N MCUs; ``scan_order`` (a
    permutation of 0-based component indices, e.g. ``(2, 0, 1)``)
    emits the SOS list AND the interleaved entropy data in that order
    while SOF keeps frame order — a spec-legal layout (ISO 10918-1
    §B.2.3) that exercises the decoder's scan-order MCU walk. All
    exist so tests can exercise the decoder's subsampling, restart,
    and component-order paths with real streams.
    """
    (gray, h, w, planes, quants, comp_spec, scan_spec, samp,
     table_sel) = _prepare_frame(
        pixels, subsample_420, subsample_422, ycck
    )
    out, segment = _emit_jpeg_headers(
        0xC0, gray, h, w, comp_spec, restart_interval
    )
    if len(comp_spec) == 4:
        # Adobe APP14: how a 4-component stream's colors are encoded
        # (transform 2 = YCCK, 0 = plain CMYK)
        segment(
            0xEE,
            b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0),
        )
    order = list(scan_order) if scan_order is not None else list(
        range(len(scan_spec))
    )
    if sorted(order) != list(range(len(scan_spec))):
        raise ValueError(f"scan_order must permute 0..{len(scan_spec) - 1}")
    sos = bytes([len(scan_spec)])
    for ci in order:
        cid, tt = scan_spec[ci]
        sos += bytes([cid, tt])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    dc_l = _encode_codes(*DC_LUMA_SPEC)
    ac_l = _encode_codes(*AC_LUMA_SPEC)
    dc_c = _encode_codes(*DC_CHROMA_SPEC)
    ac_c = _encode_codes(*AC_CHROMA_SPEC)
    writer = _BitWriter()
    preds = [[0] for _ in planes]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    padded = []
    for ci, p in enumerate(planes):
        th = mcuy * samp[ci][1] * 8
        tw = mcux * samp[ci][0] * 8
        pad = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        padded.append(pad)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                writer.out.extend(b"\xff" + bytes([0xD0 + (rst_idx % 8)]))
                rst_idx += 1
                preds = [[0] for _ in planes]
            mcu_count += 1
            for ci in order:  # entropy data follows the SOS scan order
                p = padded[ci]
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeffs = np.round(
                            fdct_2d(block) / quants[ci]
                        ).astype(np.int64)
                        zz = coeffs.reshape(-1)[ZIGZAG]
                        dc, ac = (
                            (dc_l, ac_l)
                            if table_sel[ci] == 0
                            else (dc_c, ac_c)
                        )
                        _encode_block(writer, zz, dc, ac, preds[ci])
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- progressive encoder twin -----------------------------------------------

# The Annex K sequential AC tables define no EOBn symbols (r<<4, r=1..14
# — progressive-only codes), so the progressive twin ships its own AC
# table, as real progressive encoders do: a flat canonical table with
# all 256 symbols (128 at 8 bits, 128 at 9; the all-ones code stays
# unused as T.81 C.2 requires). Deliberately simple over compact — the
# fixture optimizes decoder coverage, not stream size.
PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _ScanWriter(_BitWriter):
    """_BitWriter plus RSTn emission and an AC EOB-run accumulator."""

    def __init__(self, ac_codes=None) -> None:
        super().__init__()
        self.ac_codes = ac_codes
        self.rst_idx = 0
        self.eobrun = 0
        self.corr_bits: list[int] = []  # buffered inside the EOB run

    def restart(self) -> None:
        self.flush()
        self.out.extend(b"\xff" + bytes([0xD0 + (self.rst_idx % 8)]))
        self.rst_idx += 1

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac_codes[r << 4]
            self.write(code, length)
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.corr_bits:
            self.write(bit, 1)
        self.corr_bits = []


def _quantized_store(planes, quants, samp, mcux, mcuy):
    """Zig-zag quantized coefficient arrays (by, bx, 64) per component
    on the MCU-padded grid — the single coefficient source every
    progressive scan reads from."""
    stores = []
    for ci, p in enumerate(planes):
        ch, cv = samp[ci]
        th, tw = mcuy * cv * 8, mcux * ch * 8
        pad = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        by, bx = th // 8, tw // 8
        blocks = (
            pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        )
        # same association as fdct_2d ((_A @ block) @ _A.T) so the
        # quantized coefficients match the baseline encoder BITWISE —
        # a different float summation order (e.g. einsum) flips
        # np.round on exact-.5 ties and breaks the progressive ==
        # baseline pixel-exactness contract
        coeffs = np.matmul(np.matmul(_A, blocks), _A.T)
        zz = np.round(coeffs / quants[ci]).astype(np.int64).reshape(
            by, bx, 64
        )[:, :, ZIGZAG]
        stores.append(zz)
    return stores


def _emit_dc_scan(writer, stores, samp, comp_idx, mcux, mcuy, ah, al,
                  dc_codes, restart_interval) -> None:
    """Interleaved DC scan: first pass (Ah=0) Huffman-codes the
    point-transformed DC diffs; refinement passes emit one raw bit."""
    preds = {ci: 0 for ci in comp_idx}
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                writer.restart()
                preds = {ci: 0 for ci in comp_idx}
            unit += 1
            for ci in comp_idx:
                ch, cv = samp[ci]
                for vy in range(cv):
                    for vx in range(ch):
                        c0 = int(stores[ci][my * cv + vy, mx * ch + vx, 0])
                        if ah == 0:
                            v = c0 >> al  # arithmetic shift (G.1.2.1)
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _ssss(diff)
                            code, length = dc_codes[ci][s]
                            writer.write(code, length)
                            if s:
                                writer.write(_amplitude(diff, s), s)
                        else:
                            writer.write((c0 >> al) & 1, 1)


def _emit_ac_first_scan(writer, store, bh, bw, ss, se, al,
                        restart_interval) -> None:
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                writer.flush_eobrun()
                writer.restart()
            unit += 1
            block = store[by, bx]
            r = 0
            for k in range(ss, se + 1):
                c = int(block[k])
                v = (abs(c) >> al) * (1 if c >= 0 else -1)  # toward zero
                if v == 0:
                    r += 1
                    continue
                writer.flush_eobrun()
                while r > 15:
                    code, length = writer.ac_codes[0xF0]  # ZRL
                    writer.write(code, length)
                    r -= 16
                s = _ssss(v)
                code, length = writer.ac_codes[(r << 4) | s]
                writer.write(code, length)
                writer.write(_amplitude(v, s), s)
                r = 0
            if r > 0:
                writer.eobrun += 1
                if writer.eobrun == 0x7FFF:
                    writer.flush_eobrun()


def _emit_ac_refine_scan(writer, store, bh, bw, ss, se, al,
                         restart_interval) -> None:
    """T.81 G.1.2.3 AC refinement (the jpegtran/libjpeg shape): newly
    significant coefficients as (run, 1) + sign, correction bits for
    passed-over significant coefficients buffered and flushed with the
    next symbol or EOB run."""
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                writer.flush_eobrun()
                writer.restart()
            unit += 1
            block = store[by, bx]
            absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
            eob_k = ss - 1  # band index of the last NEWLY significant
            for i, t in enumerate(absv):
                if t == 1:
                    eob_k = ss + i
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    writer.flush_eobrun()
                    code, length = writer.ac_codes[0xF0]
                    writer.write(code, length)
                    r -= 16
                    for bit in br:
                        writer.write(bit, 1)
                    br = []
                if t > 1:  # already significant: buffer the next bit
                    br.append(t & 1)
                    continue
                writer.flush_eobrun()
                code, length = writer.ac_codes[(r << 4) | 1]
                writer.write(code, length)
                writer.write(1 if int(block[k]) >= 0 else 0, 1)
                for bit in br:
                    writer.write(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                writer.eobrun += 1
                writer.corr_bits.extend(br)
                if writer.eobrun == 0x7FFF:
                    writer.flush_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    *,
    subsample_420: bool = False,
    subsample_422: bool = False,
    restart_interval: int = 0,
    ycck: bool = False,
) -> bytes:
    """Progressive (SOF2) twin of :func:`encode_jpeg_baseline`
    (4-channel input encodes CMYK / YCCK the same way).

    Emits the classic successive-approximation scan script — DC first
    pass at Al=1, DC refinement, then per component an AC 1..63 first
    pass at Al=1 and its refinement — so a decoder must exercise every
    progressive mechanism (spectral selection, DC/AC successive
    approximation, EOB runs, embedded correction bits). The quantized
    coefficients are IDENTICAL to the baseline encoder's for the same
    input, so ``decode_jpeg(progressive) == decode_jpeg(baseline)``
    pixel-exactly — the roundtrip test asserts that equivalence.
    """
    (gray, h, w, planes, quants, comp_spec, scan_spec, samp,
     table_sel) = _prepare_frame(
        pixels, subsample_420, subsample_422, ycck
    )
    out, segment = _emit_jpeg_headers(
        0xC2, gray, h, w, comp_spec, restart_interval
    )
    if len(comp_spec) == 4:
        segment(
            0xEE,
            b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0),
        )
    # redefine the AC tables with the EOBn-capable progressive spec
    # (a later DHT overrides an earlier id — T.81 B.2.4.2)
    for tcid in ([0x10] if gray else [0x10, 0x11]):
        segment(
            0xC4,
            bytes([tcid]) + bytes(PROG_AC_SPEC[0]) + bytes(PROG_AC_SPEC[1]),
        )
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    stores = _quantized_store(planes, quants, samp, mcux, mcuy)
    dc_codes = [
        _encode_codes(*(DC_LUMA_SPEC if table_sel[ci] == 0 else DC_CHROMA_SPEC))
        for ci in range(len(planes))
    ]
    ac_codes = [_encode_codes(*PROG_AC_SPEC) for _ci in range(len(planes))]
    comp_idx = list(range(len(planes)))

    def emit_scan(scomps, ss, se, ah, al, body) -> None:
        sos = bytes([len(scomps)])
        for ci in scomps:
            cid, tt = scan_spec[ci]
            sos += bytes([cid, tt])
        sos += bytes([ss, se, (ah << 4) | al])
        segment(0xDA, sos)
        writer = _ScanWriter(ac_codes[scomps[0]])
        body(writer)
        writer.flush_eobrun()
        writer.flush()
        out.extend(writer.out)

    # 1-2: DC first pass + refinement (interleaved over all components)
    emit_scan(
        comp_idx, 0, 0, 0, 1,
        lambda wr: _emit_dc_scan(wr, stores, samp, comp_idx, mcux, mcuy,
                                 0, 1, dc_codes, restart_interval),
    )
    emit_scan(
        comp_idx, 0, 0, 1, 0,
        lambda wr: _emit_dc_scan(wr, stores, samp, comp_idx, mcux, mcuy,
                                 1, 0, dc_codes, restart_interval),
    )
    # 3-4: per component, AC 1..63 first pass then refinement over the
    # component's NON-interleaved block grid (T.81 A.1.1 dims)
    for ci in comp_idx:
        ch, cv = samp[ci]
        bw = -(-(-(-w * ch // max_h)) // 8)
        bh = -(-(-(-h * cv // max_v)) // 8)
        emit_scan(
            [ci], 1, 63, 0, 1,
            lambda wr, ci=ci, bh=bh, bw=bw: _emit_ac_first_scan(
                wr, stores[ci], bh, bw, 1, 63, 1, restart_interval
            ),
        )
    for ci in comp_idx:
        ch, cv = samp[ci]
        bw = -(-(-(-w * ch // max_h)) // 8)
        bh = -(-(-(-h * cv // max_v)) // 8)
        emit_scan(
            [ci], 1, 63, 1, 0,
            lambda wr, ci=ci, bh=bh, bw=bw: _emit_ac_refine_scan(
                wr, stores[ci], bh, bw, 1, 63, 0, restart_interval
            ),
        )
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
