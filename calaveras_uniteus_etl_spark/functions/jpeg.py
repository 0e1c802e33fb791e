"""Baseline JPEG codec in pure Python + numpy (no Pillow/libjpeg).

Decoder: baseline sequential DCT (SOF0), 8-bit precision, Huffman
entropy coding — the overwhelmingly dominant JPEG variant on the
open web. Grayscale and YCbCr with arbitrary sampling factors
(4:4:4 / 4:2:2 / 4:2:0 all fall out of the general MCU walk),
restart markers (DRI/RSTn) included. Progressive (SOF2), 12-bit,
lossless, hierarchical, and arithmetic-coded streams raise
``NotImplementedError`` — those fall through to the import-guarded
Pillow path in :func:`codecs.decode_image_any`, exactly like the
pre-existing non-PNG stub.

Encoder: the test/fixture twin (same role as ``codecs.encode_wav``) —
baseline 4:4:4 with the JPEG Annex K example tables. It exists so the
test suite can build real entropy-coded streams whose decoded output
has a hand-checkable bound (quantization error only), including
DC-only images where the exact pixel value is computable by hand:
a uniform block decodes to clip(round(q[0,0] * round(8*(v-128)/q[0,0])
/ 8) + 128).

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
    """Decode a baseline JPEG to ``{width, height, channels, pixels}``.

    ``pixels`` is uint8 HxWxC (C=1 grayscale, C=3 RGB via the JFIF
    YCbCr transform). Raises ``NotImplementedError`` for progressive /
    12-bit / arithmetic streams and ``ValueError`` for corrupt ones.
    """
    try:
        return _decode_jpeg(payload)
    except IndexError as exc:  # truncated header/table walking off the end
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline+extended seq.
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
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            pos += seglen
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("JPEG stream has no frame/scan")

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
            for c in comps:
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

    # upsample subsampled planes to full resolution, crop, color-convert
    full = []
    for c in comps:
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
            "channels": 1, "pixels": out,
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
        "channels": 3, "pixels": out,
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


def encode_jpeg_baseline(
    pixels: np.ndarray,
    *,
    subsample_420: bool = False,
    subsample_422: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 HxW (grayscale) or HxWx3 (RGB) as a baseline JPEG
    with the Annex K tables — the fixture twin of :func:`decode_jpeg`
    (same role as ``codecs.encode_wav``).

    ``subsample_420`` / ``subsample_422`` switch color images from
    4:4:4 to 2x2- / 2x1-box-filtered chroma; ``restart_interval``
    emits DRI + RSTn markers every N MCUs. All exist so tests can
    exercise the decoder's subsampling and restart paths with real
    streams.
    """
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if subsample_420 and subsample_422:
        raise ValueError("pick one of subsample_420 / subsample_422")
    sh = 2 if ((subsample_420 or subsample_422) and not gray) else 1
    sv = 2 if (subsample_420 and not gray) else 1

    if gray:
        planes = [px.astype(np.float64)]
        quants = [QUANT_LUMA]
        comp_spec = [(1, 0x11, 0)]
        scan_spec = [(1, 0x00)]
        samp = [(1, 1)]
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
    segment(0xC0, sof)
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tcid, (bits, values) in specs:
        segment(0xC4, bytes([tcid]) + bytes(bits) + bytes(values))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(scan_spec)])
    for cid, tt in scan_spec:
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
            for ci, p in enumerate(padded):
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
                        dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                        _encode_block(writer, zz, dc, ac, preds[ci])
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
