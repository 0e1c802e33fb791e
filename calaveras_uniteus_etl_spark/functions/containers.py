"""Container-metadata parsers: MP4 (ISO-BMFF) and MP3 frame headers.

Full sample decode of MP4 video or MP3 audio genuinely requires an
external codec (libav/ffmpeg — not in this container), and the decode
path stays an honest ``NotImplementedError``. But the METADATA a
feature-extraction pass needs — duration, video dimensions, audio
sample rate — lives in plain container structures that parse with the
standard library alone:

- MP4/ISO-BMFF (ISO 14496-12): a length-prefixed box tree. Duration
  comes from ``moov/mvhd`` (timescale + duration), video dimensions
  from the first ``moov/trak/tkhd`` with nonzero width/height (16.16
  fixed point), audio sample rate from ``moov/trak/mdia/mdhd``'s
  timescale (by convention the media timescale of an audio track).
- MP3 (ISO 11172-3 frame header): 32-bit sync header carrying
  version/layer/bitrate/samplerate indices; an optional ID3v2 tag
  (syncsafe length) precedes the first frame. Duration for CBR
  streams is audio_bytes * 8 / bitrate.

These parsers make ``extract_features`` report REAL metadata for
video/MP3 payloads (the reference has no media handling at all; this
engine's multimodal rows are extensions — see SURVEY §2), while
pixel/sample access still quarantines as not-implemented rather than
faking.
"""

from __future__ import annotations

import struct

MP4_BRANDS = b"ftyp"
ID3_MAGIC = b"ID3"

# MPEG audio tables (ISO 11172-3 / 13818-3): bitrate kbps by layer.
# Layer bits in the header: 3=Layer I, 2=Layer II, 1=Layer III.
_MP3_BITRATE_V1_L1 = [
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
]
_MP3_BITRATE_V1_L2 = [
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
]
_MP3_BITRATE_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_BITRATE_V2_L1 = [
    0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256,
]
# MPEG2/2.5 Layers II and III share one table
_MP3_BITRATE_V2_L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_MP3_SAMPLERATE = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],   # MPEG2.5
}


def sniff_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == MP4_BRANDS


def _frame_info(payload: bytes, pos: int):
    """(frame_length, sample_rate, bitrate_bps) for an MPEG audio frame
    header at ``pos``, or None when the 4 bytes there are not a valid
    header (bad sync, reserved version/layer, reserved/free bitrate
    index, reserved samplerate index)."""
    if pos + 4 > len(payload):
        return None
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
        return None
    h1 = payload[pos + 1]
    h2 = payload[pos + 2]
    version = (h1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h1 >> 1) & 0x03    # 3=I, 2=II, 1=III, 0=reserved
    if version == 1 or layer == 0:
        return None
    br_idx = (h2 >> 4) & 0x0F
    sr_idx = (h2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:  # free-format / reserved
        return None
    padding = (h2 >> 1) & 0x01
    sample_rate = _MP3_SAMPLERATE[version][sr_idx]
    v1 = version == 3
    if layer == 3:  # Layer I: slots of 4 bytes
        table = _MP3_BITRATE_V1_L1 if v1 else _MP3_BITRATE_V2_L1
        bitrate = table[br_idx] * 1000
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    elif layer == 2:  # Layer II: 1152 samples always
        table = _MP3_BITRATE_V1_L2 if v1 else _MP3_BITRATE_V2_L3
        bitrate = table[br_idx] * 1000
        frame_len = 144 * bitrate // sample_rate + padding
    else:  # Layer III: 1152 samples MPEG1, 576 MPEG2/2.5
        table = _MP3_BITRATE_V1_L3 if v1 else _MP3_BITRATE_V2_L3
        bitrate = table[br_idx] * 1000
        frame_len = (144 if v1 else 72) * bitrate // sample_rate + padding
    return frame_len, sample_rate, bitrate


def sniff_mp3(payload: bytes) -> bool:
    """True when the payload is plausibly an MPEG audio stream.

    A bare 0xFF 0xEx sync prefix is far too weak a magic (any opaque
    payload starting with those bits would be misrouted away from the
    deterministic fake-decode path), so this requires a FULLY valid
    first frame header — non-reserved version/layer AND non-reserved
    bitrate/samplerate indices — and, when the payload extends past the
    first frame, a second valid header at the computed frame boundary.
    Payloads shorter than one frame (a truncated single-frame stream)
    are accepted on the first header alone.

    An ``ID3`` prefix alone is just as weak a magic as a bare sync
    word: an opaque payload that happens to start with ASCII "ID3"
    must not be misrouted. The tag header must parse (10 bytes,
    syncsafe size), and a valid frame header must appear within the
    same bounded sync window :func:`parse_mp3_meta` scans behind the
    tag. Tag-only payloads (nothing after the tag) are accepted
    explicitly — but only when the declared syncsafe size actually
    fits: a forged 10-byte header declaring a huge tag size must not
    route arbitrary trailing bytes as mp3.
    """
    if payload.startswith(ID3_MAGIC):
        if len(payload) < 10 or any(b & 0x80 for b in payload[6:10]):
            return False  # bare "ID3" prefix / corrupt syncsafe size
        boundary = _id3_size(payload)
        if boundary > len(payload):
            return False  # declared tag exceeds payload — forged header
        if len(payload) <= boundary + 4:
            return True  # tag-only payload (whole tag present)
        end = min(len(payload) - 4, boundary + 65536)
        return any(
            _frame_info(payload, pos) is not None
            for pos in range(boundary, end + 1)
        )
    info = _frame_info(payload, 0)
    if info is None:
        return False
    frame_len = info[0]
    if frame_len + 4 > len(payload):
        return True
    return _frame_info(payload, frame_len) is not None


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for one nesting level."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} at {pos}")
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def parse_mp4_meta(payload: bytes) -> dict:
    """{duration_s, width, height, sample_rate} from the moov tree.

    Raises ValueError when no parsable moov/mvhd exists (corrupt or
    fragmented-only stream) — callers quarantine on that, same as any
    other codec error.
    """
    try:
        return _parse_mp4_meta(payload)
    except (IndexError, struct.error) as exc:  # truncated box bodies
        raise ValueError("truncated MP4 box structure") from exc


def _parse_mp4_meta(payload: bytes) -> dict:
    moov = _find_box(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 stream has no moov box")
    mvhd = _find_box(payload, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("MP4 moov has no mvhd box")
    b = payload[mvhd[0] : mvhd[1]]
    version = b[0]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", b[20:32])
    else:
        timescale, duration = struct.unpack(">II", b[12:20])
    meta = {
        "duration_s": int(duration / max(timescale, 1) + 0.5),
        "width": None,
        "height": None,
        "sample_rate": None,
    }
    for t, tb, te in _walk_boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        tkhd = _find_box(payload, tb, te, b"tkhd")
        if tkhd is not None and meta["width"] is None:
            th = payload[tkhd[0] : tkhd[1]]
            # width/height are the LAST two u32s of tkhd (16.16 fixed)
            w16, h16 = struct.unpack(">II", th[-8:])
            if w16 and h16:
                meta["width"] = w16 >> 16
                meta["height"] = h16 >> 16
        mdia = _find_box(payload, tb, te, b"mdia")
        if mdia is not None and meta["sample_rate"] is None:
            hdlr = _find_box(payload, mdia[0], mdia[1], b"hdlr")
            is_audio = (
                hdlr is not None
                and payload[hdlr[0] + 8 : hdlr[0] + 12] == b"soun"
            )
            mdhd = _find_box(payload, mdia[0], mdia[1], b"mdhd")
            if is_audio and mdhd is not None:
                mh = payload[mdhd[0] : mdhd[1]]
                if mh[0] == 1:
                    (ts,) = struct.unpack(">I", mh[20:24])
                else:
                    (ts,) = struct.unpack(">I", mh[12:16])
                meta["sample_rate"] = ts or None
    return meta


def _id3_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent)."""
    if not payload.startswith(ID3_MAGIC) or len(payload) < 10:
        return 0
    b = payload[6:10]
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]  # syncsafe
    return 10 + size


def parse_mp3_meta(payload: bytes) -> dict:
    """{duration_s, sample_rate} from the first MPEG audio frame
    header; CBR-assumed duration from the audio byte length."""
    off = _id3_size(payload)
    end = min(len(payload) - 4, off + 65536)  # bounded sync search
    pos = off
    while pos <= end:
        info = _frame_info(payload, pos)
        if info is not None:
            _frame_len, sample_rate, bitrate = info
            audio_bytes = len(payload) - off
            return {
                "duration_s": int(audio_bytes * 8 / bitrate + 0.5),
                "sample_rate": sample_rate,
            }
        pos += 1
    raise ValueError("no MPEG audio frame header found")
