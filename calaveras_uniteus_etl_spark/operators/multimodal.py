"""Multimodal (binary-payload) column plumbing.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the shape a
100 TB media pipeline needs: payloads never pass through Python
row-at-a-time, batches stream through the worker (no whole-partition
materialization), and the output schema is a fixed contract so
downstream plans stay columnar.

Decode is REAL for formats numpy + the standard library can handle —
PNG incl. indexed-color (zlib inflate + unfilter), GIF (LZW +
interlace), PCM WAV (RIFF) via functions/codecs.py, and baseline
JPEG (Huffman + IDCT) via functions/jpeg.py, TIFF (strips or tiles;
none/LZW/deflate/PackBits compression; palette; predictor 2),
and uncompressed BMP — dispatched on magic bytes. MP4 and MP3 parse REAL container metadata (duration,
dimensions, sample rate) via functions/containers.py; their sample
decode, and arithmetic/12-bit JPEG, go through a Pillow import
guard and raise ``NotImplementedError`` when it is absent. Payloads
with no recognizable magic (the driver's synthetic testdata) fall
back to the
DETERMINISTIC FAKE decode — md5-derived pseudo-dimensions — which
keeps every bit of the Spark-side plumbing (schema, batching,
partitioning, UDF signature) oracle-checkable: the differential gate
runs on opaque payloads, the real-codec path is pytest-covered with
constructed PNG/WAV fixtures.
"""

from __future__ import annotations

import hashlib
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from calaveras_uniteus_etl_spark.functions import codecs

MEDIA_TYPES = ("image", "audio", "video")

# Output contract of extract_features — fixed, engine-facing.
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, digest string, "
    "width int, height int, duration_s int, sample_rate int"
)


def decode_media(payload: bytes, media_type: str) -> dict:
    """Real decode: PNG, GIF, PCM WAV, and baseline + progressive JPEG
    natively (functions/codecs.py, functions/jpeg.py); arithmetic/
    12-bit JPEG via Pillow when installed.

    Raises ``NotImplementedError`` for formats with no available codec
    (e.g. video containers without libav) rather than silently faking;
    ``ValueError`` for payloads with no recognizable magic.
    """
    kind = codecs.sniff_media(payload)
    if kind == "png":
        return codecs.decode_png(payload)
    if kind == "wav":
        return codecs.decode_wav(payload)
    if kind in ("jpeg", "tiff", "bmp"):
        return codecs.decode_image_any(payload)  # native-first dispatch
    if kind == "gif":
        return codecs.decode_gif(payload)
    if kind in ("mp4", "mp3"):
        # container METADATA parses natively (functions/containers.py,
        # used by _real_features below); pixel/sample access would
        # need libav, which is not in this environment
        raise NotImplementedError(
            f"{kind} sample decode requires libav; container metadata "
            "is available via extract_features"
        )
    raise ValueError(
        f"unrecognized {media_type} payload (no known magic bytes); "
        "extract_features falls back to the deterministic fake decode"
    )


def _real_features(payload: bytes, media_type: str) -> dict | None:
    """Feature dict via the real codecs, or None when the payload has
    no recognizable magic (synthetic testdata -> fake path)."""
    kind = codecs.sniff_media(payload)
    if kind is None:
        return None
    base = {
        "n_bytes": len(payload),
        "digest": hashlib.md5(payload).hexdigest(),
        "width": None,
        "height": None,
        "duration_s": None,
        "sample_rate": None,
    }
    if kind in ("mp4", "mp3"):
        # real container metadata without sample decode — duration,
        # dims, sample rate straight from moov / the MPEG frame header
        from calaveras_uniteus_etl_spark.functions import containers

        try:
            meta = (
                containers.parse_mp4_meta(payload)
                if kind == "mp4"
                else containers.parse_mp3_meta(payload)
            )
        except (ValueError, struct.error):
            return base  # corrupt container: quarantine on NULL dims
        base.update({k: meta.get(k) for k in base if k in meta})
        return base
    try:
        decoded = decode_media(payload, media_type)
    except NotImplementedError:
        # Recognized format, no codec available (e.g. arithmetic
        # JPEG without Pillow): identity features with NULL dimensions
        # — never a fake decode of a real payload. Downstream
        # quarantines on NULL dims.
        return base
    except (ValueError, OSError, EOFError, zlib.error, struct.error,
            wave.Error):
        # A truncated/corrupt payload (valid PNG/RIFF magic, bad body)
        # must quarantine as a NULL-dims row, not kill the whole
        # mapInPandas job — one bad file in a 100 TB batch cannot be a
        # job-level failure. The catch is the codec error surface
        # only: genuine engine bugs (TypeError, MemoryError, ...)
        # still crash loudly.
        return base
    base.update(
        {
            k: decoded.get(k)
            for k in ("width", "height", "duration_s", "sample_rate")
        }
    )
    return base


def _fake_features(payload: bytes, media_type: str) -> dict:
    """Deterministic pseudo-decode: md5-derived dimensions.

    The formulas are mirrored exactly by the DuckDB oracle
    (plans/queries_multimodal.py), making the whole mapInPandas path
    hash-checkable end to end.
    """
    digest = hashlib.md5(payload).hexdigest()
    h1 = int(digest[:15], 16)
    h2 = int(digest[15:30], 16)
    out = {
        "n_bytes": len(payload),
        "digest": digest,
        "width": None,
        "height": None,
        "duration_s": None,
        "sample_rate": None,
    }
    if media_type == "image":
        out["width"] = h1 % 1920 + 1
        out["height"] = h2 % 1080 + 1
    elif media_type == "audio":
        out["duration_s"] = h1 % 600 + 1
        out["sample_rate"] = 8000 + (h2 % 8) * 4000
    else:  # video
        out["duration_s"] = h1 % 600 + 1
        out["width"] = h1 % 1920 + 1
        out["height"] = h2 % 1080 + 1
    return out


def _masked_i32(vals: np.ndarray, keep: np.ndarray) -> pd.arrays.IntegerArray:
    return pd.arrays.IntegerArray(vals.astype("int32"), mask=~keep)


def _fake_feature_frame(
    doc_ids: np.ndarray, media_types: np.ndarray, payloads: list[bytes]
) -> pd.DataFrame:
    """Vectorized fake decode for a whole batch of unrecognized
    payloads: md5 per row (C-speed hashlib), every derived column
    computed columnarly with numpy — identical formulas to
    ``_fake_features``, without the per-row dict/DataFrame-of-dicts
    construction that dominated the old kernel (guide §4.2: hand whole
    batches to vectorized code)."""
    n = len(payloads)
    digests = [hashlib.md5(p).hexdigest() for p in payloads]
    h1 = np.fromiter((int(d[:15], 16) for d in digests), dtype=np.int64, count=n)
    h2 = np.fromiter((int(d[15:30], 16) for d in digests), dtype=np.int64, count=n)
    mt = np.asarray(media_types, dtype=object)
    img = mt == "image"
    aud = mt == "audio"
    vid = ~(img | aud)
    has_dims = img | vid
    has_dur = aud | vid
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "media_type": media_types,
            "n_bytes": np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n
            ),
            "digest": digests,
            "width": _masked_i32(h1 % 1920 + 1, has_dims),
            "height": _masked_i32(h2 % 1080 + 1, has_dims),
            "duration_s": _masked_i32(h1 % 600 + 1, has_dur),
            "sample_rate": _masked_i32(8000 + (h2 % 8) * 4000, aud),
        }
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one output row per media row, per batch.

    Streams Arrow batches — peak memory is one batch, not one
    partition, which is what keeps this viable when payloads are MBs.
    Batches with no recognizable magic anywhere (the synthetic-corpus
    common case) take a fully vectorized fake-decode path; batches
    containing real payloads fall back to the per-row codec dispatch.
    """
    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        if not any(codecs.sniff_media(p) for p in payloads):
            yield _fake_feature_frame(
                pdf["doc_id"].values, pdf["media_type"].values, payloads
            )
            continue
        feats = [
            _real_features(p, mt) or _fake_features(p, mt)
            for p, mt in zip(payloads, pdf["media_type"])
        ]
        out = pd.DataFrame(feats)
        out.insert(0, "media_type", pdf["media_type"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out.astype(
            {
                "width": "Int32",
                "height": "Int32",
                "duration_s": "Int32",
                "sample_rate": "Int32",
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extract a media DataFrame(doc_id, payload, media_type).

    Arrow-batched; no shuffle — a narrow map over whatever partitioning
    the payload table already has (at scale: size partitions by bytes,
    ``spark.sql.files.maxPartitionBytes``, not row count).
    """
    return media.select("doc_id", "payload", "media_type").mapInPandas(
        _extract_batches, schema=FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Resize planning + frame sampling — the remaining two media plumbing
# stages. Same contract as extract_features: real Arrow mapInPandas
# path, deterministic fake decode, integer-only arithmetic so the
# DuckDB oracle mirrors every output bit.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "out_width int, out_height int, resized boolean"
)

FPS = 24  # fake decoder's constant frame rate
FRAME_EVERY_N = 48  # sample one frame every 2 seconds
FRAME_MAX = 16  # per-video cap

FRAME_SCHEMA = "doc_id bigint, frame_idx int, t_offset_ms bigint"


def resize_fit(w: int, h: int, tw: int, th: int) -> tuple[int, int, bool]:
    """Aspect-preserving fit into (tw, th), integer arithmetic only.

    Never upscales. The binding side is chosen by cross-multiplication
    and the other side floors — no floating-point scale factor, so any
    engine reproduces the output dims exactly.
    """
    if w <= tw and h <= th:
        return w, h, False
    if tw * h >= th * w:  # height is the binding constraint
        return (w * th) // h, th, True
    return tw, (h * tw) // w, True


def _resize_batches(tw: int, th: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                f = _fake_features(bytes(p), mt)
                if f["width"] is None:  # audio: nothing to resize
                    rows.append((doc_id, mt, None, None, None, None, False))
                    continue
                ow, oh, scaled = resize_fit(f["width"], f["height"], tw, th)
                rows.append(
                    (doc_id, mt, f["width"], f["height"], ow, oh, scaled)
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height",
                    "out_width", "out_height", "resized",
                ],
            )
            yield out.astype(
                {c: "Int32" for c in ("width", "height", "out_width", "out_height")}
            )

    return kernel


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Plan aspect-preserving resizes for image/video payloads.

    Narrow Arrow map, no shuffle; a production deployment swaps the
    fake dimension probe for the real decoder and emits the resized
    payload bytes alongside — the schema/batching contract is already
    the real one.
    """
    return media.select("doc_id", "payload", "media_type").mapInPandas(
        _resize_batches(target_w, target_h), schema=RESIZE_SCHEMA
    )


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, idxs, offs = [], [], []
        for doc_id, p, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
            if mt != "video":
                continue
            f = _fake_features(bytes(p), mt)
            n_frames = f["duration_s"] * FPS
            k = 0
            while k * FRAME_EVERY_N < n_frames and k < FRAME_MAX:
                fi = k * FRAME_EVERY_N
                ids.append(doc_id)
                idxs.append(fi)
                offs.append(fi * 1000 // FPS)
                k += 1
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "t_offset_ms": offs}
        ).astype({"frame_idx": "Int32"} if ids else {})


def sample_frames(media: DataFrame) -> DataFrame:
    """Sample every-Nth-frame indices per video, capped per doc.

    One output row per sampled frame (doc_id, frame_idx, t_offset_ms);
    the real decoder would attach the frame payload per row. Row fan-
    out happens inside the Arrow batch — never a driver-side loop.
    """
    return media.select("doc_id", "payload", "media_type").mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA
    )
