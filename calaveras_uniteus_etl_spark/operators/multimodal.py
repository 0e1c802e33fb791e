"""Multimodal (binary-payload) column plumbing.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the shape a
100 TB media pipeline needs: payloads never pass through Python
row-at-a-time, batches stream through the worker (no whole-partition
materialization), and the output schema is a fixed contract so
downstream plans stay columnar.

The actual codec work (PIL/libav/librosa) is NOT available in this
environment, so :func:`decode_media` is a clearly-marked stub behind an
import-try, and :func:`extract_features` runs a DETERMINISTIC FAKE
decode — md5-derived pseudo-dimensions — that keeps every bit of the
Spark-side plumbing (schema, batching, partitioning, UDF signature)
real and oracle-checkable. Swap ``_fake_features`` for a real decoder
and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_TYPES = ("image", "audio", "video")

# Output contract of extract_features — fixed, engine-facing.
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, digest string, "
    "width int, height int, duration_s int, sample_rate int"
)


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Real decode hook — unavailable in this container.

    A production deployment plugs PIL (image), libav (video) or
    soundfile/librosa (audio) in here; the container has none of them,
    so this raises rather than silently faking.
    """
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "extract_features uses the deterministic fake decode instead"
        )
    raise NotImplementedError("real decode not wired yet")


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


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one output row per media row, per batch.

    Streams Arrow batches — peak memory is one batch, not one
    partition, which is what keeps this viable when payloads are MBs.
    """
    for pdf in batches:
        feats = [
            _fake_features(bytes(p), mt)
            for p, mt in zip(pdf["payload"], pdf["media_type"])
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
