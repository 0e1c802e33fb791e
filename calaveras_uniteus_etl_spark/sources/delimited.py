"""Pipe-delimited text scan with encoding fallback (SURVEY.md A1).

Re-expresses the reference's ``_read_file`` (/root/reference/core/
etl_service.py:635-657): ``sep='|'``, ``quotechar='"'``, header row,
every column read as string (SQLite-affinity parity — casting happens
later against the declared schema), null sentinels
``'', NULL, null, None``, and encoding fallback utf-8 → latin-1 →
cp1252.

Spark's CSV reader takes one encoding per read, so fallback is a
cheap driver-side probe of the first bytes rather than a full-file
retry loop: the probe decides the encoding, the distributed read runs
once. At 100 TB the read stays fully parallel (CSV is splittable when
not multiline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_VALUES = ("", "NULL", "null", "None")
ENCODING_CHAIN = ("utf-8", "latin-1", "cp1252")

# Spark's CSV reader accepts only a charset whitelist; latin-1/cp1252
# read as iso-8859-1 (byte-complete: every byte decodes, matching the
# reference's fallback intent).
_SPARK_CHARSETS = {"utf-8": "utf-8", "latin-1": "iso-8859-1", "cp1252": "iso-8859-1"}


def detect_encoding(path: str, probe_bytes: int = 1 << 20) -> str:
    """First encoding in the chain that decodes the head of the file.

    latin-1 decodes any byte sequence, so the chain effectively means
    "utf-8 when valid, else latin-1" — same outcome as the reference's
    try/except ladder without re-reading the whole file per attempt.
    """
    with open(path, "rb") as f:
        head = f.read(probe_bytes)
    for enc in ENCODING_CHAIN:
        try:
            head.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    return ENCODING_CHAIN[-1]


def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str = "|",
    encoding: str | None = None,
    with_line_number: bool = False,
) -> DataFrame:
    """All-string scan of one delimited file.

    ``with_line_number=True`` adds a per-file monotonic ``_line_no``
    used by the upsert's within-batch keep-last semantics (the
    reference's sequential-UPDATE outcome depends on row order; SURVEY
    §7.3).
    """
    enc = encoding or detect_encoding(path)
    reader = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", _SPARK_CHARSETS.get(enc, enc))
        .option("nullValue", "")
        .option("inferSchema", False)
    )
    df = reader.csv(path)
    # normalize the full sentinel set (the CSV option handles only one)
    sentinel_cols = [
        F.when(F.col(c).isin(*[s for s in NULL_VALUES if s]), None)
        .otherwise(F.col(c))
        .alias(c)
        for c in df.columns
    ]
    df = df.select(*sentinel_cols)
    if with_line_number:
        df = df.withColumn("_line_no", F.monotonically_increasing_id())
    return df
