"""PHI hashing over configured fields (SURVEY.md B5).

The reference's only custom scalar function (/root/reference/core/
etl_service.py:720-739 + core/config.py:225-243): per configured
column, ``sha256(salt + value + salt)`` hexdigest, skipping
null/empty/'nan' values. Expressed entirely with Spark built-ins
(``sha2``/``concat``) — JVM-side, codegen-friendly, zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from calaveras_uniteus_etl_spark.config import PHIConfig
from calaveras_uniteus_etl_spark.functions.hashing import salted_sha256


def hash_phi_fields(df: DataFrame, table: str, phi: PHIConfig) -> DataFrame:
    """Hash the configured PHI columns of ``table`` in place."""
    if not phi.enabled:
        return df
    targets = [c for c in phi.fields.get(table, ()) if c in df.columns]
    out = df
    for c in targets:
        out = out.withColumn(c, salted_sha256(c, phi.salt))
    return out
