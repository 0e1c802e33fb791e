"""Custom column expressions shared by the engine.

Only two expressions in the whole reference surface are not directly
covered by a Spark built-in (SURVEY.md §7.2): SQLite's ``%Y-W%W`` week
bucketing and fractional-day ``julianday`` arithmetic. Both live in
``datetime_ext``. ``hashing`` adds deterministic cross-engine hash
primitives used by the dedup/similarity extension operators.
"""

from calaveras_uniteus_etl_spark.functions.datetime_ext import (  # noqa: F401
    julian_day_diff,
    sqlite_week,
    to_day,
    to_month,
)
from calaveras_uniteus_etl_spark.functions.hashing import (  # noqa: F401
    md5_long,
    md5_long_seeded,
    salted_sha256,
)
