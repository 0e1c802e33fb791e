"""Cross-engine parity on adversarial inputs.

The dedup/similarity/text operators are only as deterministic as their
primitives: ``md5_long`` (+ seeded family), the whitespace-normalizer,
and shingling. This suite feeds both engines a corpus of edge-case
strings — unicode, quotes, regex metacharacters, exotic whitespace,
empty/short docs — and asserts bit-identical outputs, so a driver-canon
mismatch can never originate below the query layer.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.functions.hashing import (
    duckdb_md5_long_seeded_sql,
    duckdb_md5_long_sql,
    md5_long,
    md5_long_seeded,
)
from calaveras_uniteus_etl_spark.operators.dedup import NORM_DUCK, NORM_SPARK

EDGE_STRINGS = [
    "",
    " ",
    "\t\n  \t",
    "plain ascii",
    "Ünïcödé — naïve café",
    "emoji 🎉🔥 and 中文 混合",
    "O'Brien \"quoted\" text",
    "regex .* meta [chars] (everywhere) \\ backslash",
    "trailing spaces   ",
    "   leading spaces",
    "multi\n\nline\r\nwindows",
    "a",
    "word " * 50,
    "UPPER lower MiXeD",
    "tab\tseparated\tvalues",
    "null\x00byte-free",  # NUL handled as text, not terminator
    "ñ español, français, 日本語テキスト",
    "1234567890 !@#$%^&*()",
]


@pytest.fixture(scope="module")
def frames(spark):
    rows = [(i, sval) for i, sval in enumerate(EDGE_STRINGS)]
    sdf = spark.createDataFrame(rows, "id int, s string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    yield sdf, con
    con.close()


def _spark_map(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


def _duck_map(con, expr):
    return dict(con.execute(f"SELECT id, {expr} FROM t ORDER BY id").fetchall())


def test_md5_long_parity(frames):
    sdf, con = frames
    assert _spark_map(sdf, md5_long("s")) == _duck_map(con, duckdb_md5_long_sql("s"))


@pytest.mark.parametrize("seed", [0, 1, 7, 11])
def test_md5_long_seeded_parity(frames, seed):
    sdf, con = frames
    assert _spark_map(sdf, md5_long_seeded("s", seed)) == _duck_map(
        con, duckdb_md5_long_seeded_sql("s", seed)
    )


def test_normalizer_parity(frames):
    sdf, con = frames
    assert _spark_map(sdf, F.expr(NORM_SPARK.format(col="s"))) == _duck_map(
        con, NORM_DUCK.format(col="s")
    )


def test_md5_hex_parity(frames):
    # raw md5 hex (content_hash / fingerprint paths) — byte-identical
    # utf-8 hashing is what x1/x10/x16 rely on
    sdf, con = frames
    assert _spark_map(sdf, F.md5("s")) == _duck_map(con, "md5(s)")


def test_tokenize_after_norm_parity(frames):
    sdf, con = frames
    s = _spark_map(
        sdf, F.expr(f"array_join(split({NORM_SPARK.format(col='s')}, ' '), '|')")
    )
    d = _duck_map(
        con,
        f"array_to_string(string_split({NORM_DUCK.format(col='s')}, ' '), '|')",
    )
    assert s == d


def test_oracle_harness_detects_perturbation(spark):
    """Meta-test: the differential harness must FAIL when one value is
    off — a harness that passes everything is worse than none (the
    round-1 lenient canon masked 8 driver failures)."""
    from calaveras_uniteus_etl_spark.plans.catalog import REGISTRY, QuerySpec
    from tests.oracle_harness import compare

    name = "_perturb_probe"
    try:
        REGISTRY[name] = QuerySpec(
            name=name,
            # off-by-one vs the oracle's COUNT(*)
            fn=lambda s, d: s.sql("SELECT 501 AS n"),
            oracle="SELECT CAST(COUNT(*) AS INT) AS n FROM documents",
            doc="harness self-test",
        )
        r = compare(spark, "/root/testdata/sf0.01", name)
        assert not r["values_match"], "harness accepted a wrong value"
        # and the same shape with the right value must pass
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=lambda s, d: s.sql("SELECT CAST(500 AS INT) AS n"),
            oracle="SELECT CAST(COUNT(*) AS INT) AS n FROM documents",
            doc="harness self-test",
        )
        r = compare(spark, "/root/testdata/sf0.01", name)
        assert r["values_match"], r
    finally:
        REGISTRY.pop(name, None)


def test_exact_dedup_is_idempotent(spark):
    """Dedup survivors re-deduped are unchanged (pass-2 is a no-op)."""
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pass1 = d.withColumn("h", F.md5("text")).dropDuplicates(["h"])
    pass2 = pass1.dropDuplicates(["h"])
    assert pass1.count() == pass2.count()
    # and the SAME digests survive both passes
    s1 = {r.h for r in pass1.select("h").collect()}
    s2 = {r.h for r in pass2.select("h").collect()}
    assert s1 == s2
