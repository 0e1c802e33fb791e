"""README registry counts must match the shipped registry.

ADVICE r06: the README's query counts went stale two rounds running.
This pins them to the live registry so growth without a doc refresh
fails the suite instead of shipping a wrong evidence narrative.
"""

from pathlib import Path

from calaveras_uniteus_etl_spark.plans import REGISTRY

README = Path(__file__).resolve().parents[1] / "README.md"


def test_readme_counts_match_registry():
    text = README.read_text()
    total = len(REGISTRY)
    oracled = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert f"{total} named queries, {oracled} paired" in text
    assert f"registry is at {total}, {oracled} oracled" in text
