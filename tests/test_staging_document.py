"""A7 input staging + A12 annual-report document tests.

Staging: per-file isolation, overwrite-by-name, md5 listing identity,
and composition with A2 discovery. Document: deterministic payload
from fixture tables, markdown section parity with the reference's
Word layout (report_export.py), import-guarded binary renderers.
"""

from __future__ import annotations

import pytest

from calaveras_uniteus_etl_spark.reports import document as D
from calaveras_uniteus_etl_spark.reports.filters import ReportFilters
from calaveras_uniteus_etl_spark.sources.discovery import discover_files
from calaveras_uniteus_etl_spark.sources.staging import (
    StageResult,
    list_staged,
    stage_files,
)

AS_OF = "2026-01-01 00:00:00"


# --- A7 staging -------------------------------------------------------------


def test_stage_files_lands_and_reports(tmp_path):
    d = str(tmp_path / "input")
    results = stage_files(d, {"people_20250101.txt": b"a|b\n1|2\n", "notes.txt": b"x|y\n"})
    assert all(r.success for r in results)
    assert {r.filename: r.size for r in results} == {
        "people_20250101.txt": 8,
        "notes.txt": 4,
    }
    listing = list_staged(d)
    assert [e["filename"] for e in listing] == ["notes.txt", "people_20250101.txt"]
    assert all(len(e["md5"]) == 32 for e in listing)


def test_stage_files_per_file_isolation(tmp_path):
    d = str(tmp_path / "input")
    results = stage_files(d, {"../escape.txt": b"evil", "ok.txt": b"fine"})
    by_name = {r.filename: r for r in results}
    assert not by_name["../escape.txt"].success
    assert by_name["ok.txt"].success
    assert [e["filename"] for e in list_staged(d)] == ["ok.txt"]
    assert not (tmp_path / "escape.txt").exists()


def test_stage_overwrites_by_name_and_feeds_discovery(tmp_path):
    d = str(tmp_path / "input")
    stage_files(d, {"people_20250101.txt": b"v1"})
    [res] = stage_files(d, {"people_20250101.txt": b"version-2"})
    assert res == StageResult(
        "people_20250101.txt", True, 9, "File people_20250101.txt staged successfully"
    )
    [entry] = list_staged(d)
    assert entry["size"] == 9  # replaced, not appended
    tasks = discover_files(d)
    assert [t.table_name for t in tasks] == ["people"]


def test_list_staged_missing_dir():
    assert list_staged("/nonexistent/nowhere") == []


# --- A12 annual report ------------------------------------------------------


@pytest.fixture(scope="module")
def report(spark):
    people = spark.createDataFrame(
        [
            ("p1", "1990-06-15 00:00:00", "female", "Angels Camp", "Calaveras", "CA"),
            ("p2", "1950-01-01 00:00:00", "male", "San Andreas", "Calaveras", "CA"),
            ("p3", None, None, None, None, None),
        ],
        "person_id string, date_of_birth string, gender string, "
        "city string, county string, state string",
    )
    cases = spark.createDataFrame(
        [
            ("c1", "p1", "open", "Housing", "2025-11-01 00:00:00",
             "2025-12-20 00:00:00", None),
            ("c2", "p1", "closed", "Food", "2025-06-01 00:00:00",
             "2025-06-11 12:00:00", "2025-06-11 12:00:00"),
            ("c3", "p2", "open", "Housing", "2025-12-15 00:00:00",
             "2025-12-16 00:00:00", None),
        ],
        "case_id string, person_id string, case_status string, service_type string, "
        "case_created_at string, case_updated_at string, case_closed_at string",
    )
    referrals = spark.createDataFrame(
        [
            ("r1", "p1", "accepted", "Housing", "ProvA", "ProvB", "2025-11-02 00:00:00"),
            ("r2", "p2", "declined", "Food", "ProvB", "ProvA", "2025-12-01 00:00:00"),
        ],
        "referral_id string, person_id string, referral_status string, "
        "service_type string, sending_provider_name string, "
        "receiving_provider_name string, referral_created_at string",
    )
    ar = spark.createDataFrame([("a1", "p3")], "request_id string, person_id string")
    return D.build_annual_report(
        people, cases, referrals, ar, ReportFilters(),
        as_of=AS_OF, generated_at="2026-01-02 00:00:00", username="tester",
    )


def test_report_summary_counts(report):
    assert report["summary"] == {
        "total_people": 3,
        "total_cases": 3,
        "total_referrals": 2,
        "total_assistance_requests": 1,
    }


def test_report_sections_bounded_and_shaped(report):
    assert [r["service_type"] for r in report["service_overview"]] == ["Housing", "Food"]
    assert {r["status"]: r["count"] for r in report["outcomes"]} == {
        "accepted": 1,
        "declined": 1,
    }
    # both providers appear as directed edges
    assert len(report["network"]) == 2
    # resolved cases only (c2): Food avg 10.5 days
    perf = {r["service_type"]: r["avg_days"] for r in report["program_performance"]}
    assert perf == {"Food": 10.5}


def test_markdown_renders_reference_sections(report):
    md = D.render_markdown(report)
    for heading in [
        "# Annual Report",
        "## Executive Summary",
        "## Service Overview",
        "## Client Demographics",
        "## Network Collaboration",
        "## Program Performance Metrics",
        "## Geographic Distribution",
        "## Service Outcomes",
    ]:
        assert heading in md
    assert "- Total clients: 3" in md
    assert "- Generated by: tester" in md


def test_binary_renderers_import_guarded(report, tmp_path):
    # neither python-docx nor reportlab ships in this environment; the
    # guards must raise the reference's install-hint ImportError
    with pytest.raises((ImportError, NotImplementedError)):
        D.render_docx(report, str(tmp_path / "r.docx"))
    with pytest.raises((ImportError, NotImplementedError)):
        D.render_pdf(report, str(tmp_path / "r.pdf"))


def test_row_cap_breach_is_observable(spark):
    """_ROW_CAP is defensive-only (every handler is top-k-capped
    upstream), so an actual clip means an upstream bug — it must raise,
    never silently truncate (round-10 advice item), and the message
    must name the offending section so the bug is locatable (round-11
    advice item)."""
    at_cap = spark.range(D._ROW_CAP).select("id")
    assert len(D._rows(at_cap, "at_cap")) == D._ROW_CAP  # exactly at cap: fine
    over = spark.range(D._ROW_CAP + 1).select("id")
    with pytest.raises(ValueError, match="'network'.*_ROW_CAP"):
        D._rows(over, "network")
