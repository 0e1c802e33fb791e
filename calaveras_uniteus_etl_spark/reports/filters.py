"""Composable report filters (SURVEY.md D1-D3; reference
/root/reference/core/reports/filters.py).

The reference concatenates SQL-text WHERE fragments; here the same
semantics are ``Column`` predicates applied to DataFrames, which
Catalyst pushes into the scans. The per-table date-column map is
preserved as config.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# table → filter date column (reference filters.py:16-31)
DATE_COLUMNS = {
    "referrals": "referral_updated_at",
    "cases": "case_updated_at",
    "assistance_requests": "updated_at",
}


@dataclass(frozen=True)
class ReportFilters:
    start_date: str | None = None
    end_date: str | None = None
    status: str | None = None
    service_type: str | None = None
    provider: str | None = None
    program: str | None = None

    @property
    def has_date(self) -> bool:
        return bool(self.start_date or self.end_date)


def apply_date_range(df: DataFrame, date_col: str, f: ReportFilters) -> DataFrame:
    """Inclusive [start, end] range; string ISO comparison in the
    reference works lexicographically, typed timestamps here order the
    same way (SURVEY §7.3 trap #3)."""
    out = df
    if f.start_date:
        out = out.filter(F.col(date_col) >= F.lit(f.start_date).cast("timestamp"))
    if f.end_date:
        out = out.filter(F.col(date_col) <= F.lit(f.end_date).cast("timestamp"))
    return out


def apply_facets(df: DataFrame, f: ReportFilters, table: str) -> DataFrame:
    """Status / service / provider / program facets (filters.py:57-131).
    Referrals match provider against sending OR receiving sides."""
    out = df
    if f.status:
        col = "referral_status" if table == "referrals" else "case_status"
        out = out.filter(F.col(col) == f.status)
    if f.service_type:
        out = out.filter(F.col("service_type") == f.service_type)
    if f.provider:
        if table == "referrals":
            out = out.filter(
                (F.col("sending_provider_name") == f.provider)
                | (F.col("receiving_provider_name") == f.provider)
            )
        else:
            out = out.filter(F.col("provider_name") == f.provider)
    if f.program:
        col = "sending_program_name" if table == "referrals" else "program_name"
        out = out.filter(F.col(col) == f.program)
    return out


def apply_report_filters(df: DataFrame, table: str, f: ReportFilters) -> DataFrame:
    out = df
    date_col = DATE_COLUMNS.get(table)
    if date_col and f.has_date:
        out = apply_date_range(out, date_col, f)
    return apply_facets(out, f, table)


def demographics_base(
    people: DataFrame, cases: DataFrame, f: ReportFilters
) -> tuple[DataFrame, bool]:
    """Demographics gating (filters.py:134-158): with a date filter the
    base becomes people ⋈ cases filtered on case_updated_at and
    aggregates must COUNT(DISTINCT person_id); without, it is a plain
    people scan with COUNT(*). Returns (base, needs_distinct)."""
    if not f.has_date:
        return people, False
    gated = apply_date_range(cases, "case_updated_at", f).select("person_id").distinct()
    return people.join(gated, "person_id"), True
