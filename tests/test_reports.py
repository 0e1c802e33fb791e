"""Fixture tests for the healthcare report handlers and analytical views.

Small hand-built people/cases/referrals/employees tables with
hand-computed expectations — the unit-semantics tier the reference's
own test suite models (SURVEY.md §5): filter gating, NULL defaulting,
bucket ordering, funnel arithmetic, view shapes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from calaveras_uniteus_etl_spark.reports.filters import ReportFilters
from calaveras_uniteus_etl_spark.reports import handlers as H
from calaveras_uniteus_etl_spark.reports.views import register_views

AS_OF = "2026-01-01 00:00:00"


@pytest.fixture(scope="module")
def fixture_tables(spark):
    people = spark.createDataFrame(
        [
            ("p1", "Ann", "Ayes", "1990-06-15 00:00:00", "female", "white",
             "450", 1, "Angels Camp", "Calaveras", "CA"),
            ("p2", "Bob", "Bee", "1950-01-01 00:00:00", "male", None,
             "abc", 4, "San Andreas", "Calaveras", "CA"),
            ("p3", "Cal", "Cee", None, None, "asian", "3000", None, None,
             None, None),
            ("p4", "Dee", "Dye", "2010-03-03 00:00:00", "female", "white",
             None, 7, "Angels Camp", "Calaveras", "CA"),
        ],
        "person_id string, first_name string, last_name string, "
        "date_of_birth string, gender string, race string, "
        "gross_monthly_income string, "
        "household_size long, city string, county string, state string",
    )
    cases = spark.createDataFrame(
        [
            ("c1", "p1", "open", "Housing", "Rent Assistance", "ProvA", "w1",
             "2025-11-01 00:00:00", "2025-12-20 00:00:00", None, None),
            ("c2", "p1", "closed", "Food", "Food Pantry", "ProvA", "w1",
             "2025-06-01 00:00:00", "2025-06-11 12:00:00", "2025-06-11 12:00:00",
             "resolved"),
            ("c3", "p2", "open", "Housing", "Rent Assistance", "ProvB", "w2",
             "2025-12-15 00:00:00", "2025-12-16 00:00:00", None, None),
            ("c4", "p3", "resolved", None, None, "ProvB", None,
             "2025-03-01 00:00:00", "2025-03-31 00:00:00", "2025-03-31 00:00:00",
             "unresolved"),
        ],
        "case_id string, person_id string, case_status string, "
        "service_type string, service_subtype string, provider_name string, "
        "primary_worker_id string, "
        "case_created_at string, case_updated_at string, case_closed_at string, "
        "outcome string",
    )
    referrals = spark.createDataFrame(
        [
            ("r1", "p1", "c1", "accepted", "ProvA", "ProvB", "ProgX",
             "Housing",
             "2025-12-01 00:00:00", "2025-12-01 00:00:00",
             "2025-12-02 00:00:00", "2025-12-03 00:00:00"),
            ("r2", "p2", "c3", "declined", "ProvA", "ProvB", "ProgX", "Food",
             "2025-12-15 00:00:00", "2025-12-15 00:00:00", None, None),
            ("r3", "p3", "c4", "accepted", "ProvB", "ProvA", "ProgY",
             "Housing",
             "2025-03-02 00:00:00", "2025-03-02 00:00:00",
             "2025-03-04 00:00:00", None),
            ("r4", "p1", "c1", "pending", "ProvA", "ProvA", None, "Housing",
             "2025-12-05 00:00:00", None, None, None),
        ],
        "referral_id string, person_id string, case_id string, "
        "referral_status string, sending_provider_name string, "
        "receiving_provider_name string, receiving_program_name string, "
        "service_type string, "
        "referral_created_at string, sent_at string, accepted_at string, "
        "completed_at string",
    )
    ar = spark.createDataFrame(
        [
            ("a1", "c1", "p1", "housed", "veteran", "army",
             "2025-12-01 00:00:00"),
            ("a2", "c2", "p1", "at-risk", "", None, "2025-06-05 00:00:00"),
            ("a3", "c3", "p2", "unhoused", "family_member", "navy",
             "2025-12-16 00:00:00"),
        ],
        "ar_id string, case_id string, person_id string, "
        "housing_current_status string, mil_affiliation string, "
        "mil_branch string, updated_at string",
    )
    employees = spark.createDataFrame(
        [
            ("w1", "Wyn", "One", "ProvA"),
            ("w2", "Wes", "Two", "ProvB"),
            ("w3", "Wil", "Tri", "ProvB"),
        ],
        "employee_id string, employee_first_name string, "
        "employee_last_name string, provider_name string",
    )
    for name, df in [
        ("people", people), ("cases", cases),
        ("referrals", referrals), ("employees", employees),
        ("assistance_requests", ar),
    ]:
        df.createOrReplaceTempView(name)
    return dict(
        people=people, cases=cases, referrals=referrals,
        employees=employees, ar=ar,
    )


def test_demographic_distribution_null_default(spark, fixture_tables):
    t = fixture_tables
    rows = H.demographic_distribution(t["people"], t["cases"], "gender").collect()
    got = {r["gender"]: r["count"] for r in rows}
    assert got == {"female": 2, "male": 1, "Not Specified": 1}
    # date gating switches to the joined COUNT(DISTINCT person_id) path
    f = ReportFilters(start_date="2025-12-01 00:00:00", end_date="2025-12-31 00:00:00")
    rows = H.demographic_distribution(t["people"], t["cases"], "gender", f).collect()
    got = {r["gender"]: r["count"] for r in rows}
    assert got == {"female": 1, "male": 1}  # p1 (c1 updated Dec), p2 (c3)


def test_age_and_income_buckets(spark, fixture_tables):
    t = fixture_tables
    ages = {r["age_bracket"]: r["count"]
            for r in H.age_distribution(t["people"], t["cases"], AS_OF).collect()}
    assert ages == {"35-44": 1, "65+": 1, "0-17": 1}  # p3 has NULL dob → excluded
    rows = H.income_distribution(t["people"]).collect()
    got = {r["income_bracket"]: r["count"] for r in rows}
    # 'abc' parses as 0 (SQLite CAST parity), NULL income → 0 → No Income
    assert got == {"No Income": 2, "$1-999": 1, "$2,500-4,999": 1}
    assert [r["income_bracket"] for r in rows] == [
        "No Income", "$1-999", "$2,500-4,999"
    ]  # custom bucket order, not count order


def test_status_distribution_and_facets(spark, fixture_tables):
    t = fixture_tables
    got = {r["status"]: r["count"]
           for r in H.status_distribution(t["cases"], "cases").collect()}
    assert got == {"open": 2, "closed": 1, "resolved": 1}
    f = ReportFilters(provider="ProvB")
    got = {r["status"]: r["count"]
           for r in H.status_distribution(t["referrals"], "referrals", f).collect()}
    # referrals provider matches sending OR receiving: r1, r2 (recv), r3 (send)
    assert got == {"accepted": 2, "declined": 1}


def test_resolution_time(spark, fixture_tables):
    rows = H.resolution_time_by_service(fixture_tables["cases"]).collect()
    got = {r["service_type"]: (r["avg_days"], r["resolved_cases"]) for r in rows}
    assert got == {"Food": (10.5, 1), "Unknown": (30.0, 1)}


def test_provider_network_edges_excludes_self(spark, fixture_tables):
    rows = H.provider_network_edges(fixture_tables["referrals"]).collect()
    pairs = {(r["sending_provider_name"], r["receiving_provider_name"]):
             (r["referral_count"], r["acceptance_rate"]) for r in rows}
    # r4 ProvA→ProvA self-edge excluded
    assert pairs == {("ProvA", "ProvB"): (2, 0.5), ("ProvB", "ProvA"): (1, 1.0)}


def test_referral_funnel(spark, fixture_tables):
    r = H.referral_funnel(fixture_tables["referrals"]).collect()[0]
    assert (r["created"], r["sent"], r["accepted"], r["completed"]) == (4, 3, 2, 1)
    assert r["completion_pct"] == 25.0


def test_timeline_week_bucketing(spark, fixture_tables):
    rows = H.timeline(fixture_tables["referrals"], "referral_created_at", "week").collect()
    got = {r["period"]: r["count"] for r in rows}
    # 2025-03-02 is a Sunday → still week 08 (Mondays-elapsed count);
    # Dec 1 is a Monday → r1 + r4 (Dec 5) share W48, Dec 15 → W50
    assert got == {"2025-W08": 1, "2025-W48": 2, "2025-W50": 1}


def test_cases_by_location(spark, fixture_tables):
    t = fixture_tables
    rows = H.cases_by_location(t["people"], t["cases"]).collect()
    got = [(r["city"], r["county"], r["state"], r["case_count"]) for r in rows]
    # p3 has NULL city → c4 excluded; p4 has an address but no cases
    assert got == [
        ("Angels Camp", "Calaveras", "CA", 2),
        ("San Andreas", "Calaveras", "CA", 1),
    ]
    f = ReportFilters(start_date="2025-12-01 00:00:00")
    rows = H.cases_by_location(t["people"], t["cases"], f=f).collect()
    # only c1 (updated Dec 20) and c3 (Dec 16) pass the date gate
    assert [(r["city"], r["case_count"]) for r in rows] == [
        ("Angels Camp", 1), ("San Andreas", 1)
    ]


def test_household_scatter_buckets(spark, fixture_tables):
    t = fixture_tables
    rows = H.household_scatter(t["people"], t["cases"]).collect()
    got = {r["household_category"]: (r["case_count"], r["client_count"])
           for r in rows}
    # p1 (hh=1) has c1+c2; p2 (hh=4) has c3; p3 (hh NULL) has c4
    assert got == {
        "1 person": (2, 1), "4-5 people": (1, 1), "Unknown": (1, 1)
    }


def test_touchpoint_averages(spark, fixture_tables):
    t = fixture_tables
    r = H.touchpoint_averages(
        t["people"], t["cases"], t["referrals"], t["ar"]
    ).collect()[0]
    assert r["total_clients"] == 4
    # AVG skips clients with no rows in a source (LEFT JOIN NULLs):
    # cases p1:2 p2:1 p3:1; referrals p1:2 p2:1 p3:1; ARs p1:2 p2:1
    assert r["avg_cases_per_client"] == pytest.approx(4 / 3)
    assert r["avg_referrals_per_client"] == pytest.approx(4 / 3)
    assert r["avg_assistance_requests_per_client"] == pytest.approx(1.5)


def test_touchpoint_distribution(spark, fixture_tables):
    t = fixture_tables
    rows = H.touchpoint_distribution(
        t["people"], t["cases"], t["referrals"], t["ar"]
    ).collect()
    got = [(r["touchpoint_range"], r["client_count"]) for r in rows]
    # totals: p1=6 → 4-6, p2=3 → 2-3, p3=2 → 2-3, p4=0 → NULL range last
    assert got == [("2-3", 2), ("4-6", 1), (None, 1)]


def test_service_pathways(spark, fixture_tables):
    t = fixture_tables
    rows = H.service_pathways(t["cases"], t["referrals"]).collect()
    # c1 (Housing, Nov 1) → r1 (Dec 1, +30d) and r4 (Dec 5, +34d);
    # r2 is NOT strictly after c3's creation (same instant) → dropped;
    # c4 has NULL service_type → dropped
    assert [(r["initial_service"], r["referral_service"],
             r["pathway_count"], r["avg_days_between"]) for r in rows] == [
        ("Housing", "Housing", 2, 32.0)
    ]
    assert H.service_pathways(
        t["cases"], t["referrals"], min_count=3
    ).count() == 0


def test_views_shapes(spark, fixture_tables):
    register_views(spark, as_of=AS_OF)
    active = spark.sql("SELECT * FROM v_active_cases").collect()
    assert {r["case_id"] for r in active} == {"c1", "c3"}
    assert {r["worker_name"] for r in active} == {"Wyn One", "Wes Two"}
    wl = {r["employee_id"]: (r["total_cases"], r["open_cases"])
          for r in spark.sql("SELECT * FROM v_employee_workload").collect()}
    assert wl == {"w1": (2, 1), "w2": (1, 1), "w3": (0, 0)}
    flow = spark.sql("SELECT * FROM v_referral_flow").collect()
    assert {r["referral_id"] for r in flow} == {"r1", "r2", "r4"}  # 90-day window
    journey = {r["person_id"]: r["total_cases"]
               for r in spark.sql("SELECT * FROM v_client_journey").collect()}
    assert journey == {"p1": 2, "p2": 1, "p3": 1, "p4": 0}


def test_referral_conversion_rates(spark, fixture_tables):
    rows = H.referral_conversion_rates(
        fixture_tables["referrals"], min_total=1
    ).collect()
    got = {
        r["service_type"]: (
            r["total_referrals"], r["accepted"], r["declined"],
            r["pending"], r["acceptance_rate"],
        )
        for r in rows
    }
    assert got == {"Housing": (3, 2, 0, 1, 66.7), "Food": (1, 0, 1, 0, 0.0)}
    # default min_total=5 excludes everything in the 4-row fixture
    assert H.referral_conversion_rates(fixture_tables["referrals"]).count() == 0


def test_case_outcomes(spark, fixture_tables):
    rows = H.case_outcomes(fixture_tables["cases"]).collect()
    got = {r["resolution_type"]: r["count"] for r in rows}
    assert got == {"resolved": 1, "unresolved": 1}  # NULL outcomes excluded


def test_provider_performance(spark, fixture_tables):
    rows = H.provider_performance(fixture_tables["cases"], min_cases=1).collect()
    assert [r["provider"] for r in rows] == ["ProvA", "ProvB"]  # avg_days tiebreak
    a, b = rows
    assert (a["total_cases"], a["unique_clients"], a["active_cases"],
            a["closed_cases"], a["avg_days"], a["completion_rate"]) == (
        2, 1, 1, 1, 10.5, 50.0)
    assert (b["total_cases"], b["unique_clients"], b["active_cases"],
            b["closed_cases"], b["avg_days"], b["completion_rate"]) == (
        2, 2, 1, 0, 30.0, 0.0)  # 'resolved' status is not in the closed list


def test_high_risk_drop_off(spark, fixture_tables):
    rows = H.high_risk_drop_off(fixture_tables["referrals"], min_total=1).collect()
    got = [(r["service_type"], r["total_referrals"], r["drop_off_rate"])
           for r in rows]
    assert got == [("Food", 1, 100.0), ("Housing", 3, 0.0)]  # rate-ranked


def test_employee_workload(spark, fixture_tables):
    rows = H.employee_workload(
        fixture_tables["employees"], fixture_tables["cases"]
    ).collect()
    got = [(r["employee_name"], r["provider"], r["active_cases"],
            r["total_cases"], r["resolved_cases"], r["resolution_rate"])
           for r in rows]
    # w3 has no cases → dropped by HAVING; fixture statuses are not in
    # the reference's active list (active/managed/processed) → 0
    assert got == [("Wyn One", "ProvA", 0, 2, 1, 50.0),
                   ("Wes Two", "ProvB", 0, 1, 0, 0.0)]


def test_top_providers(spark, fixture_tables):
    r = fixture_tables["referrals"]
    sending = [(x["provider"], x["count"])
               for x in H.top_providers(r, "sending").collect()]
    assert sending == [("ProvA", 3), ("ProvB", 1)]
    # receiving ties 2-2 → name ascending breaks it
    receiving = [(x["provider"], x["count"])
                 for x in H.top_providers(r, "receiving").collect()]
    assert receiving == [("ProvA", 2), ("ProvB", 2)]


def test_top_programs(spark, fixture_tables):
    rows = H.top_programs(fixture_tables["referrals"]).collect()
    got = [(r["program_name"], r["total_referrals"], r["accepted_referrals"],
            r["acceptance_rate"]) for r in rows]
    # r4 has no program → excluded from the denominator entirely
    assert got == [("ProgX", 2, 1, 50.0), ("ProgY", 1, 1, 100.0)]


def test_veteran_services(spark, fixture_tables):
    ar = fixture_tables["ar"]
    aff = [(r["affiliation"], r["count"])
           for r in H.veteran_services(ar, "affiliation").collect()]
    # a2's blank affiliation is excluded like the reference's != ''
    assert aff == [("family_member", 1), ("veteran", 1)]
    br = [(r["branch"], r["count"])
          for r in H.veteran_services(ar, "branch").collect()]
    assert br == [("army", 1), ("navy", 1)]


def test_service_subtypes(spark, fixture_tables):
    rows = H.service_subtypes(fixture_tables["cases"]).collect()
    got = [(r["service_type"], r["service_subtype"], r["count"])
           for r in rows]
    assert got == [("Housing", "Rent Assistance", 2), ("Food", "Food Pantry", 1)]


def test_outcome_distribution(spark, fixture_tables):
    rows = H.outcome_distribution(fixture_tables["cases"]).collect()
    got = {r["resolution_type"]: r["count"] for r in rows}
    # NULL outcomes surface as 'Not Recorded' (unlike case_outcomes)
    assert got == {"Not Recorded": 2, "resolved": 1, "unresolved": 1}


def test_time_to_resolution(spark, fixture_tables):
    rows = H.time_to_resolution(fixture_tables["cases"]).collect()
    # c4 closed but service_type NULL → excluded; only c2 (Food) remains
    assert [(r["service_type"], r["avg_days_to_close"], r["closed_count"])
            for r in rows] == [("Food", 10.5, 1)]


def test_housing_impact(spark, fixture_tables):
    rows = H.housing_impact(
        fixture_tables["cases"], fixture_tables["ar"]
    ).collect()
    got = {r["housing_status"]: (r["case_count"], r["avg_resolution_days"])
           for r in rows}
    assert got == {
        "housed": (1, None),        # c1 open → no resolution average
        "at-risk": (1, 10.5),       # c2 closed after 10.5 days
        "unhoused": (1, None),      # c3 open
        "Not Specified": (1, 30.0), # c4 has no assistance request
    }


def test_demographic_correlation(spark, fixture_tables):
    t = fixture_tables
    gender = [(r["service"], r["gender"], r["case_count"])
              for r in H.demographic_correlation(
                  t["cases"], t["people"], "gender_by_service").collect()]
    assert gender == [("Food", "female", 1), ("Housing", "female", 1),
                      ("Housing", "male", 1)]
    age = [(r["service"], r["age_group"], r["case_count"])
           for r in H.demographic_correlation(
               t["cases"], t["people"], "age_by_service", as_of=AS_OF
           ).collect()]
    assert age == [("Food", "35-44", 1), ("Housing", "35-44", 1),
                   ("Housing", "65+", 1)]
    race = [(r["race"], r["status"], r["case_count"])
            for r in H.demographic_correlation(
                t["cases"], t["people"], "race_by_outcome").collect()]
    assert race == [("Unknown", "open", 1), ("asian", "resolved", 1),
                    ("white", "closed", 1), ("white", "open", 1)]
    with pytest.raises(ValueError):
        H.demographic_correlation(t["cases"], t["people"], "nope")


def test_geographic_distribution(spark, fixture_tables):
    t = fixture_tables
    city = [(r["city"], r["case_count"], r["client_count"])
            for r in H.geographic_distribution(
                t["cases"], t["people"], "city").collect()]
    # p3 has no city → Unknown; p1 two cases, one client
    assert city == [("Angels Camp", 2, 1), ("San Andreas", 1, 1),
                    ("Unknown", 1, 1)]
    county = [(r["county"], r["case_count"])
              for r in H.geographic_distribution(
                  t["cases"], t["people"], "county").collect()]
    assert county == [("Calaveras", 3), ("Unknown", 1)]


def test_provider_performance_metrics(spark, fixture_tables):
    r = fixture_tables["referrals"]
    rows = H.provider_performance_metrics(r, "sending", min_referrals=1).collect()
    got = [(x["provider_name"], x["total_referrals"], x["acceptance_rate"],
            x["completion_rate"], x["avg_response_days"]) for x in rows]
    # ProvA sends r1 (accepted, 1 day to accept), r2 (declined),
    # r4 (pending); ProvB sends r3 (accepted, 2 days)
    assert got == [("ProvA", 3, 33.3, 0.0, 1.0), ("ProvB", 1, 100.0, 0.0, 2.0)]
    # default HAVING >= 3 drops ProvB
    kept = [x["provider_name"]
            for x in H.provider_performance_metrics(r, "sending").collect()]
    assert kept == ["ProvA"]


def test_referral_network(spark, fixture_tables):
    rows = H.referral_network(
        fixture_tables["referrals"], min_referrals=1).collect()
    got = [(x["source"], x["target"], x["referral_count"],
            x["unique_clients"], x["acceptance_rate"]) for x in rows]
    # r4 is a self-edge (ProvA→ProvA) → excluded
    assert got == [("ProvA", "ProvB", 2, 2, 50.0),
                   ("ProvB", "ProvA", 1, 1, 100.0)]


def test_summary_counts_with_filters(spark, fixture_tables):
    t = fixture_tables
    row = H.summary_counts(t["people"], t["cases"], t["referrals"], t["ar"]).first()
    assert (
        row.total_people, row.total_cases,
        row.total_referrals, row.total_assistance_requests,
    ) == (4, 4, 4, 3)
    # a service-type filter gates cases and referrals, never people/ar
    f = ReportFilters(service_type="Housing")
    row = H.summary_counts(t["people"], t["cases"], t["referrals"], t["ar"], f).first()
    assert (row.total_people, row.total_cases, row.total_referrals) == (4, 2, 3)


def test_top_service_types_excludes_null_and_caps(spark, fixture_tables):
    got = [
        (r.service_type, r["count"])
        for r in H.top_service_types(fixture_tables["cases"], "cases", n=1).collect()
    ]
    # Housing(2) beats Food(1); c4's NULL service_type never appears
    assert got == [("Housing", 2)]


def test_cohort_retention_returning_clients(spark, fixture_tables):
    rows = {
        r.cohort: (r.cohort_size, r.returned, r.retention_pct)
        for r in H.cohort_retention(fixture_tables["cases"]).collect()
    }
    # p1's first case is 2025-06 (c2); c1 in 2025-11 makes p1 a returner
    assert rows["2025-06"] == (1, 1, 100.0)
    # p2 (2025-12) and p3 (2025-03) never return
    assert rows["2025-12"] == (1, 0, 0.0)
    assert rows["2025-03"] == (1, 0, 0.0)
    # cohorts key on the FIRST month only — one row per person here
    assert sum(size for size, _, _ in rows.values()) == 3


@pytest.fixture(scope="module")
def share_tables(spark):
    lists = spark.createDataFrame(
        [
            ("L1", "p1", "ProvA", "ProgX", "Housing", "2025-12-01 00:00:00"),
            ("L2", "p2", "ProvA", "ProgX", "Food", "2025-12-02 00:00:00"),
            ("L3", "p3", "ProvB", "ProgY", "Housing", "2025-12-03 00:00:00"),
            ("L4", "p1", "ProvB", "ProgY", "Food", "2025-12-04 00:00:00"),
        ],
        "id string, person_id string, provider_name string, "
        "program_name string, service_type string, created_at string",
    )
    shares = spark.createDataFrame(
        [
            ("S1", "L1", "p1", "w1", "ann@x.org", "email", "en",
             "2025-12-05 00:00:00"),
            ("S2", "L1", "p1", "w1", "+1555", "sms", "en",
             "2025-12-06 00:00:00"),
            ("S3", "L1", "p4", "w2", "dee@x.org", "email", "es",
             "2025-12-07 00:00:00"),
            ("S4", "L2", "p2", "w1", "bob@x.org", "email", "en",
             "2025-12-08 00:00:00"),
            ("S5", "L3", "p3", "w9", "cal@x.org", None, None,
             "2025-12-09 00:00:00"),
        ],
        "id string, resource_list_id string, person_id string, "
        "shared_by_employee_id string, shared_to string, "
        "share_method string, share_language string, created_at string",
    )
    return dict(lists=lists, shares=shares)


def test_share_activity_summary(spark, share_tables, fixture_tables):
    r = H.share_activity_summary(
        share_tables["lists"], share_tables["shares"]
    ).collect()[0]
    assert (
        r.lists_created, r.share_events, r.lists_shared, r.persons_reached
    ) == (4, 5, 3, 4)
    assert abs(r.shares_per_list - round(5 / 3, 2)) < 1e-9
    # date gating trims both sides
    f = ReportFilters(
        start_date="2025-12-03 00:00:00", end_date="2025-12-07 00:00:00"
    )
    r = H.share_activity_summary(
        share_tables["lists"], share_tables["shares"], f
    ).collect()[0]
    assert (r.lists_created, r.share_events, r.lists_shared) == (2, 3, 1)


def test_shares_by_method_mix(spark, share_tables):
    rows = H.shares_by_method(share_tables["shares"]).collect()
    got = {(r.method, r.language): (r.share_count, r.pct_of_total) for r in rows}
    assert got == {
        ("email", "en"): (2, 40.0),
        ("email", "es"): (1, 20.0),
        ("sms", "en"): (1, 20.0),
        ("Not Specified", "Not Specified"): (1, 20.0),
    }
    # deterministic ordering: volume desc then name
    assert rows[0].method == "email" and rows[0].language == "en"


def test_top_sharing_employees(spark, share_tables, fixture_tables):
    rows = H.top_sharing_employees(
        share_tables["shares"], fixture_tables["employees"]
    ).collect()
    assert [
        (r.employee_name, r.share_count, r.lists_shared, r.persons_reached)
        for r in rows
    ] == [
        ("Wyn One", 3, 2, 2),
        ("Not Specified", 1, 1, 1),  # w9 missing from employees dim
        ("Wes Two", 1, 1, 1),
    ]


def test_shared_list_reach_buckets(spark, share_tables):
    rows = H.shared_list_reach(
        share_tables["lists"], share_tables["shares"]
    ).collect()
    got = {r.reach: (r.list_count, r.share_events) for r in rows}
    # L1: 3 shares, L2: 1, L3: 1, L4: never shared
    assert got == {
        "2-3 shares": (1, 3),
        "shared once": (2, 2),
        "never shared": (1, 0),
    }
