"""The five analytical views (reference /root/reference/core/
database_schema.py:393-471), as view-registering Spark SQL.

``register_views(spark, as_of)`` creates them over whatever table
views are currently registered (warehouse or test fixtures). The
reference's ``date('now', '-N days')`` windows take an injectable
``as_of`` so results are deterministic (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def view_sql(as_of: str) -> dict[str, str]:
    return {
        # v_active_cases — database_schema.py:393-413
        "v_active_cases": f"""
            SELECT c.case_id, c.person_id,
                   concat_ws(' ', p.first_name, p.last_name) AS client_name,
                   c.case_status, c.service_type, c.provider_name,
                   c.case_created_at, c.case_updated_at,
                   e.employee_id AS worker_id,
                   concat_ws(' ', e.employee_first_name, e.employee_last_name)
                     AS worker_name
            FROM cases c
            LEFT JOIN people p ON c.person_id = p.person_id
            LEFT JOIN employees e ON c.primary_worker_id = e.employee_id
            WHERE c.case_status NOT IN ('closed', 'resolved')
        """,
        # v_referral_flow — database_schema.py:415-429
        "v_referral_flow": f"""
            SELECT r.referral_id, r.referral_status,
                   r.sending_provider_name, r.receiving_provider_name,
                   r.service_type, r.referral_created_at,
                   c.case_id, c.case_status
            FROM referrals r
            LEFT JOIN cases c ON r.case_id = c.case_id
            WHERE r.referral_created_at >=
                  timestamp'{as_of}' - INTERVAL 90 DAYS
        """,
        # v_employee_workload — database_schema.py:431-441
        "v_employee_workload": """
            SELECT e.employee_id, e.employee_first_name, e.employee_last_name,
                   e.provider_name,
                   COUNT(c.case_id) AS total_cases,
                   SUM(CASE WHEN c.case_status = 'open' THEN 1 ELSE 0 END)
                     AS open_cases
            FROM employees e
            LEFT JOIN cases c ON c.primary_worker_id = e.employee_id
            GROUP BY e.employee_id, e.employee_first_name,
                     e.employee_last_name, e.provider_name
        """,
        # v_service_demand — database_schema.py:443-453
        "v_service_demand": f"""
            SELECT service_type,
                   COUNT(*) AS request_count,
                   COUNT(DISTINCT person_id) AS unique_clients,
                   ROUND(SUM((unix_micros(CAST(case_closed_at AS TIMESTAMP))
                        - unix_micros(CAST(case_created_at AS TIMESTAMP))) / 86400e6)
                        / COUNT(case_closed_at), 1) AS avg_resolution_days
            FROM cases
            WHERE case_created_at >= timestamp'{as_of}' - INTERVAL 30 DAYS
            GROUP BY service_type
        """,
        # v_client_journey — database_schema.py:455-471
        "v_client_journey": """
            SELECT p.person_id,
                   concat_ws(' ', p.first_name, p.last_name) AS client_name,
                   COUNT(DISTINCT c.case_id) AS total_cases,
                   MIN(c.case_created_at) AS first_contact,
                   MAX(c.case_updated_at) AS last_activity
            FROM people p
            LEFT JOIN cases c ON p.person_id = c.person_id
            GROUP BY p.person_id, p.first_name, p.last_name
        """,
    }


def register_views(spark: SparkSession, as_of: str = "2026-01-01 00:00:00") -> None:
    for name, sql in view_sql(as_of).items():
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
