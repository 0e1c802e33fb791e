"""Registry queries for the parameterized report-handler families
(SURVEY.md §3 report surface): geographic rollup, household scatter,
touchpoints, and service pathways — filled in alongside
``reports/handlers.py``.
"""

from __future__ import annotations
