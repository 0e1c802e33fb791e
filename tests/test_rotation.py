"""Invariants of the derived driver check-window rotation.

The registry order the driver walks is derived at import time from the
CORRECTNESS_r*.json evidence files (plans/__init__._reorder_registry).
These tests pin the properties three rounds of hand-rotation kept
breaking: the hint list resolves to real registered names, unwitnessed
queries are front-loaded oldest-first, witnessed ones never occupy the
check window, and a failed driver row rotates its query back to the
front.
"""

import json

from calaveras_uniteus_etl_spark.plans import (
    _ADDITION_ORDER,
    _ROWS_ONLY_LAST,
    _driver_green_names,
    REGISTRY,
)

WINDOW = 50  # the driver has checked 50 entries per round so far


def test_hint_names_all_registered_and_unique():
    # ADVICE r06: a typo'd name would silently drop a query from the
    # front-loaded window — pin every hint entry to a real registration
    assert len(_ADDITION_ORDER) == len(set(_ADDITION_ORDER))
    missing = [n for n in _ADDITION_ORDER if n not in REGISTRY]
    assert missing == []
    assert len(set(_ROWS_ONLY_LAST) & set(_ADDITION_ORDER)) == 0


def test_front_of_registry_is_unwitnessed():
    # the round's check window (first WINDOW names) must consist solely
    # of names with no green driver row — otherwise the round re-proves
    # old evidence and the debt never drains
    green = _driver_green_names()
    names = list(REGISTRY)
    debt = [n for n in names if n not in green and n not in _ROWS_ONLY_LAST]
    front = names[: min(WINDOW, len(debt))]
    witnessed_in_window = [n for n in front if n in green]
    assert witnessed_in_window == []


def test_debt_is_contiguous_prefix_and_rows_only_last():
    green = _driver_green_names()
    names = list(REGISTRY)
    n_debt = sum(1 for n in names if n not in green and n not in _ROWS_ONLY_LAST)
    prefix = names[:n_debt]
    assert all(n not in green for n in prefix)
    assert all(n in green or n in _ROWS_ONLY_LAST for n in names[n_debt:])
    for pinned in _ROWS_ONLY_LAST:
        assert pinned in names[-len(_ROWS_ONLY_LAST):]


def test_debt_ordered_by_addition_hint():
    green = _driver_green_names()
    names = list(REGISTRY)
    debt = [n for n in names if n not in green and n not in _ROWS_ONLY_LAST]
    hint_pos = {n: i for i, n in enumerate(_ADDITION_ORDER)}
    positions = [hint_pos[n] for n in debt if n in hint_pos]
    assert positions == sorted(positions)


def test_green_extraction_semantics(tmp_path):
    # green = no err + rows matched + hash MATCHED; a hash-less row
    # (hash_match None) counts only for rows-only-by-design queries
    # (_ROWS_ONLY_LAST membership or an explicit rows_only flag) — a
    # driver timeout that skips hashing must not retire an oracled
    # query on row-count evidence alone (ADVICE r07). A failing row
    # must NOT count (so regressions rotate back to the front).
    rows = {
        "good_hash": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        "good_flagged_rows_only": {"rows_match": True, "schema_match": None,
                                   "hash_match": None, "err": None,
                                   "rows_only": True},
        "f2_approx_count_distinct": {"rows_match": True, "schema_match": None,
                                     "hash_match": None, "err": None},
        "hashless_oracled": {"rows_match": True, "schema_match": True,
                             "hash_match": None, "err": None},
        "bad_hash": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "bad_rows": {"rows_match": False, "schema_match": None,
                     "hash_match": None, "err": None},
        "bad_err": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    # a later round fixing the error must win over the earlier failure
    (tmp_path / "CORRECTNESS_r100.json").write_text(
        json.dumps({"bad_err": {"rows_match": True, "schema_match": True,
                                "hash_match": True, "err": None}})
    )
    green = _driver_green_names(root=tmp_path)
    assert green == {
        "good_hash",
        "good_flagged_rows_only",
        "f2_approx_count_distinct",
        "bad_err",
    }


def test_archived_evidence_still_counts(tmp_path):
    """Superseded receipts live in evidence/archive/ (round-9 hygiene
    move); their green rows must keep counting, or archiving a round
    would silently turn its witnessed queries back into rotation
    debt."""
    good = {"rows_match": True, "schema_match": True,
            "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r50.json").write_text(
        json.dumps({"live_q": good})
    )
    arch = tmp_path / "evidence" / "archive"
    arch.mkdir(parents=True)
    (arch / "CORRECTNESS_r01.json").write_text(
        json.dumps({"archived_q": good})
    )
    assert _driver_green_names(root=tmp_path) == {"live_q", "archived_q"}


def test_unreadable_evidence_file_does_not_crash(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(["a", "list"]))
    assert _driver_green_names(root=tmp_path) == set()


def test_evidence_root_resolution_found_files(monkeypatch):
    # ADVICE r07: if the default root resolution (or an override) finds
    # zero evidence files while the registry is non-empty, every query
    # silently counts as unwitnessed debt and the rotation is defeated.
    # Pin that the import-time derivation actually parsed files in this
    # checkout, and that the env override is honored.
    import calaveras_uniteus_etl_spark.plans as plans

    _driver_green_names()  # default root = this repo checkout
    assert plans._EVIDENCE_FILES_PARSED > 0, (
        "no CORRECTNESS_r*.json parsed from the default evidence root — "
        "rotation would treat all queries as unwitnessed"
    )

    monkeypatch.setenv("SPARK_GRAFT_EVIDENCE_ROOT", "/nonexistent/path")
    assert _driver_green_names() == set()
    assert plans._EVIDENCE_FILES_PARSED == 0
    monkeypatch.delenv("SPARK_GRAFT_EVIDENCE_ROOT")
    _driver_green_names()
    assert plans._EVIDENCE_FILES_PARSED > 0
