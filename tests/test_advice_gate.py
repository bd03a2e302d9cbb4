"""The advice-drift gate stage (tools/advice_check.py): every
ADVICE.md item needs a recorded resolution with a verifiable
predicate; synthetic stale/regressed entries must FAIL the check
(r7 verdict #3 'a synthetic stale entry fails it in a test')."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import advice_check  # noqa: E402

ROOT = advice_check.ROOT


def test_current_advice_all_resolved():
    advice = open(os.path.join(ROOT, "ADVICE.md")).read()
    errors = advice_check.check(advice, advice_check.RESOLUTIONS)
    assert errors == [], errors
    # and the parser actually saw the items (not a vacuous pass)
    assert len(advice_check.parse_items(advice)) >= 1


def test_unresolved_synthetic_item_fails():
    advice = (
        "# ADVICE\n\n"
        "- **high** p6__mapreduce_spark/queries.py:1 — a brand-new defect "
        "nobody has recorded a resolution for.\n"
        "  _Do something about it._\n"
    )
    errors = advice_check.check(advice, advice_check.RESOLUTIONS)
    assert len(errors) == 1 and "UNRESOLVED" in errors[0]


def test_regressed_fix_pattern_fails():
    advice = (
        "- **low** bench.py:1 — synthetic old defect description.\n"
        "  _Fix it._\n"
    )
    resolutions = [
        {
            "name": "synthetic-regressed",
            "file": "bench.py",
            "match": "synthetic old defect",
            "status": "fixed",
            "must_match": r"this_pattern_does_not_exist_anywhere_x9z",
            "must_not_match": None,
        }
    ]
    errors = advice_check.check(advice, resolutions)
    assert len(errors) == 1 and "regressed" in errors[0]


def test_reappeared_defect_pattern_fails():
    advice = (
        "- **low** bench.py:1 — synthetic defect whose pattern is back.\n"
        "  _Fix it._\n"
    )
    resolutions = [
        {
            "name": "synthetic-defect-back",
            "file": "bench.py",
            "match": "whose pattern is back",
            "status": "fixed",
            "must_match": None,
            # something guaranteed present in bench.py
            "must_not_match": r"headline_queries_total_runtime",
        }
    ]
    errors = advice_check.check(advice, resolutions)
    assert len(errors) == 1 and "still present" in errors[0]


def test_parser_extracts_severity_file_line():
    advice = open(os.path.join(ROOT, "ADVICE.md")).read()
    items = advice_check.parse_items(advice)
    for it in items:
        assert it["severity"] in {"low", "medium", "high"}
        assert it["line"] >= 1
        # cited files exist
        assert os.path.exists(os.path.join(ROOT, it["file"])), it["file"]
