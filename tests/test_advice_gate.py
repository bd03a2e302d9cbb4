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


# ---------------------------------------------------------------------------
# doc-drift rows-only prose gate (tools/doc_drift.py, r9 verdict #4)
# ---------------------------------------------------------------------------

import doc_drift  # noqa: E402


def test_doc_drift_current_tree_clean():
    """The shipped tree passes both doc-drift checks (and the scan is
    not vacuous — the repo has dozens of historical mentions)."""
    assert "==" in doc_drift.check_coverage_footer()
    msg = doc_drift.check_rows_only_prose()
    n = int(msg.split()[0])
    assert n >= 20, msg


def test_doc_drift_flags_the_exact_r9_stale_sentence():
    """The sentence that actually went stale in r9 (operators/hll.py's
    old module docstring) must fail the gate when _ROWS_ONLY is empty."""
    stale = [
        "Portable HyperLogLog with an EXACT oracle.",
        "",
        "``approx_stats`` uses Spark's built-in HLL++ whose register layout is",
        "engine-private, so that query gets only a rows-only driver check.",
        "This module is the portable counterpart.",
    ]
    n, offending = doc_drift.scan_lines(stale, rows_only=set())
    assert n == 1 and offending == [3]


def test_doc_drift_exempts_genuinely_rows_only_queries():
    """If a query really is in _ROWS_ONLY, present-tense prose naming
    it is allowed — the gate checks agreement, not bans the phrase."""
    prose = ["my_sketch gets a rows-only driver check (engine-private)."]
    n, offending = doc_drift.scan_lines(prose, rows_only={"my_sketch"})
    assert n == 1 and offending == []
    n2, offending2 = doc_drift.scan_lines(prose, rows_only=set())
    assert offending2 == [0]


def test_doc_drift_accepts_superseded_history():
    prose = [
        "approx_stats was rows-only until r9 (SUPERSEDED: portable",
        "sketch, hash-oracled since).",
    ]
    _, offending = doc_drift.scan_lines(prose, rows_only=set())
    assert offending == []


def test_doc_drift_rows_only_set_parses():
    """The literal parser must find the pinned empty-set assignment
    (the advice gate pins the same source line)."""
    assert doc_drift._rows_only_set() == set()
