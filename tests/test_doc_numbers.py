"""Committed docs must agree with the json artifacts they cite.

Three consecutive rounds found stale numbers in README/STATUS vs the
driver's BENCH_r*.json artifacts or later re-measurements (VERDICT r4
weak #4); tools/check_doc_numbers.py greps the claims and this test makes
drift a suite failure.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import check_doc_numbers  # noqa: E402


def test_doc_numbers_consistent():
    errors = check_doc_numbers.check(verbose=True)
    assert not errors, "\n".join(errors)


def test_checker_catches_drift(tmp_path, monkeypatch):
    """The checker itself must detect a planted inconsistency (guards
    against the checker regexes rotting into no-ops)."""
    root = tmp_path
    (root / "docs").mkdir()
    (root / "BENCH_r02.json").write_text(
        '{"parsed": {"value": 100.0, "vs_baseline": 10.0, '
        '"decode_mfu": 0.3}}')
    (root / "README.md").write_text(
        "headline (BENCH_r02.json: 200.0 captions/sec, vs_baseline 10.0) "
        "measured 9-11× and 1,390 imgs/sec/chip")
    (root / "docs" / "STATUS.md").write_text("demand 889 imgs/sec/chip")
    monkeypatch.setattr(check_doc_numbers, "ROOT", str(root))
    errors = check_doc_numbers.check(verbose=False)
    assert any("value 200.0" in e for e in errors), errors
    assert any("disagree" in e for e in errors), errors
