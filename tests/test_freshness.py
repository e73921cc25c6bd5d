"""Doc freshness is CI-enforced (tools/check_freshness.py): the shipped
bench headline must be quoted by SCALING.md/README.md, and README's stated
test count must match what pytest actually collects. Stale numbers were a
recurring review finding (rounds 2-4) — these tests end the class."""

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import check_freshness  # noqa: E402


def test_scaling_and_readme_quote_the_shipped_headline():
    assert check_freshness.check_docs() == []


def test_shipped_headline_parses():
    d3, d0 = check_freshness.parse_shipped_headline(
        (REPO / "docs" / "PERF.md").read_text())
    assert float(d3) > 0 and float(d0) >= float(d3)


def test_readme_test_count_matches_collection(request):
    """README's 'N tests' claim vs the live collection count. Only
    meaningful when the whole suite was collected — running a subset
    (pytest tests/test_foo.py, -k filters) skips."""
    items = request.session.items
    collected_files = {Path(i.fspath).name for i in items}
    suite_files = {p.name for p in (REPO / "tests").glob("test_*.py")}
    if collected_files != suite_files or request.config.option.keyword:
        pytest.skip("partial collection — run the full suite to enforce")
    stated = check_freshness.stated_readme_test_count(
        (REPO / "README.md").read_text())
    assert stated == len(items), (
        f"README.md says {stated} tests; the suite collects {len(items)} — "
        "update README.md:'N tests' (tools/check_freshness.py checks this "
        "too)")


def test_doc_quote_matcher():
    # exact float, integer round-down, and no false substring matches
    assert check_freshness.doc_quotes_number("runs at 577.7 samples/s",
                                             "577.7")
    assert check_freshness.doc_quotes_number("**Training**: 577 samples/s",
                                             "577.7")
    assert not check_freshness.doc_quotes_number("was 1577.7 before", "577.7")
    assert not check_freshness.doc_quotes_number("at 577.75 rounds", "577.7")
    assert not check_freshness.doc_quotes_number("only 490 and 616 here",
                                                 "577.7")


def test_stated_count_parser():
    assert check_freshness.stated_readme_test_count("| 216 tests: x |") == 216
    with pytest.raises(ValueError):
        check_freshness.stated_readme_test_count("no counts here")
