"""Driver-gate rehearsal: every registered query vs its DuckDB oracle
on the sf0.001 testdata (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sparkfeat import queries as q
from sparkfeat.oracle import check_query


@pytest.mark.parametrize("name", sorted({**q.QUERIES, **q.EXTRA_QUERIES}))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, "\n".join(problems)


def test_driver_registry_at_most_50():
    """The driver samples 50 queries per round; a registry larger than
    that leaves queries unverified every round. Strategy twins belong in
    EXTRA_QUERIES (driver=False)."""
    assert len(q.QUERIES) <= 50, sorted(q.QUERIES)
    # every driver query is oracle-backed (the strong gate)
    assert set(q.QUERIES) == set(q.ORACLES)


def test_canon_signed_zero_is_sql_aware():
    """_canon_signed_zero must leave quoted literals and non-ROUND
    identifiers alone, and survive parens/quotes inside ROUND args."""
    c = q._canon_signed_zero
    assert c("SELECT ROUND(x, 6)") == "SELECT (ROUND(x, 6) + 0.0)"
    # literal containing ROUND( stays verbatim
    assert c("SELECT 'use ROUND(x)' AS s") == "SELECT 'use ROUND(x)' AS s"
    # identifier ending in ROUND is not a match
    assert c("SELECT WORKAROUND(x)") == "SELECT WORKAROUND(x)"
    # unbalanced paren inside a quoted ROUND argument
    assert (
        c("SELECT ROUND(len(concat(s, '(')), 2)")
        == "SELECT (ROUND(len(concat(s, '(')), 2) + 0.0)"
    )
    # '' escape inside a literal
    assert c("SELECT 'it''s ROUND(' AS s") == "SELECT 'it''s ROUND(' AS s"
    # nested ROUND: outer wrapped, inner left as part of the outer's text
    assert c("ROUND(ROUND(x, 2), 1)") == "(ROUND(ROUND(x, 2), 1) + 0.0)"
