"""Driver-gate rehearsal: every registered query vs its DuckDB oracle
on the sf0.001 testdata (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sparkfeat import queries as q
from sparkfeat.oracle import check_query


@pytest.mark.parametrize("name", sorted(q.QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, "\n".join(problems)
