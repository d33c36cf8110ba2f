"""Every query with a declared oracle must hash-match DuckDB at
sf0.001 — the local mirror of the driver's t2 gate (sf0.01)."""

from __future__ import annotations

import pytest

from map_reduce_mongodb_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, ddb, ORACLE_SQL[name], name=name)


def test_every_query_has_fn():
    missing = set(ORACLE_SQL) - set(QUERIES)
    assert not missing, f"oracle without query fn: {missing}"
