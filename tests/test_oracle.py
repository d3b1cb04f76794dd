"""The driver's t2 check, run locally: every [oracle] query in
SURVEY §2 must produce the identical (order-insensitive) result on
Spark and DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from redmap_spark.inventory import ORACLES, QUERIES
from tests.conftest import assert_matches_oracle


def test_every_query_is_callable():
    assert QUERIES, "inventory is empty"
    for name in ORACLES:
        assert name in QUERIES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle(spark, ddb, name):
    assert_matches_oracle(spark, ddb, name)
