"""Registry smoke: every declared query runs at sf0.001 with a stable,
non-degenerate result. Oracle equivalence is covered by the driver gate
(and locally by tools/check_correctness.py)."""

from __future__ import annotations

import pytest

from knetminer_etl_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.001"),
    reason="driver-generated parquet fixtures not present (CI)",
)


# queries where an empty result at sf0.001 is legitimate
MAY_BE_EMPTY = {"embedding_dup_pairs"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned no rows"
    assert df.columns == list(dict.fromkeys(df.columns)), "duplicate column names"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
