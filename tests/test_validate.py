from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import validate as V


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -5.0, "b"),
        (3, None, "a"),
        (None, 7.0, None),
    ]
    return spark.createDataFrame(rows, "id bigint, amount double, tag string")


def test_check_counts_violations_including_null_predicates(spark, messy):
    got = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in V.check(
            messy,
            {
                "id_not_null": F.col("id").isNotNull(),
                "amount_positive": F.col("amount") > 0,
                "tag_in_domain": F.col("tag").isin("a", "b"),
            },
        ).collect()
    }
    assert got["id_not_null"] == (1, 4)
    # -5 fails, NULL amount fails (null predicate = violation)
    assert got["amount_positive"] == (2, 4)
    assert got["tag_in_domain"] == (1, 4)


def test_check_single_scan_plan(spark, messy):
    plan = (
        V.check(messy, {"a": F.col("id").isNotNull(), "b": F.col("amount") > 0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one aggregation pass: a single pair of partial/final HashAggregates,
    # no join/union of per-rule subplans
    assert plan.count("Scan ") <= 1
    assert "Union" not in plan


def test_expect_gates_and_passes(spark, messy):
    with pytest.raises(ValueError, match="amount_positive: 2"):
        V.expect(messy, {"amount_positive": F.col("amount") > 0})
    ok = V.expect(messy, {"has_rows": F.lit(True)})
    assert ok.collect()[0]["n_violations"] == 0


def test_referential_check_counts_dangling(spark, messy):
    dim = spark.createDataFrame([(1,), (3,)], ["k"])
    got = V.referential_check(messy, "id", dim, "k").collect()[0]
    # ids 2 and NULL dangle
    assert got["n_violations"] == 2 and got["n_rows"] == 4
    assert got["rule"] == "id_references_k"


def test_profile_stats(spark, messy):
    got = {r["column"]: r for r in V.profile(messy).collect()}
    assert got["id"]["n_null"] == 1 and got["id"]["n_distinct"] == 3
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "3"
    assert got["amount"]["n_null"] == 1
    assert got["tag"]["n_distinct"] == 2
    assert all(r["n_rows"] == 4 for r in got.values())


def test_empty_rules_raise(spark, messy):
    with pytest.raises(ValueError):
        V.check(messy, {})
    with pytest.raises(ValueError):
        V.profile(messy, [])
