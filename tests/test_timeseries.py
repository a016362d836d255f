"""Unit tests for operators/timeseries.py and operators/funnel.py
(registry-level oracle equivalence is covered by the driver gate)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import funnel as FN
from knetminer_etl_spark.operators import timeseries as TS


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def series_df(spark):
    # key "a": observations in minute-buckets 0, 3 (gap 1-2), value 10 → 40
    # key "b": single observation (single-cell spine)
    rows = [
        ("a", _t(0, 10), 10.0),
        ("a", _t(0, 40), 2.0),  # same bucket as the first → sum 12
        ("a", _t(3, 5), 40.0),
        ("b", _t(2, 0), 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_gap_fill_locf_and_interp(series_df):
    out = TS.gap_fill(series_df, ["k"], "ts", "v", 60, agg="sum")
    rows = {
        (r["k"], r["bucket"].minute): (r["v"], r["v_locf"], r["v_interp"])
        for r in out.collect()
    }
    assert len(rows) == 5  # a: minutes 0-3, b: minute 2
    assert rows[("a", 0)] == (12.0, 12.0, 12.0)
    # gap minutes: LOCF carries 12.0; interp walks linearly toward 40
    assert rows[("a", 1)][1] == 12.0
    assert rows[("a", 1)][2] == pytest.approx(12 + (40 - 12) / 3)
    assert rows[("a", 2)][2] == pytest.approx(12 + 2 * (40 - 12) / 3)
    assert rows[("a", 3)] == (40.0, 40.0, 40.0)
    assert rows[("b", 2)] == (7.0, 7.0, 7.0)


def test_gap_fill_leading_gap_is_null_locf_none(spark):
    # first bucket observed late → no leading rows at all (spine starts
    # at the key's min bucket); interior gap before any obs impossible.
    df = spark.createDataFrame(
        [("x", _t(1), 5.0), ("x", _t(3), 9.0)],
        "k string, ts timestamp, v double",
    )
    out = TS.gap_fill(df, ["k"], "ts", "v", 60).orderBy("bucket").collect()
    assert [r["bucket"].minute for r in out] == [1, 2, 3]
    assert out[1]["v"] is None and out[1]["v_locf"] == 5.0


def test_gap_fill_reuses_groupby_partitioning(series_df):
    """The whole gap-fill pipeline runs over ONE keys exchange: the
    sized repartition satisfies the (keys, bucket) grouping, the
    per-key assembly, and the LOCF window alike."""
    out = TS.gap_fill(series_df, ["k"], "ts", "v", 60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_time_weighted_avg_matches_hand_calc(spark):
    # value 10 held 30 s, then 20 held 10 s → twa = (10*30+20*10)/40
    df = spark.createDataFrame(
        [
            ("u", _t(0, 0), 10.0, 1),
            ("u", _t(0, 30), 20.0, 2),
            ("u", _t(0, 40), 99.0, 3),  # last obs: zero weight
            ("solo", _t(0, 0), 5.0, 4),  # single obs → NULL twa
        ],
        "k string, ts timestamp, v double, id int",
    )
    out = {
        r["k"]: (r["twa"], r["span_seconds"])
        for r in TS.time_weighted_avg(
            df, ["k"], "ts", "v", tiebreak_cols=["id"]
        ).collect()
    }
    assert out["u"][0] == pytest.approx((10 * 30 + 20 * 10) / 40)
    assert out["u"][1] == pytest.approx(40.0)
    assert out["solo"] == (None, None)


@pytest.fixture()
def funnel_df(spark):
    rows = [
        # u1 completes a->b->c in order
        (1, _t(0), "a"), (1, _t(1), "b"), (1, _t(2), "c"),
        # u2: b before a — only reaches depth 1 (a at minute 3, no b after)
        (2, _t(0), "b"), (2, _t(3), "a"),
        # u3: a then c (skips b) → depth 1
        (3, _t(0), "a"), (3, _t(1), "c"),
        # u4: same-timestamp b does NOT advance (strict >)
        (4, _t(5), "a"), (4, _t(5), "b"),
        # u5: never enters
        (5, _t(0), "c"),
    ]
    return spark.createDataFrame(rows, "user bigint, ts timestamp, etype string")


def test_funnel_stages_cascade(funnel_df):
    out = {
        r["user"]: r["deepest"]
        for r in FN.funnel_stages(
            funnel_df, "user", "ts", "etype", ["a", "b", "c"]
        ).collect()
    }
    # u5 has no stage-relevant progress but did emit a stage event type 'c'
    assert out == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0}


def test_funnel_counts_monotone(funnel_df):
    out = FN.funnel_counts(funnel_df, "user", "ts", "etype", ["a", "b", "c"])
    rows = [(r["stage_idx"], r["stage"], r["n_users"]) for r in out.collect()]
    assert rows == [(1, "a", 4), (2, "b", 1), (3, "c", 1)]


def test_retention_cohorts_distinct_periods(spark):
    rows = [
        (1, _t(0)), (1, _t(1)),                      # two events, same period
        (1, dt.datetime(2024, 1, 3, 0, 0)),          # returns at offset 2
        (2, dt.datetime(2024, 1, 3, 5, 0)),          # cohort day 3
    ]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    out = {
        (r["cohort"].day, r["period_offset"]): r["n_users"]
        for r in FN.retention_cohorts(df, "user", "ts", 86_400).collect()
    }
    assert out == {(1, 0): 1, (1, 2): 1, (3, 0): 1}


def test_time_bucket_floors_negative_epochs(spark):
    """Pre-1970 timestamps must floor DOWN to the grid (floor division),
    not truncate toward zero as `%`/cast do."""
    rows = [
        (dt.datetime(1969, 12, 31, 23, 59, 30),),  # epoch -30
        (dt.datetime(1970, 1, 1, 0, 0, 30),),      # epoch +30
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = df.select(
        TS.time_bucket(F.col("ts"), 60).cast("long").alias("b")
    ).collect()
    assert [r["b"] for r in got] == [-60, 0]


def test_retention_cohorts_negative_epoch_periods(spark):
    """Cohort periods for pre-1970 activity use floor division too: an
    event 30s before the epoch belongs to period -1, not period 0."""
    rows = [
        (1, dt.datetime(1969, 12, 31, 23, 59, 30)),
        (1, dt.datetime(1970, 1, 1, 0, 0, 30)),
    ]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    out = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in FN.retention_cohorts(df, "user", "ts", 60).collect()
    }
    assert {(c.year, c.month, c.day, c.hour, c.minute, off) for (c, off) in out} == {
        (1969, 12, 31, 23, 59, 0),
        (1969, 12, 31, 23, 59, 1),
    }


def test_rolling_zscore_hand_calc(spark):
    """Window of 3 preceding: baseline for the 4th obs is (1,2,3) ->
    mean 2, std 1; value 5 -> z = 3. Leading rows (fewer than 2
    preceding) and zero-variance windows yield NULL z."""
    rows = [
        (1, _t(0), 1.0),
        (1, _t(1), 2.0),
        (1, _t(2), 3.0),
        (1, _t(3), 5.0),
        (2, _t(0), 4.0),   # single obs: NULL
        (3, _t(0), 7.0),   # constant series: zero variance -> NULL
        (3, _t(1), 7.0),
        (3, _t(2), 7.0),
        (3, _t(3), 7.0),
    ]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp, v double")
    out = {
        (r["user"], r["ts"].minute): (r["roll_n"], r["z"])
        for r in TS.rolling_zscore(df, ["user"], "ts", "v", n=3).collect()
    }
    n, z = out[(1, 3)]
    assert n == 3 and abs(z - 3.0) < 1e-12
    assert out[(1, 0)] == (0, None)       # no preceding
    assert out[(1, 1)][1] is None         # one preceding: cnt < 2
    assert out[(2, 0)] == (0, None)
    assert all(out[(3, m)][1] is None for m in range(4))  # zero variance


def test_rolling_zscore_single_shuffle(spark):
    rows = [(1, _t(i), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp, v double")
    plan = (
        TS.rolling_zscore(df, ["user"], "ts", "v", n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one hash exchange on the keys


class TestEwma:
    def test_matches_pandas_ewm_adjust_false(self, spark):
        import pandas as pd

        from knetminer_etl_spark.operators.timeseries import ewma

        rows = [
            ("a", i, float(v))
            for i, v in enumerate([10, 12, 8, 11, 30, 5])
        ] + [("b", i, float(v)) for i, v in enumerate([1, 2, 3])]
        df = spark.createDataFrame(rows, "k string, ts long, v double")
        sdf = df.withColumn("ts", F.timestamp_seconds("ts"))
        got = {
            (r["k"], r["ts"].second + r["ts"].minute * 60): r["ewma"]
            for r in ewma(sdf, ["k"], "ts", "v", alpha=0.3).collect()
        }
        pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
        for k, grp in pdf.groupby("k"):
            ref = grp["v"].ewm(alpha=0.3, adjust=False).mean().tolist()
            for (_, ts, _), want in zip(grp.itertuples(index=False), ref):
                assert abs(got[(k, ts)] - round(want, 6)) < 1e-9, (k, ts)

    def test_one_row_per_input_and_first_is_identity(self, spark):
        from knetminer_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [("a", 1, 5.0), ("a", 2, 7.0)], "k string, ts long, v double"
        ).withColumn("ts", F.timestamp_seconds("ts"))
        out = ewma(df, ["k"], "ts", "v", alpha=0.5).orderBy("ts").collect()
        assert len(out) == 2
        assert out[0]["ewma"] == 5.0
        assert out[1]["ewma"] == 6.0  # 0.5*7 + 0.5*5

    def test_single_shuffle_plan(self, spark):
        from knetminer_etl_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [("a", 1, 5.0)], "k string, ts long, v double"
        ).withColumn("ts", F.timestamp_seconds("ts"))
        plan = (
            ewma(df, ["k"], "ts", "v")._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 1
