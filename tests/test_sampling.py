from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import sampling as SP


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).withColumn(
        "grp", (F.col("id") % 4).cast("string")
    )


def test_hash_split_partitions_input(ids_df):
    out = SP.hash_split(ids_df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row exactly one label
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14
    assert 0.06 < counts["test"] / 2000 < 0.14


def test_hash_split_deterministic_and_weight_scale_invariant(ids_df):
    a = SP.hash_split(ids_df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    b = SP.hash_split(ids_df, "id", {"train": 8, "val": 1, "test": 1})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_sample_nested_and_deterministic(ids_df):
    small = set(r["id"] for r in SP.hash_sample(ids_df, "id", 0.2, seed="s").collect())
    big = set(r["id"] for r in SP.hash_sample(ids_df, "id", 0.5, seed="s").collect())
    assert small <= big  # same seed ⟹ nested samples
    assert 0.15 < len(small) / 2000 < 0.25
    again = set(r["id"] for r in SP.hash_sample(ids_df, "id", 0.2, seed="s").collect())
    assert small == again
    other = set(r["id"] for r in SP.hash_sample(ids_df, "id", 0.2, seed="t").collect())
    assert small != other  # different seed ⟹ different draw


def test_stratified_fractions(ids_df):
    out = SP.stratified_hash_sample(
        ids_df, "id", "grp", {"0": 1.0, "1": 0.5}, default_fraction=0.0
    )
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["0"] == 500  # fraction 1.0 keeps the whole stratum
    assert 0.4 < counts["1"] / 500 < 0.6
    assert "2" not in counts and "3" not in counts  # default 0 drops the rest


def test_split_is_narrow_no_shuffle(ids_df):
    plan = SP.hash_split(ids_df, "id", {"a": 0.5, "b": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_args_rejected(ids_df):
    with pytest.raises(ValueError):
        SP.hash_sample(ids_df, "id", 1.5)
    with pytest.raises(ValueError):
        SP.split_column(F.col("id"), {"a": 0.0})
    with pytest.raises(ValueError):
        SP.stratified_hash_sample(ids_df, "id", "grp", {"0": 2.0})


class TestQuotaCap:
    def test_cap_and_determinism(self, spark):
        rows = [(i, f"g{i % 3}") for i in range(60)]
        df = spark.createDataFrame(rows, "id long, grp string")
        a = SP.quota_cap(df, "grp", 5, "id")
        got = a.groupBy("grp").count().collect()
        assert {r["grp"]: r["count"] for r in got} == {"g0": 5, "g1": 5, "g2": 5}
        # deterministic: same survivors on rerun and under repartitioning
        ids1 = sorted(r["id"] for r in a.collect())
        ids2 = sorted(
            r["id"] for r in SP.quota_cap(df.repartition(7), "grp", 5, "id").collect()
        )
        assert ids1 == ids2

    def test_under_quota_groups_untouched(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, grp string")
        assert SP.quota_cap(df, "grp", 10, "id").count() == 3

    def test_bad_k(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, grp string")
        with pytest.raises(ValueError):
            SP.quota_cap(df, "grp", 0, "id")


class TestWeightedSample:
    def test_deterministic_and_k_per_group(self, spark):
        from knetminer_etl_spark.operators.sampling import weighted_sample

        rows = [(i, "g%d" % (i % 3), float(1 + i % 7)) for i in range(300)]
        df = spark.createDataFrame(rows, "id bigint, g string, w double")
        a = sorted(r["id"] for r in weighted_sample(df, "w", 5, "id", "g").collect())
        b = sorted(r["id"] for r in weighted_sample(df, "w", 5, "id", "g").collect())
        assert a == b and len(a) == 15  # 5 per group, stable

    def test_zero_weight_rows_never_selected(self, spark):
        from knetminer_etl_spark.operators.sampling import weighted_sample

        rows = [(1, 0.0), (2, -1.0), (3, None), (4, 5.0), (5, 1.0)]
        df = spark.createDataFrame(rows, "id bigint, w double")
        got = {r["id"] for r in weighted_sample(df, "w", 10, "id").collect()}
        assert got == {4, 5}

    def test_weight_biases_inclusion(self, spark):
        """Across many disjoint seeds, a 10x-weighted row is selected
        far more often than a 1x row (A-ES inclusion property)."""
        from knetminer_etl_spark.operators.sampling import weighted_sample

        rows = [(i, 10.0 if i < 10 else 1.0) for i in range(100)]
        df = spark.createDataFrame(rows, "id bigint, w double")
        heavy = light = 0
        for s in range(12):
            got = {
                r["id"]
                for r in weighted_sample(df, "w", 10, "id", seed=f"s{s}").collect()
            }
            heavy += len([i for i in got if i < 10])
            light += len([i for i in got if i >= 10])
        # 10 heavy rows (weight 10) vs 90 light (weight 1): expected
        # heavy share of a 10-draw is well above uniform's 1 draw
        assert heavy > light * 0.7, (heavy, light)
        assert heavy >= 3 * 12 * 10 / 11 / 3  # loose sanity floor


class TestSharding:
    def test_shards_partition_and_balance(self, ids_df):
        from knetminer_etl_spark.operators.sampling import assign_shards

        out = assign_shards(ids_df, "id", 16, order_col=None)
        counts = {
            r["shard"]: r["n"]
            for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 2000
        assert set(counts) == set(range(16))
        # multinomial balance: expected 125/shard, allow wide band
        assert all(70 < n < 190 for n in counts.values()), counts

    def test_shard_assignment_deterministic_and_narrow(self, ids_df):
        from knetminer_etl_spark.operators.sampling import assign_shards

        a = assign_shards(ids_df, "id", 16)
        b = assign_shards(ids_df, "id", 16)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure narrow map over the scan

    def test_order_key_is_a_permutation_independent_of_shard_seed(self, ids_df):
        from knetminer_etl_spark.operators.sampling import assign_shards

        out = assign_shards(ids_df, "id", 16).collect()
        orders = [r["shard_order"] for r in out]
        # distinct (collision-free at this size w.h.p.) and not sorted by id
        assert len(set(orders)) > 1990
        assert orders != sorted(orders)


class TestTemperatureSample:
    @pytest.fixture(scope="class")
    def skewed_df(self, spark):
        # sources: big=1000, mid=200, small=50
        rows = (
            [(i, "big") for i in range(1000)]
            + [(1000 + i, "mid") for i in range(200)]
            + [(1200 + i, "small") for i in range(50)]
        )
        return spark.createDataFrame(rows, "id bigint, src string")

    def test_fractions_hit_targets(self, spark, skewed_df):
        import math

        from knetminer_etl_spark.operators.sampling import temperature_fractions

        fr = {
            r["src"]: r["keep_frac"]
            for r in temperature_fractions(skewed_df, "src", 600).collect()
        }
        wsum = math.sqrt(1000) + math.sqrt(200) + math.sqrt(50)
        for src, n in (("big", 1000), ("mid", 200), ("small", 50)):
            expect = min(1.0, 600 * math.sqrt(n) / wsum / n)
            assert abs(fr[src] - expect) < 1e-6, src

    def test_sample_counts_near_targets_and_deterministic(self, skewed_df):
        from knetminer_etl_spark.operators.sampling import temperature_sample

        kept = temperature_sample(skewed_df, "id", "src", 600)
        counts = {
            r["src"]: r["n"]
            for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
        }
        # sqrt weighting: big ≈ 360, mid ≈ 161, small ≈ 80 (curbed by hash noise)
        assert 290 < counts["big"] < 430
        assert 120 < counts["mid"] < 200
        assert 55 < counts["small"] <= 80 or counts["small"] == 50
        again = temperature_sample(skewed_df, "id", "src", 600)
        assert kept.exceptAll(again).count() == 0

    def test_alpha_one_is_proportional(self, skewed_df):
        from knetminer_etl_spark.operators.sampling import temperature_fractions

        fr = {
            r["src"]: r["keep_frac"]
            for r in temperature_fractions(skewed_df, "src", 625, alpha=1.0).collect()
        }
        # alpha=1: every source keeps the same fraction 625/1250 = 0.5
        for src in ("big", "mid", "small"):
            assert abs(fr[src] - 0.5) < 1e-3, fr


class TestDifficultyBands:
    def test_band_edges_and_clamp(self, spark):
        from knetminer_etl_spark.operators.sampling import difficulty_bands

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(11)], "id long, score double"
        )
        got = {r["id"]: r["band"] for r in difficulty_bands(df, "score", 10).collect()}
        assert got[0] == 0 and got[10] == 9  # max clamps into top band
        assert got[5] == 5

    def test_constant_and_null_scores(self, spark):
        from knetminer_etl_spark.operators.sampling import difficulty_bands

        df = spark.createDataFrame(
            [(1, 2.0), (2, 2.0), (3, None)], "id long, score double"
        )
        got = {r["id"]: r["band"] for r in difficulty_bands(df, "score", 4).collect()}
        assert got[1] == 0 and got[2] == 0 and got[3] is None

    def test_no_global_sort_in_plan(self, spark):
        from knetminer_etl_spark.operators.sampling import difficulty_bands

        df = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(50)], "id long, score double"
        )
        plan = difficulty_bands(df, "score", 5)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # banding must not be a global window


class TestLeakageSafeSplit:
    """leakage_safe_split: near-dup clusters never straddle splits."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        # 40 distinct docs + 10 planted near-dup pairs (suffix tweak
        # keeps 3-shingle Jaccard well above 0.5)
        base = [
            (i, f"alpha bravo charlie delta echo foxtrot golf {i} hotel india")
            for i in range(40)
        ]
        dups = [
            (100 + i, f"alpha bravo charlie delta echo foxtrot golf {i} hotel juliet")
            for i in range(10)
        ]
        return spark.createDataFrame(base + dups, "doc_id long, text string")

    def test_near_dups_share_split_and_partition(self, docs):
        out = SP.leakage_safe_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert len(by_id) == 50  # every doc exactly one row
        for i in range(10):  # planted pair: same component, same split
            assert by_id[i]["component"] == by_id[100 + i]["component"]
            assert by_id[i]["split"] == by_id[100 + i]["split"]
        assert {r["split"] for r in out} <= {"train", "val", "test"}

    def test_matches_component_keyed_hash_split(self, docs):
        # the split label must be exactly split_column(component):
        # recompute it from the returned component and compare
        out = SP.leakage_safe_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
        )
        recomputed = out.withColumn(
            "expect",
            SP.split_column(F.col("component"), {"train": 0.8, "val": 0.1, "test": 0.1}, "t"),
        )
        assert recomputed.filter(F.col("split") != F.col("expect")).count() == 0

    def test_deterministic_and_seed_sensitive(self, docs):
        w = {"train": 0.5, "test": 0.5}
        a = SP.leakage_safe_split(docs, w, seed="s").collect()
        b = SP.leakage_safe_split(docs, w, seed="s").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        c = {(r["doc_id"], r["split"]) for r in SP.leakage_safe_split(docs, w, seed="u").collect()}
        assert c != {(r["doc_id"], r["split"]) for r in a}
