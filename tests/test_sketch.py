from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def users_df(spark):
    # 5000 rows over exactly 1000 distinct users, 2 groups.
    return spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("user"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_idx_rho(key: str, seed: str = "hll", p: int = 8) -> tuple[int, int]:
    h = _py_hash60(f"{seed}:{key}")
    idx = h & ((1 << p) - 1)
    w = h >> p
    wbits = SK.HASH_BITS - p
    rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
    return idx, rho


def test_hll_idx_rho_matches_python_reference(spark):
    keys = [str(i) for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    idx, rho = SK.hll_idx_rho(F.col("k"))
    got = {
        r["k"]: (r["i"], r["r"])
        for r in df.select("k", idx.alias("i"), rho.alias("r")).collect()
    }
    for k in keys:
        assert got[k] == _py_idx_rho(k), k


def test_hll_estimate_within_error_bound(users_df):
    # rse = 1.04/sqrt(256) ≈ 6.5%; assert within 4 sigma.
    out = SK.hll_distinct(users_df, "user", p=8).collect()
    assert len(out) == 1
    est = out[0]["hll_est"]
    assert abs(est - 1000) < 4 * 1.04 / math.sqrt(256) * 1000


def test_hll_grouped_and_register_merge(users_df):
    # Sketch state must merge: max-merging the two groups' registers
    # equals the registers of the union — the property that makes the
    # sketch valid for partial aggregation, unions, and streaming.
    per_grp = SK.hll_registers(users_df, "user", ["grp"])
    merged = per_grp.groupBy("reg_idx").agg(F.max("reg_rho").alias("reg_rho"))
    full = SK.hll_registers(users_df, "user")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    # Per-group estimates cover each group's true cardinality (both
    # groups see all 1000 users here: 1000 distinct over ids mod 2).
    ests = {r["grp"]: r["hll_est"] for r in SK.hll_distinct(users_df, "user", ["grp"]).collect()}
    for grp, true_n in (("a", 500), ("b", 500)):
        assert abs(ests[grp] - true_n) < 4 * 1.04 / math.sqrt(256) * true_n


def test_cms_never_undercounts_and_bounds_overcount(spark):
    # Zipf-ish: token t_i appears (50 - i) times, i in 0..49. N = 1275.
    rows = [(f"t{i}",) for i in range(50) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, ["token"])
    sketch = SK.cms_table(df, "token", depth=4, width=1024)
    probes = df.select("token").distinct()
    est = {
        r["token"]: r["cms_est"]
        for r in SK.cms_lookup(sketch, probes, "token").collect()
    }
    n_total = len(rows)
    for i in range(50):
        exact = 50 - i
        assert est[f"t{i}"] >= exact, f"t{i} undercounted"
        # standard CMS bound: overcount <= 2N/w w.h.p.
        assert est[f"t{i}"] - exact <= 2 * n_total / 1024 + 1


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)], ["token", "w"])
    sketch = SK.cms_table(df, "token", weight_col="w")
    est = {
        r["token"]: r["cms_est"]
        for r in SK.cms_lookup(sketch, df.select("token").distinct(), "token").collect()
    }
    assert est["x"] >= 12 and est["y"] >= 1


def test_heavy_hitters_exact_with_deterministic_ties(spark):
    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(rows, ["t"])
    out = [(r["t"], r["n"]) for r in SK.heavy_hitters(df, "t", k=3).collect()]
    # c first; then the a/b tie breaks alphabetically.
    assert out == [("c", 5), ("a", 3), ("b", 3)]


def test_sketch_plans_are_bounded_shuffles(users_df):
    # The register build is a single hash aggregate over the scan —
    # partial (map-side) aggregation present, i.e. the shuffle carries
    # pre-merged registers, not raw rows.
    plan = SK.hll_registers(users_df, "user")._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert plan.count("Exchange") == 1


class TestHistogramQuantiles:
    def test_estimate_within_bin_width(self, spark):
        from knetminer_etl_spark.operators import sketch as SK

        import random

        rnd = random.Random(7)
        vals = [rnd.uniform(0, 100) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        bins = [
            (r["bin"], r["n"])
            for r in SK.histogram_counts(df, "v", 0.0, 100.0, 50).collect()
        ]
        width = 100.0 / 50
        svals = sorted(vals)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = SK.hist_quantile(bins, 0.0, 100.0, 50, q)
            exact = svals[min(len(svals) - 1, int(q * len(svals)))]
            assert abs(est - exact) <= width + 1e-9, (q, est, exact)

    def test_counts_merge_and_clamp(self, spark):
        from knetminer_etl_spark.operators import sketch as SK
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(-5.0,), (0.0,), (99.0,), (250.0,)], ["v"])
        bins = {
            r["bin"]: r["n"]
            for r in SK.histogram_counts(df, "v", 0.0, 100.0, 10).collect()
        }
        assert bins[0] == 2  # -5 clamps into bin 0
        assert bins[9] == 2  # 99 and out-of-range 250 in the top bin
        # sum-merge: histogram of two halves merges to the full histogram
        h1 = SK.histogram_counts(df.limit(2), "v", 0.0, 100.0, 10)
        h2 = SK.histogram_counts(df.subtract(df.limit(2)), "v", 0.0, 100.0, 10)
        merged = {
            r["bin"]: r["n"]
            for r in h1.unionByName(h2).groupBy("bin").agg(F.sum("n").alias("n")).collect()
        }
        assert merged == bins

    def test_empty_and_none(self, spark):
        from knetminer_etl_spark.operators import sketch as SK

        assert SK.hist_quantile([], 0.0, 1.0, 4, 0.5) is None


class TestHllJaccard:
    def test_estimates_track_true_jaccard(self, spark):
        from knetminer_etl_spark.operators.sketch import hll_pairwise_jaccard

        rows = (
            [("A", f"u{i}") for i in range(400)]
            + [("B", f"u{i}") for i in range(200, 600)]   # J(A,B)=200/600
            + [("C", f"v{i}") for i in range(300)]        # disjoint
        )
        df = spark.createDataFrame(rows, "grp string, uid string")
        got = {
            (r["set_a"], r["set_b"]): r
            for r in hll_pairwise_jaccard(df, "uid", "grp").collect()
        }
        ab = got[("A", "B")]
        assert abs(ab["jaccard_est"] - 1 / 3) < 0.12  # p=8 -> ~6.5% rse
        ac = got[("A", "C")]
        assert ac["jaccard_est"] < 0.1
        assert abs(ab["est_union"] - 600) / 600 < 0.2

    def test_union_estimate_is_register_max_merge(self, spark):
        """The pairwise union estimate must equal estimating the merged
        register table directly (sketch algebra, not re-hashing)."""
        from knetminer_etl_spark.operators.sketch import (
            hll_estimate,
            hll_pairwise_jaccard,
            hll_registers,
        )
        from pyspark.sql import functions as F

        rows = [("A", f"x{i}") for i in range(100)] + [
            ("B", f"x{i}") for i in range(50, 150)
        ]
        df = spark.createDataFrame(rows, "grp string, uid string")
        pairwise = hll_pairwise_jaccard(df, "uid", "grp").first()
        direct = hll_estimate(
            hll_registers(df.select("uid"), "uid"), []
        ).first()["hll_est"]
        assert pairwise["est_union"] == direct
