"""Record linkage: multi-pass blocking + field-similarity scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from knetminer_etl_spark.operators import linkage as L


class TestDropPositionBlocking:
    def test_hamming1_pairs_always_share_a_key(self, spark):
        rows = [
            (1, "ACC-0012"),
            (2, "ACC-0013"),  # differs from 1 in one position
            (3, "ACC-9013"),  # differs from 2 in one position
            (4, "XYZ-7777"),  # unrelated
        ]
        df = spark.createDataFrame(rows, "rid long, acc string")
        cands = {
            (r["id_a"], r["id_b"])
            for r in L.candidate_links(
                df, "rid", L.drop_position_keys(F.col("acc"), 8)
            ).collect()
        }
        assert (1, 2) in cands and (2, 3) in cands
        assert not any(4 in p for p in cands)

    def test_distance2_pair_not_guaranteed_but_verified_out(self, spark):
        # 1 vs 3 differ in two positions -> may or may not be a candidate;
        # scoring with min_score filters it regardless
        rows = [(1, "AAAA"), (3, "ABBA")]
        df = spark.createDataFrame(rows, "rid long, acc string")
        scored = L.link_records(
            df, "rid", L.drop_position_keys(F.col("acc"), 4),
            {"acc": 1.0}, min_score=0.9,
        ).collect()
        assert scored == []


class TestScoring:
    def test_weighted_mixed_fields(self, spark):
        rows = [
            (1, "ACC-0012", 100.0),
            (2, "ACC-0013", 100.0),
        ]
        df = spark.createDataFrame(rows, "rid long, acc string, bal double")
        cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        got = L.score_links(
            df, cands, "rid", {"acc": 3.0, "bal": 1.0}
        ).first()
        # acc sim = 1 - 1/8 = 0.875; bal sim = 1.0 -> (3*0.875 + 1)/4
        assert abs(got["score"] - round((3 * 0.875 + 1.0) / 4.0, 6)) < 1e-9

    def test_min_score_filters(self, spark):
        rows = [(1, "AAAA"), (2, "ZZZZ")]
        df = spark.createDataFrame(rows, "rid long, acc string")
        cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        assert (
            L.score_links(df, cands, "rid", {"acc": 1.0}, min_score=0.5).count()
            == 0
        )

    def test_end_to_end_link_records(self, spark):
        rows = [(i, f"ID{i:04d}") for i in (1, 2, 3, 1001)]
        df = spark.createDataFrame(rows, "rid long, acc string")
        got = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in L.link_records(
                df, "rid", L.drop_position_keys(F.col("acc"), 6),
                {"acc": 1.0}, min_score=0.8,
            ).collect()
        }
        assert (1, 2) in got and (2, 3) in got  # one-digit neighbours
        assert all(s >= 0.8 for s in got.values())
