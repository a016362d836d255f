from __future__ import annotations

import math
import random

import pytest

from knetminer_etl_spark.operators import similarity as SIM


@pytest.fixture()
def vectors(spark):
    rng = random.Random(7)
    rows = []
    # 3 well-separated cluster centers + jittered members
    centers = [
        [1.0 if i == c else 0.0 for i in range(8)] for c in range(3)
    ]
    vid = 0
    for c in centers:
        for _ in range(10):
            rows.append((vid, [x + rng.uniform(-0.05, 0.05) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestBruteForce:
    def test_topk_within_cluster(self, spark, vectors):
        queries = vectors.filter("vec_id IN (0, 10, 20)")
        got = SIM.cosine_topk(vectors, queries, k=3)
        rows = got.collect()
        assert len(rows) == 9
        for r in rows:
            assert r["neighbor_id"] // 10 == r["query_id"] // 10  # same cluster
            assert r["cosine"] > 0.9

    def test_excludes_self_and_ranks(self, spark, vectors):
        got = SIM.cosine_topk(vectors, vectors.filter("vec_id = 0"), k=5).collect()
        assert all(r["neighbor_id"] != 0 for r in got)
        ranks = sorted(r["rank"] for r in got)
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in sorted(got, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)


class TestLSH:
    def test_high_recall_on_separated_clusters(self, spark, vectors):
        queries = vectors.filter("vec_id IN (0, 10, 20)")
        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.cosine_topk(vectors, queries, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.lsh_topk(vectors, queries, k=3, n_planes=4).collect()
        }
        recall = len(brute & approx) / len(brute)
        assert recall >= 2 / 3  # separated clusters → most pairs share buckets

    def test_rank_contract(self, spark, vectors):
        got = SIM.lsh_topk(vectors, vectors.filter("vec_id = 5"), k=4).collect()
        assert len(got) <= 4
        assert all(r["rank"] <= 4 for r in got)
