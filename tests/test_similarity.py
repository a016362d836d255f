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


class TestPairDotsNullContract:
    """_pair_dots (the Arrow scorer shared by every verification join)
    must propagate NULL for null / ragged / null-element vectors — like
    the in-plan zip_with fold did — not crash np.stack."""

    def test_null_and_ragged_rows_yield_null(self, spark):
        from pyspark.sql import functions as F

        rows = [
            (1, [1.0, 2.0], [3.0, 4.0]),      # fine: 11.0
            (2, None, [1.0, 1.0]),            # null vector
            (3, [1.0, 2.0], None),            # null other side
            (4, [1.0, 2.0, 3.0], [1.0, 1.0]), # ragged
            (5, [1.0, None], [2.0, 2.0]),     # null element
            (6, [2.0], [5.0]),                # different (valid) dim: 10.0
        ]
        df = spark.createDataFrame(
            rows, "id long, a array<double>, b array<double>"
        )
        got = {
            r["id"]: r["dot"]
            for r in df.select(
                "id", SIM._pair_dots(F.col("a"), F.col("b")).alias("dot")
            ).collect()
        }
        assert got[1] == 11.0 and got[6] == 10.0
        assert got[2] is None and got[3] is None and got[4] is None
        assert got[5] is None
        # and the in-plan fold agrees on every row
        want = {
            r["id"]: r["dot"]
            for r in df.select(
                "id", SIM._dot(F.col("a"), F.col("b")).alias("dot")
            ).collect()
        }
        assert got == want

    def test_lsh_topk_tolerates_null_vectors(self, spark, vectors):
        """A null embedding reaching the verification join is filtered,
        not a job failure."""
        from pyspark.sql import functions as F

        poisoned = vectors.unionByName(
            vectors.sparkSession.createDataFrame(
                [(99, None)], "vec_id long, embedding array<float>"
            )
        )
        got = SIM.lsh_topk(
            poisoned, poisoned.filter("vec_id = 0"), k=3, n_planes=4
        ).collect()
        assert got and all(r["neighbor_id"] != 99 for r in got)


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

    def test_measured_recall_at_defaults(self, spark):
        """Recall@5 of lsh_topk (6 planes + Hamming-1 multiprobe) vs the
        exact baseline on planted clusters — the per-neighbor collision
        probability at intra-cluster cosine ~0.97 is ~0.95 analytically;
        assert a 0.8 floor (deterministic: planes are seeded)."""
        import numpy as np

        rng = np.random.default_rng(11)
        n_clusters, per_cluster, dim = 20, 10, 32
        rows, vid = [], 0
        for _ in range(n_clusters):
            center = rng.standard_normal(dim)
            center /= np.linalg.norm(center)
            for _ in range(per_cluster):
                # noise norm ~0.04*sqrt(32)~0.23 -> intra cosine ~0.97;
                # at that cosine analytical recall is ~0.93 (at cosine
                # 0.83 it drops to ~0.68 — measured, matching theory)
                v = center + rng.standard_normal(dim) * 0.04
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = df.filter(f"vec_id % {per_cluster} = 0")

        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.cosine_topk(df, queries, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.lsh_topk(df, queries, k=5).collect()
        }
        recall = len(brute & approx) / len(brute)
        assert recall >= 0.8, f"recall@5 = {recall}"

    def test_ivf_recall_on_clusters(self, spark, vectors):
        """IVF with nlist=6/nprobe=2 on 3 well-separated clusters: the
        quantizer cells align with the plants, so recall@3 ~= 1."""
        queries = vectors.filter("vec_id IN (0, 10, 20)")
        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.cosine_topk(vectors, queries, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(
                vectors, queries, k=3, nlist=6, nprobe=2, iterations=3
            ).collect()
        }
        assert len(brute & approx) / len(brute) >= 0.8

    def test_kmeans_deterministic(self, spark, vectors):
        a = {
            r["cluster_id"]: r["centroid"]
            for r in SIM.kmeans_fit(vectors, nlist=4, iterations=2).collect()
        }
        b = {
            r["cluster_id"]: r["centroid"]
            for r in SIM.kmeans_fit(vectors, nlist=4, iterations=2).collect()
        }
        assert set(a) == set(b) == {0, 1, 2, 3}
        for cid in a:
            assert a[cid] == pytest.approx(b[cid])

    def test_kmeans_bounded_training_sample_is_md5_prefix(self, spark, vectors):
        """Above train_max the fit runs on the deterministic md5-prefix
        sample: fitting with train_max=n_sub must equal fitting on the
        explicitly-drawn n_sub smallest-(md5(id), id) rows — the draw an
        oracle replicates with ORDER BY md5(id), id LIMIT N."""
        from pyspark.sql import functions as F

        n_sub = 12
        sample = (
            vectors.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(n_sub)
        )
        bounded = {
            r["cluster_id"]: r["centroid"]
            for r in SIM.kmeans_fit(
                vectors, nlist=4, iterations=2, train_max=n_sub
            ).collect()
        }
        explicit = {
            r["cluster_id"]: r["centroid"]
            for r in SIM.kmeans_fit(sample, nlist=4, iterations=2).collect()
        }
        assert set(bounded) == set(explicit)
        for cid in bounded:
            assert bounded[cid] == pytest.approx(explicit[cid])

    def test_md5_bucket_variant_matches_contract(self, spark, vectors):
        got = SIM.lsh_topk(
            vectors,
            vectors.filter("vec_id IN (0, 10)"),
            k=3,
            bucket_fn=SIM.sign_bucket_md5,
        ).collect()
        assert all(r["rank"] <= 3 and r["neighbor_id"] != r["query_id"] for r in got)
