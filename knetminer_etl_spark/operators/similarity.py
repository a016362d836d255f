"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot products via higher-order functions
  (JVM-side, no UDF), rank with a window. The correctness baseline.
* :func:`lsh_topk` — sign-LSH bucketed approximate top-k: corpus and
  queries hashed into 2^n_planes buckets (multi-probe: a query also
  probes buckets at Hamming distance 1), exact scoring inside buckets
  only. The 100 TB path: scoring work drops by ~the bucket count, and
  the bucket join shuffles on bucket id instead of cross-joining.
* :func:`ivf_topk` — IVF (inverted-file) ANN: a deterministic k-means
  coarse quantizer (:func:`kmeans_fit`) partitions the corpus into
  ``nlist`` cells; a query exactly scores only the ``nprobe`` nearest
  cells. Unlike LSH, cell boundaries adapt to the data distribution.

Scores are computed in double precision with sequential fold order —
deterministic and oracle-reproducible; ties break by corpus id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import fan_out


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _pair_dots(a_col: Column, b_col: Column) -> Column:
    """``double`` column of rowwise a·b, computed one Arrow batch per
    task with a SEQUENTIAL per-dimension fold — ``((0 + a₀b₀) + a₁b₁) +
    …`` over the batch accumulator — so every value is bit-identical to
    :func:`_dot`'s in-plan ``aggregate``/``zip_with`` fold and DuckDB's
    ``list_reduce`` (a BLAS matmul would pairwise-sum and drift in the
    last ulp, flipping 6-dp round ties against the oracle). Use for
    PER-PAIR scoring (verification joins, top-k scans): pair volume is
    candidate-linear, but on the expression path each pair pays ``dim``
    INTERPRETED ops — higher-order functions never enter codegen.
    Row-vs-constant dots stay literal below the flop guard
    (`_LITERAL_DOTS_MAX`); per-ROW norms over the corpus stay on
    :func:`_norm` (linear volume, one pass).

    Null contract == the in-plan fold's: a NULL vector, a length
    mismatch (``zip_with`` pads with NULL), or a NULL element all yield
    NULL cosine — the row is then dropped by the consumer's threshold
    filter / sorted last in top-k, never crashes the Arrow batch and
    never NaN-sorts FIRST under a descending order (Spark orders NaN
    above every double). Arrow hands null elements to pandas as NaN
    inside a float64 ndarray, so a NaN fold result is mapped back to
    NULL (observed null-element propagation; bona-fide NaN embedding
    values have no meaningful cosine either)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dots(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = va.to_numpy()
        B = vb.to_numpy()
        n = len(A)
        dims_a = np.fromiter(
            (len(x) if x is not None else -1 for x in A), np.int64, count=n
        )
        dims_b = np.fromiter(
            (len(x) if x is not None else -2 for x in B), np.int64, count=n
        )
        valid = (dims_a >= 0) & (dims_a == dims_b)
        out = np.full(n, np.nan)
        # group by dimension: ragged-but-matching batches still vectorize
        for d in np.unique(dims_a[valid]):
            m = valid & (dims_a == d)
            X = np.stack(A[m])
            Y = np.stack(B[m])
            acc = np.zeros(X.shape[0])
            for k in range(X.shape[1]):
                acc += X[:, k] * Y[:, k]
            out[m] = acc
        res = pd.Series(out, dtype="float64").astype(object)
        res[np.isnan(out)] = None
        return res

    # nondeterministic marker (the VALUE is fully deterministic): the
    # usual consumer computes `filter(round(dot/…) ≥ t)` over a
    # projection of the same expression, and Catalyst materializes a
    # deterministic Python UDF once per referencing operator — measured
    # as two ArrowEvalPython nodes doing identical work. The marker
    # forces a single evaluation shared by filter and project.
    return _dots.asNondeterministic()(a_col, b_col)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    fanned: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: ``(query_id, neighbor_id, cosine, rank)``; self-matches (same
    id) are excluded. The query side is broadcast — use for query sets
    that fit in memory (the usual case); otherwise use :func:`lsh_topk`.

    ``fanned=True`` promises the corpus is already well-partitioned
    (e.g. the caller fan_out'd below its own projection) — skips the
    partition-count probe, which costs a full plan→RDD conversion on
    the driver (expensive when the corpus plan carries a large literal
    codebook expression).
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), _dvec(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = (corpus if fanned else fan_out(corpus)).select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    # expression-fold scoring, NOT _pair_dots: the brute path exists for
    # small query sets / oracle parity, where the Arrow round-trip costs
    # more than the interpreted fold (measured +0.15 s at bench scale);
    # the verification-join scorers (lsh/ivf/dup-pairs) use _pair_dots
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _d_sql(x: float) -> str:
    """A double literal that round-trips exactly: Python ``repr`` emits
    the shortest decimal that parses back to the same IEEE double, and
    the SQL string→double cast performs that parse."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _arr_sql(vals: list[float]) -> str:
    return "array(" + ", ".join(_d_sql(x) for x in vals) + ")"


def _sqdist_sql(vec_sql: str, vals: list[float]) -> str:
    """SQL twin of :func:`_sq_dist` — identical operations in identical
    order, so the floats are bit-equal to the Column form. Emitted as
    text because building per-centroid trees through the Column API
    costs one driver round-trip per node (hundreds of calls, ~2 s per
    plan for a PQ codebook) while one ``expr()`` string parses JVM-side
    in microseconds."""
    return (
        f"aggregate(zip_with({vec_sql}, {_arr_sql(vals)}, "
        "(x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _argmin_struct_sql(
    vec_sql: str, cents: list[tuple[int, list[float]]]
) -> str:
    """``array_min`` over (d2, cid) structs — nearest centroid with the
    (distance, cluster-id) tie-break every fit/assign path shares."""
    entries = ", ".join(
        f"named_struct('d2', {_sqdist_sql(vec_sql, c)}, 'cid', {cid})"
        for cid, c in cents
    )
    return f"array_min(array({entries}))"


def _sign_bucket(vec: Column, n_planes: int) -> Column:
    """Deterministic sign-LSH bucket id from seeded pseudo-random planes."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    dim_idx,
                    lambda x, i: x
                    * (
                        (
                            F.pmod(F.xxhash64(i.cast("string"), F.lit(p)), F.lit(2001))
                            .cast("double")
                            - 1000.0
                        )
                        / 1000.0
                    ),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, t: acc + t,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    return sum((b * (1 << p) for p, b in enumerate(bits)), F.lit(0))


def sign_bucket_md5(vec: Column, n_planes: int) -> Column:
    """Sign-LSH bucket with **md5-derived** plane coefficients — slower
    than the hash-fold or matmul variants but SQL-reproducible: DuckDB
    computes coef(i,p) = (('0x'||substr(md5(i||','||p),1,15))::BIGINT
    % 2001 - 1000)/1000.0 identically, so bucketed ANN results can be
    oracle-checked end to end."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    dim_idx,
                    lambda x, i: x
                    * (
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            i.cast("string"), F.lit(f",{p}")
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % 2001
                        ).cast("double")
                        - 1000.0
                    )
                    / 1000.0,
                ),
                F.lit(0.0).cast("double"),
                lambda acc, t: acc + t,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    return sum((b * (1 << p) for p, b in enumerate(bits)), F.lit(0))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    n_planes: int = 6,
    multiprobe: bool = True,
    bucket_fn=None,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within LSH buckets.

    Queries probe their own bucket plus (``multiprobe``) every bucket at
    Hamming distance 1 — recall rises steeply for ~n_planes× extra probes
    while still scoring a tiny corpus fraction. Queries with fewer than k
    in-bucket neighbors simply return fewer rows (standard ANN contract).
    ``bucket_fn(vec_col, n_planes) -> Column`` overrides the bucketing
    (default: seeded hash-fold planes; :func:`sign_bucket_md5` for an
    oracle-reproducible variant). Recall vs the exact baseline is
    asserted in tests/test_similarity.py.
    """
    bucketer = bucket_fn or _sign_bucket
    qid = query_id_col or id_col
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("_cv")
    )
    c = c.withColumn("_cn", _norm(F.col("_cv"))).withColumn(
        "_bkt", bucketer(F.col("_cv"), n_planes)
    )
    q = queries.select(
        F.col(qid).alias("query_id"), _dvec(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv"))).withColumn(
        "_qbkt", bucketer(F.col("_qv"), n_planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("_qbkt"),
            *[
                F.col("_qbkt").bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "_qv", "_qn", F.explode(probes).alias("_bkt")
        )
    else:
        q = q.withColumnRenamed("_qbkt", "_bkt")

    scored = (
        c.join(q, on="_bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _pair_dots(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer + nprobe search
# ---------------------------------------------------------------------------


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold (oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    corpus: DataFrame,
    nlist: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_max: int = 100_000,
) -> DataFrame:
    """(cluster_id, centroid array<double>): deterministic Lloyd k-means.

    Init is data-derived but seedless-reproducible: the ``nlist`` vectors
    with the smallest ``(md5(id), id)`` key become the initial centroids
    (SQL can replicate that choice exactly, unlike random sampling).
    Fixed ``iterations`` Lloyd rounds: assign to the nearest centroid
    (ties break by cluster id), recompute per-cell means; a cell that
    loses all members keeps its previous centroid. Centroids are small
    (``nlist`` rows) — every round broadcasts them, so the only shuffles
    are the per-round (cluster, dim) mean aggregations.

    The relation pinned across the rounds is BOUNDED: above
    ``train_max`` rows, the fit runs on the ``train_max`` vectors with
    the smallest ``(md5(id), id)`` key — the same deterministic draw as
    the seeds, replicable in SQL (``ORDER BY md5(id), id LIMIT N``), so
    sampled centroids stay oracle-reproducible. Pinning a 100 TB corpus
    for an nlist×dim parameter matrix is an executor-memory gamble; a
    uniform sample is the standard k-means training shape. At or below
    the bound the ordered limit selects every row, so the training set
    is identical to full-corpus training — no size probe needed.
    """
    v_all = corpus.select(
        F.col(id_col).alias("_id"), _dvec(F.col(vec_col)).alias("_v")
    )
    # unconditional TakeOrdered (≤ train_max corpora get ALL their rows
    # — same training set as the unbounded plan), dropping the size
    # probe's extra driver-synchronized job
    v = (
        v_all.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(train_max)
        .localCheckpoint(eager=True)
    )

    # seed selection via distributed TakeOrdered (orderBy+limit), NOT a
    # global row_number window — a partitionBy-less window single-tasks
    # the whole corpus. The nlist seed rows are collected: centroids are
    # driver-held for the whole fit (nlist × dim doubles — the standard
    # k-means shape, what MLlib does with its broadcast centroid matrix).
    seeds = (
        v.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(nlist)
        .collect()
    )
    cents_rows: list[tuple[int, list[float]]] = [
        (i, list(r["_v"])) for i, r in enumerate(seeds)
    ]
    dim = len(cents_rows[0][1]) if cents_rows else 0

    for _ in range(iterations):
        # each Lloyd round is ONE job: a narrow-map argmin assignment
        # (literal centroids — no join, no nlist-fold row explosion)
        # feeding a groupBy whose per-dimension sums partial-aggregate
        # map-side, so the shuffle carries nlist×(dim+1) combined values
        # per partition — not the n×dim exploded rows of a
        # posexplode/avg formulation. The argmin subtree is one expr()
        # string (see _sqdist_sql) — bit-identical, cheap to rebuild.
        agg = (
            v.withColumn(
                "_cid", F.expr(_argmin_struct_sql("_v", cents_rows) + "['cid']")
            )
            .groupBy("_cid")
            .agg(
                F.count("*").alias("_n"),
                *[F.sum(F.col("_v")[i]).alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        means = {
            r["_cid"]: [r[f"_s{i}"] / r["_n"] for i in range(dim)] for r in agg
        }
        # a cell that lost all members keeps its previous centroid
        cents_rows = [(cid, means.get(cid, c)) for cid, c in cents_rows]

    return corpus.sparkSession.createDataFrame(
        [(cid, c) for cid, c in cents_rows],
        "cluster_id int, centroid array<double>",
    )


#: use literal-centroid (narrow-map) assignment while the plan stays
#: sane: nlist × dim literals embedded in one projection
_LITERAL_ASSIGN_MAX = 50_000


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_dist: bool = False,
) -> DataFrame:
    """(id, cluster_id[, d2]): nearest centroid per vector (squared L2;
    ties by cluster id). ``return_dist`` adds the squared distance.

    The centroid relation is tiny (``nlist`` rows), so for moderate
    nlist×dim it is collected and inlined as literal arrays: assignment
    becomes a **narrow map** (argmin over an array of (d2, cid) structs)
    — no join, no ``nlist``-fold row explosion, no shuffle; the same
    shape MLlib's KMeans uses (broadcast centroid matrix). Beyond
    ``_LITERAL_ASSIGN_MAX`` literals the broadcast-join + min-agg
    fallback keeps the plan size bounded. Both paths produce identical
    assignments (min over (d2, cid) struct ordering).
    """
    rows = centroids.select("cluster_id", "centroid").collect()
    dim = len(rows[0]["centroid"]) if rows else 0
    v = vectors.select(
        F.col(id_col).alias("_id"), _dvec(F.col(vec_col)).alias("_vv")
    )
    if rows and len(rows) * dim <= _LITERAL_ASSIGN_MAX:
        best = F.expr(
            _argmin_struct_sql(
                "_vv",
                [(r["cluster_id"], list(r["centroid"])) for r in rows],
            )
        )
        cols = [F.col("_id").alias(id_col), best["cid"].alias("cluster_id")]
        if return_dist:
            cols.append(best["d2"].alias("d2"))
        return v.select(*cols)

    c = centroids.select(F.col("cluster_id"), F.col("centroid").alias("_c"))
    scored = v.crossJoin(F.broadcast(c)).select(
        "_id",
        F.struct(
            _sq_dist(F.col("_vv"), F.col("_c")).alias("d2"),
            F.col("cluster_id").alias("cid"),
        ).alias("_dc"),
    )
    out_cols = [F.col("_id").alias(id_col), F.col("_best.cid").alias("cluster_id")]
    if return_dist:
        out_cols.append(F.col("_best.d2").alias("d2"))
    return (
        scored.groupBy("_id")
        .agg(F.min("_dc").alias("_best"))
        .select(*out_cols)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """IVF approximate top-k: exact cosine, scored only inside the
    ``nprobe`` cells nearest each query.

    The quantizer shrinks scored candidates by ~``nlist/nprobe``× while
    adapting cell boundaries to the data (k-means), the standard ANN
    trade-off ladder between brute force and LSH. Deterministic end to
    end (init, assignment ties, rank ties) — oracle-reproducible.
    Output: ``(query_id, neighbor_id, cosine, rank)``.
    """
    qid = query_id_col or id_col
    cents = kmeans_fit(corpus, nlist, iterations, id_col, vec_col)

    c_assigned = assign_clusters(corpus, cents, id_col, vec_col)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("_cv")
        )
        .withColumn("_cn", _norm(F.col("_cv")))
        .join(
            c_assigned.select(
                F.col(id_col).alias("neighbor_id"), "cluster_id"
            ),
            on="neighbor_id",
        )
    )

    # nprobe nearest cells per query (centroids broadcast)
    qv = queries.select(
        F.col(qid).alias("query_id"), _dvec(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("_d2"), F.col("cluster_id")
    )
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .withColumn("_d2", _sq_dist(F.col("_qv"), F.col("centroid")))
        .withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "_qn", "cluster_id")
    )

    scored = (
        c.join(probes, on="cluster_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _pair_dots(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
