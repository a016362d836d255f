"""Triples → property-graph (PG) relation.

Semantics per reference src/ketl/io/core.py:16-127:

* ``labels``     = set of ``@type`` values per element
* ``from``/``to``= an ``@from``/``@to`` value per element (NULL for nodes)
* ``properties`` = map key → set of serialized values (``{}`` default)
* ``type``       = ``edge`` iff ``from`` is non-NULL, else ``node``

Scale design (100 TB): the reference materializes four separate
aggregations of the triple relation and left-joins them back on ``id``
(io/core.py:57-102) — five shuffles of the full relation plus three join
exchanges. Here the whole build is **one hash aggregation** (a single
shuffle on ``id``): structure rows become conditional aggregates and the
properties map is assembled from the collected (key, value) pairs with
higher-order array functions, all JVM-side. Partial (map-side) aggregation
applies, so the shuffle carries pre-combined per-id state, not raw triples.

Determinism: ``collect_set``/``collect_list`` order is undefined, so
``labels`` and each property value set are sorted (`array_sort`). The
reference takes `first()` for endpoints (io/core.py:62-65), which is
nondeterministic under multiple values; we take `max()` — deterministic,
and identical whenever the input has one endpoint value per element (the
validated case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.model import FROM_KEY, SPECIAL_KEYS, TO_KEY, TYPE_KEY, PGElementType


def triples_to_pg(
    triples: DataFrame,
    validate: bool = False,
    two_level: bool = False,
) -> DataFrame:
    """Aggregate a triple DataFrame into the PG relation.

    With ``validate=True``, edges missing endpoints or elements with zero
    labels raise at execution time (the validation the reference left as a
    TODO, src/ketl/io/core.py:115-118).

    ``two_level=True`` selects the skew-safe plan: a pathological element
    with millions of property rows hot-spots one reducer in the default
    single-shuffle build (all its raw (key,value) pairs collect on one
    task). The two-level variant pre-aggregates on ``(id, key)`` first —
    ``collect_set`` partials dedup map-side, so the second (per-id)
    shuffle carries one bounded row per (id, key) instead of raw pairs.
    Costs a second shuffle; identical output (tests assert equality).
    """
    if two_level:
        agg = _agg_two_level(triples)
    else:
        agg = _agg_single(triples)

    pg = agg.select(
        F.col("id"),
        F.when(F.col("from").isNotNull(), F.lit(str(PGElementType.EDGE)))
        .otherwise(F.lit(str(PGElementType.NODE)))
        .alias("type"),
        F.col("labels"),
        F.col("from"),
        F.col("to"),
        F.col("properties"),
    )

    if validate:
        # expressed as a filter over assert_true so Catalyst cannot prune
        # the check away (a dropped projection column would be eliminated)
        ok = ~(
            (F.col("type") == str(PGElementType.EDGE))
            & (F.col("from").isNull() | F.col("to").isNull())
        ) & (F.size("labels") > 0)
        pg = pg.filter(
            F.when(
                ~ok,
                F.raise_error(
                    F.concat(
                        F.lit("invalid PG element (missing endpoint or label): "),
                        F.col("id"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )

    return pg


def _agg_single(triples: DataFrame) -> DataFrame:
    """One hash aggregation on ``id`` (the default plan; see module doc).

    The exchange is sized for group count, not byte volume — collect
    buffers are per-group objects (see
    ``runtime.checkpoint.group_agg_partitions`` / SCALE.md)."""
    from ..runtime.checkpoint import group_agg_partitions

    k, v = F.col("key"), F.col("value")
    is_prop = ~k.isin(*SPECIAL_KEYS)

    pairs = F.collect_list(F.when(is_prop, F.struct(k.alias("key"), v.alias("value"))))

    agg = triples.repartition(group_agg_partitions(triples), "id").groupBy("id").agg(
        F.array_sort(
            F.array_distinct(F.collect_list(F.when(k == TYPE_KEY, v)))
        ).alias("labels"),
        F.max(F.when(k == FROM_KEY, v)).alias("from"),
        F.max(F.when(k == TO_KEY, v)).alias("to"),
        pairs.alias("_pairs"),
    )

    # (key,value) pairs -> map<key, sorted distinct values>, JVM-side.
    pkeys = F.array_sort(F.array_distinct(F.transform(F.col("_pairs"), lambda p: p["key"])))
    props = F.map_from_entries(
        F.transform(
            pkeys,
            lambda pk: F.struct(
                pk.alias("key"),
                F.array_sort(
                    F.array_distinct(
                        F.transform(
                            F.filter(F.col("_pairs"), lambda p: p["key"] == pk),
                            lambda p: p["value"],
                        )
                    )
                ).alias("values"),
            ),
        )
    )
    return agg.select("id", "labels", "from", "to", props.alias("properties"))


def _agg_two_level(triples: DataFrame) -> DataFrame:
    """Skew-safe twin of :func:`_agg_single`: pre-aggregate on (id, key) so
    the per-id reducer sees one deduped row per key, not raw pairs.

    NULL handling must mirror the single-level build exactly: values are
    collected through a struct wrapper (collect_set/list drop bare NULLs
    but keep structs with a NULL field), endpoints ignore NULL values
    (``array_max`` skips them, like the single-level ``max``; NULL on an
    empty set, never an ANSI element_at error), and NULL labels are
    filtered as collect_list does.
    """
    from ..runtime.checkpoint import group_agg_partitions

    # partition by id only: HashPartitioning(id) satisfies BOTH grouping
    # levels, so the whole two-level build runs over one sized exchange
    per_key = triples.repartition(
        group_agg_partitions(triples), "id"
    ).groupBy("id", "key").agg(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.collect_list(F.struct(F.col("value").alias("v"))),
                    lambda s: s["v"],
                )
            )
        ).alias("_vals")
    )
    k = F.col("key")
    is_prop = ~k.isin(*SPECIAL_KEYS)
    # per id: at most one row per special key, so max() over the single
    # candidate is deterministic
    agg = per_key.groupBy("id").agg(
        F.coalesce(
            F.max(
                F.when(
                    k == TYPE_KEY,
                    F.filter(F.col("_vals"), lambda x: x.isNotNull()),
                )
            ),
            F.array().cast("array<string>"),
        ).alias("labels"),
        F.max(F.when(k == FROM_KEY, F.array_max(F.col("_vals")))).alias("from"),
        F.max(F.when(k == TO_KEY, F.array_max(F.col("_vals")))).alias("to"),
        F.array_sort(
            F.collect_list(
                F.when(
                    is_prop,
                    F.struct(k.alias("key"), F.col("_vals").alias("values")),
                )
            )
        ).alias("_entries"),
    )
    return agg.select(
        "id",
        "labels",
        "from",
        "to",
        F.map_from_entries(F.col("_entries")).alias("properties"),
    )


def triples_to_pg_flat(
    triples: DataFrame, partitions: int | None = None
) -> DataFrame:
    """Flattened (export-shaped) PG build: same semantics as
    :func:`triples_to_pg` but emitting deterministic *strings* instead of
    array/map columns — ``labels_str`` is the sorted ``|``-joined label
    set and ``props_str`` is ``key=[v1,v2];key2=[...]`` with keys and
    values sorted. This is the shape JSONL export and oracle comparison
    need, produced without the nested higher-order-function map assembly
    of the map-typed build (whose per-row interpreted lambdas dominate
    runtime: ~3x slower end-to-end at sf0.1).

    Scale design: two aggregation levels — (id, key) then (id) — after a
    SINGLE hash exchange on ``id``: ``HashPartitioning(id)`` satisfies the
    clustered distribution required by ``groupBy(id, key)``, so Catalyst
    plans both aggregations over one shuffle. The (id, key) level also
    bounds reducer state for skewed elements (the property values of one
    hot id collapse to one row per key before the per-id fold), giving
    the two-level skew safety of :func:`_agg_two_level` without its
    second exchange.

    ``partitions`` sizes that exchange. Collect-style aggregation holds a
    buffer OBJECT per in-flight group, so the per-task group count — not
    byte volume — is what must stay bounded; a ``spark.sql.shuffle.partitions``
    tuned for scan-shaped stages under-partitions this stage as the
    element count grows (measured: 66-120s at 10x data on local[32] with
    32 partitions vs 9s with 256 — GC-bound object aggregation, not
    spill). Default: sized from the Catalyst plan-stats estimate of the
    triple relation (~200 KB of upstream scan bytes per task ≈ tens of
    thousands of groups), floored at shuffle.partitions, capped at 4096.
    Explicit repartitions are exempt from AQE coalescing, so small
    inputs just get small tasks, not extra shuffles.
    """
    k = F.col("key")
    is_prop = ~k.isin(*SPECIAL_KEYS)
    if partitions is None:
        from ..runtime.checkpoint import group_agg_partitions

        partitions = group_agg_partitions(triples)
    lvl1 = (
        triples.repartition(partitions, "id")
        .groupBy("id", "key")
        .agg(F.array_sort(F.collect_set("value")).alias("_vals"))
    )
    agg = lvl1.groupBy("id").agg(
        F.coalesce(
            F.max(F.when(k == TYPE_KEY, F.array_join("_vals", "|"))), F.lit("")
        ).alias("labels_str"),
        # element_at(-1) of the sorted set == max(value): matches both the
        # map-typed build's max() endpoint rule and the SQL oracle
        F.max(F.when(k == FROM_KEY, F.element_at("_vals", -1))).alias("from_id"),
        F.max(F.when(k == TO_KEY, F.element_at("_vals", -1))).alias("to_id"),
        F.coalesce(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            is_prop,
                            F.concat(
                                k,
                                F.lit("=["),
                                F.array_join("_vals", ","),
                                F.lit("]"),
                            ),
                        )
                    )
                ),
                ";",
            ),
            F.lit(""),
        ).alias("props_str"),
    )
    return agg.select(
        "id",
        F.when(F.col("from_id").isNotNull(), F.lit(str(PGElementType.EDGE)))
        .otherwise(F.lit(str(PGElementType.NODE)))
        .alias("type"),
        "labels_str",
        "from_id",
        "to_id",
        "props_str",
    )


def dangling_edges(pg: DataFrame) -> DataFrame:
    """Edges whose ``from``/``to`` reference no node id — the in-engine
    equivalent of the loader's endpoint check (reference
    src/ketl/io/neoloader.py:425-433). Anti-joins against the node id set;
    the node side is typically much smaller post-aggregation and AQE picks
    broadcast when it fits."""
    edge_t = str(PGElementType.EDGE)
    nodes = pg.filter(F.col("type") != edge_t).select(
        F.col("id").alias("_node_id")
    )
    edges = pg.filter(F.col("type") == edge_t)
    bad_from = edges.join(nodes, F.col("from") == F.col("_node_id"), "left_anti")
    bad_to = edges.join(nodes, F.col("to") == F.col("_node_id"), "left_anti")
    return bad_from.unionByName(bad_to).dropDuplicates(["id"])


def flatten_pg(pg: DataFrame) -> DataFrame:
    """Map-typed PG → the deterministic string shape of
    :func:`triples_to_pg_flat` (labels_str / from_id / to_id /
    props_str) — for export and oracle comparison of PG relations that
    were built or merged in map form."""
    pkeys = F.array_sort(F.map_keys("properties"))
    props_str = F.array_join(
        F.transform(
            pkeys,
            lambda k: F.concat(
                k,
                F.lit("=["),
                F.array_join(F.col("properties")[k], ","),
                F.lit("]"),
            ),
        ),
        ";",
    )
    return pg.select(
        "id",
        "type",
        F.array_join("labels", "|").alias("labels_str"),
        F.col("from").alias("from_id"),
        F.col("to").alias("to_id"),
        props_str.alias("props_str"),
    )


def pg_to_triples(pg: DataFrame) -> DataFrame:
    """The inverse of :func:`triples_to_pg`: expand a PG relation back to
    its (id, key, value) triple multiset — labels become ``@type`` rows,
    endpoints ``@from``/``@to`` rows, each property value its own row.

    ``triples_to_pg(pg_to_triples(pg)) == pg`` (tested), which makes N-way
    PG merging a single shuffle: union the expansions and re-aggregate,
    instead of folding N-1 full-outer joins of :func:`merge_pg`. One
    narrow explode per input — no shuffle of its own.
    """
    structs = F.concat(
        F.transform(
            "labels",
            lambda l: F.struct(
                F.lit(TYPE_KEY).alias("key"), l.alias("value")
            ),
        ),
        F.filter(
            F.array(
                F.struct(F.lit(FROM_KEY).alias("key"), F.col("from").alias("value")),
                F.struct(F.lit(TO_KEY).alias("key"), F.col("to").alias("value")),
            ),
            lambda s: s["value"].isNotNull(),
        ),
        F.flatten(
            F.transform(
                F.map_entries("properties"),
                lambda e: F.transform(
                    e["value"],
                    lambda v: F.struct(e["key"].alias("key"), v.alias("value")),
                ),
            )
        ),
    )
    return (
        pg.select("id", F.explode(structs).alias("_t"))
        .select("id", "_t.key", "_t.value")
    )


def merge_pg(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two PG relations into one, equivalent to rebuilding from the
    union of their source triples (asserted in tests and the
    ``kg_pg_incremental`` oracle) — the incremental-build primitive:
    aggregate only the DELTA's triples, then set-merge per id instead of
    re-aggregating the whole corpus.

    Merge rules mirror the aggregation semantics exactly: labels =
    sorted distinct union; endpoints = ``greatest`` (null-skipping max,
    = max over the unioned values); properties = per-key sorted distinct
    union via ``map_zip_with`` (key union); type recomputed from the
    merged ``from``. One full-outer join on id — at scale, bucket the
    stored PG by id hash and join only the delta-touched buckets
    (dynamic partition overwrite), so the rewrite cost tracks the delta,
    not the corpus.
    """
    earr = F.array().cast("array<string>")
    emap = F.expr("map()").cast("map<string,array<string>>")
    o = old.select(
        "id",
        F.col("labels").alias("_la"),
        F.col("from").alias("_fa"),
        F.col("to").alias("_ta"),
        F.col("properties").alias("_pa"),
    )
    d = delta.select(
        "id",
        F.col("labels").alias("_lb"),
        F.col("from").alias("_fb"),
        F.col("to").alias("_tb"),
        F.col("properties").alias("_pb"),
    )
    m = o.join(d, on="id", how="full_outer")
    labels = F.array_sort(
        F.array_union(F.coalesce("_la", earr), F.coalesce("_lb", earr))
    )
    frm = F.greatest("_fa", "_fb")
    to = F.greatest("_ta", "_tb")
    props = F.map_zip_with(
        F.coalesce("_pa", emap),
        F.coalesce("_pb", emap),
        lambda k, x, y: F.array_sort(
            F.array_union(F.coalesce(x, earr), F.coalesce(y, earr))
        ),
    )
    return m.select(
        "id",
        F.when(frm.isNotNull(), F.lit(str(PGElementType.EDGE)))
        .otherwise(F.lit(str(PGElementType.NODE)))
        .alias("type"),
        labels.alias("labels"),
        frm.alias("from"),
        to.alias("to"),
        props.alias("properties"),
    )
