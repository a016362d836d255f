"""Graph algorithms over the PG / edge relations, DataFrame-native.

The north-star approach calls for graph processing on top of the
constructed knowledge graph. GraphX has no Python API and GraphFrames is
an external package, so the algorithms here are expressed directly as
iterative DataFrame programs — the same join/agg shapes GraphFrames
compiles to, without the dependency:

* :func:`connected_components` — iterative min-label propagation
  (each round: component = min(component of self, components of
  neighbors)); converges in O(graph diameter) rounds. Used for dedup
  clustering (near-dup pairs → canonical groups).
* :func:`degrees` — in/out/total degree per node.
* :func:`k_hop_neighbors` — BFS frontier expansion.
* :func:`pagerank` — power iteration with uniform teleport.

Scale notes: every round shuffles on the join key only; frontiers/labels
are checkpointed every few rounds (`localCheckpoint`) to truncate the
growing lineage — standard practice for iterative Spark jobs. Label
propagation is deterministic (min over ids), so results are
oracle-reproducible (DuckDB recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected view: both directions, no self-loops, distinct."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_id: str = "id",
    max_iterations: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(id, component) — component = min node id reachable (undirected).

    Driver-side loop with a distributed body; terminates when a round
    changes no label (an `isEmpty` on the changed-set — cheap, early-exit)
    or after ``max_iterations``.
    """
    e = _sym_edges(edges, src, dst)
    # pin the edge relation: it is referenced in every round, and without
    # materialization its (possibly expensive) upstream plan — e.g. the
    # near-dup pair pipeline — re-executes per iteration
    e = e.localCheckpoint(eager=True)
    ids = e.select(F.col("src").alias("id"))
    if nodes is not None:
        ids = ids.unionByName(nodes.select(F.col(node_id).alias("id")))
    labels = ids.distinct().withColumn("component", F.col("id"))

    for i in range(max_iterations):
        # candidate = min over (self, neighbor components)
        nbr = (
            e.join(labels, e["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        if changed.isEmpty():
            labels = new_labels
            break
        labels = new_labels
    return labels.select("id", "component")


def degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, out_degree, in_degree, degree) per node appearing in an edge."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, on="id", how="full")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def k_hop_neighbors(
    edges: DataFrame,
    start: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    start_id: str = "id",
) -> DataFrame:
    """(id, min_hops) for every node within k hops of the start set
    (directed BFS; min_hops=0 for the start nodes)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    visited = start.select(F.col(start_id).alias("id")).distinct().withColumn(
        "min_hops", F.lit(0)
    )
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            e.join(frontier, e["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), on="id", how="left_anti")
            .withColumn("min_hops", F.lit(hop))
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(id, rank) by power iteration with uniform dangling redistribution:

        rank'(v) = (1-d)/n + d * (inflow(v) + dangling/n)

    where ``dangling`` is the summed rank of nodes without out-edges —
    redistributed **uniformly** (adding d·dangling/n to every node), the
    standard semantics; ranks sum to 1 every iteration by construction,
    so there is no renormalization pass. The dangling mass is computed
    inside the same distributed pass (a 1-row left_anti aggregate
    crossJoined into the update), never collected on the driver — one
    Spark job per iteration (plus the periodic lineage checkpoint).
    Deterministic for a fixed iteration count; loop-invariant relations
    (edges, node set, out-degrees) are pinned once with localCheckpoint.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = ids.count()
    out_deg = (
        e.groupBy("src").agg(F.count("*").alias("_deg")).localCheckpoint(eager=True)
    )
    ranks = ids.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(out_deg, on="src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(
                out_deg.select(F.col("src").alias("id")), on="id", how="left_anti"
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        ranks = (
            ids.join(contribs, on="id", how="left")
            .crossJoin(dangling)
            .select(
                "id",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("_dangling") / n
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.round("rank", 8).alias("rank"))
