"""Distributed connected components — near-duplicate cluster assignment.

The LLM-pipeline dedup family (``operators.dedup``) produces *pairs*; turning
pairs into keep/drop decisions needs the transitive closure: if A~B and B~C,
all three are one duplicate cluster even when A~C was never a candidate.
That closure is connected components over the pair graph.

Scale posture: min-label propagation, the standard MapReduce formulation —
each round is one shuffle (edge ⋈ label, then groupBy-min, both partial-
aggregable) and rounds converge in O(graph diameter). Near-dup graphs are
dense blobs with tiny diameter (2–4 rounds in practice), so this beats the
asymptotically-better large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) on constant factors; switch to
alternating stars if a workload ever exhibits long-chain components.
Lineage is truncated with ``localCheckpoint`` every round so the plan does
not grow with iterations; only a scalar convergence count ever reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    Parameters
    ----------
    nodes: one row per node (singletons allowed — they become their own
        cluster); ``node_col`` must be orderable (the min is the label).
    edges: undirected pair list; only ``src_col``/``dst_col`` are read.

    Returns ``(node_col, cluster_id)``.
    """
    sym = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # Edges are static across rounds: checkpoint once so each iteration's
    # join re-reads materialized blocks instead of re-deriving the pair
    # generation lineage (at scale: persist / write to a bucketed table).
    # eager=False everywhere in this function: materialization rides the
    # iteration's convergence count instead of paying a separate job per
    # checkpoint — HALF the Spark jobs per round, which is what dominates
    # wall clock when the pair graph is far smaller than the corpus.
    sym = sym.localCheckpoint(eager=False)

    labels = nodes.select(
        F.col(node_col).alias("u"), F.col(node_col).alias("comp")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("comp").alias("_nc")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_nc").alias("_nbr"))
        )
        # carry a changed-flag through the same projection so convergence
        # detection is a filter over the checkpointed result, not a second
        # join against the previous labels
        new = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("comp"), F.coalesce(F.col("_nbr"), F.col("comp"))
                ).alias("_new"),
                F.col("comp").alias("_old"),
            )
            .select(
                "u",
                F.col("_new").alias("comp"),
                (F.col("_new") != F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        # the count materializes the lazy checkpoint; later rounds reuse
        # the persisted blocks
        changed = new.filter(F.col("_chg")).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("u").alias(node_col), F.col("comp").alias("cluster_id"))


def dedup_decisions(
    clusters: DataFrame, node_col: str = "doc_id"
) -> DataFrame:
    """Keep/drop verdict per document from a cluster assignment: the cluster
    representative (minimum id — which IS ``cluster_id`` by construction) is
    kept, every other member dropped. Pure projection, no extra shuffle."""
    return clusters.select(
        node_col,
        "cluster_id",
        (F.col(node_col) == F.col("cluster_id")).alias("keep"),
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    damping: float = 0.85,
    n_iter: int = 10,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """PageRank over an undirected edge list, fixed iteration count.

    Returns ``(node_col, rank)`` in the 1-centered formulation
    ``rank = (1-d) + d * sum(in)``. By default no dangling-mass
    redistribution is applied: an isolated node settles at ``1-d`` and
    total mass is <= |V| (equal only when every node has out-degree > 0)
    — fine for the near-dup-cluster ranking this feeds, where only
    relative order within a connected component matters. With
    ``redistribute_dangling=True`` the standard correction (Page et al.
    1999) is applied: each round, the rank mass sitting on out-degree-0
    nodes is spread uniformly over all nodes
    (``rank = (1-d) + d*(sum_in + dangling_mass/|V|)``), and total mass
    converges to exactly ``|V|`` — use it when absolute rank values
    matter (cross-component comparison, mass-conservation audits). Cost:
    one extra scalar aggregate per round over the (static, usually tiny)
    dangling-node set, broadcast back as a one-row crossJoin. Each
    iteration is one join + one
    aggregation on the edge list — rank mass flows along edges, damped
    toward the uniform prior. Fixed
    ``n_iter`` (not convergence-tested) keeps the result deterministic for
    a given graph. Lineage is truncated per round (``localCheckpoint``) so
    the plan doesn't grow with iterations — at cluster scale, persist to a
    bucketed table instead and co-partition ``edges`` by ``u`` so every
    round's join is shuffle-free on the edge side.
    """
    sym = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint()
    degrees = sym.groupBy("u").agg(F.count("*").alias("_deg"))
    # iteration frames carry (id, rank/deg) only — far smaller than the
    # input. Sizing their partition count to the EDGE count (not the
    # session's shuffle.partitions) keeps per-round task-scheduling
    # overhead proportional to the graph, which is what dominates an
    # iterative algorithm's wall clock when the graph is much smaller
    # than the corpus that produced it.
    n_parts = max(1, min(sym.sparkSession.sparkContext.defaultParallelism,
                         sym.count() // 10_000 + 1))
    out_edges = sym.join(degrees, "u").coalesce(n_parts).localCheckpoint()

    base = nodes.select(F.col(node_col).alias("u")).coalesce(n_parts)
    ranks = base.withColumn("rank", F.lit(1.0)).localCheckpoint()

    if redistribute_dangling:
        # static set: symmetrized edges give every endpoint out-degree >0,
        # so dangling == node never appearing in an edge
        dangling = base.join(degrees, "u", "left_anti").localCheckpoint()
        n_nodes = base.count()  # scalar; bounded driver value

    for i in range(n_iter):
        contrib = (
            out_edges.join(ranks, "u")
            .select(
                F.col("v").alias("u"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .groupBy("u")
            .agg(F.sum("_c").alias("_in"))
        )
        incoming = F.coalesce(F.col("_in"), F.lit(0.0))
        if redistribute_dangling:
            dang_mass = dangling.join(ranks, "u").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            # one-row crossJoin (allowlisted bounded NLJ): ships the scalar
            # to every task without a driver round-trip inside the lineage
            ranks = (
                base.join(contrib, "u", "left")
                .crossJoin(F.broadcast(dang_mass))
                .select(
                    "u",
                    (
                        F.lit(1.0 - damping)
                        + F.lit(damping)
                        * (incoming + F.col("_dm") / F.lit(float(n_nodes)))
                    ).alias("rank"),
                )
            )
        else:
            ranks = base.join(contrib, "u", "left").select(
                "u",
                (F.lit(1.0 - damping) + F.lit(damping) * incoming).alias(
                    "rank"
                ),
            )
        # truncate lineage every few rounds: a checkpoint per round pays a
        # full materialization each iteration, while a 3-round join-agg
        # lineage is still cheap to plan — checkpoint cadence trades
        # materialization cost against plan depth
        if (i + 1) % 3 == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("u").alias(node_col), F.round("rank", 6).alias("rank")
    )
