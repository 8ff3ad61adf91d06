"""Distributed connected components — near-duplicate cluster assignment.

The LLM-pipeline dedup family (``operators.dedup``) produces *pairs*; turning
pairs into keep/drop decisions needs the transitive closure: if A~B and B~C,
all three are one duplicate cluster even when A~C was never a candidate.
That closure is connected components over the pair graph.

Scale posture: min-label propagation with pointer jumping (path halving) —
each round is one edge ⋈ label shuffle + groupBy-min (both partial-
aggregable) plus one label-frame self-join that follows each label's own
label, so chains collapse in O(log diameter) rounds instead of O(diameter)
(the same halving idea as large-star/small-star, Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14, at simpler constant factors).
Near-dup graphs are dense blobs (2-3 rounds); record-linkage graphs can be
long chains (e.g. edit-distance-1 name chains), where halving is the
difference between 3 rounds and dozens.
Lineage is truncated with ``localCheckpoint`` every round so the plan does
not grow with iterations; only a scalar convergence count ever reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    Parameters
    ----------
    nodes: one row per node (singletons allowed — they become their own
        cluster); ``node_col`` must be orderable (the min is the label).
    edges: undirected pair list; only ``src_col``/``dst_col`` are read.
    scratch_dir: where per-round label frames are parked. Defaults to a
        driver-local temp dir (correct for local[*]); ON A CLUSTER PASS A
        SHARED PATH (HDFS/object store) — executors must see it.

    Returns ``(node_col, cluster_id)``.

    Iteration-state note: per-round lineage is truncated by writing the
    (tiny) label frame to parquet and reading it back — the alternating
    two-slot scratch layout keeps disk use at two label frames. This is
    deliberate: chained ``localCheckpoint`` frames looked truncated
    (LogicalRDD plans, flat RDD debug DAG) but executed with per-round
    wall time DOUBLING from ~15 chained checkpoints, with or without AQE
    (measured: 0.15s/round -> 45s/round by round 19 on a 2000-node
    graph); the parquet round-trip measured flat at ~0.3s/round over the
    same loop. Parquet is also the only state form that survives a
    driver restart and works identically on a real cluster.
    """
    import shutil
    import tempfile

    sym = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # Edges are static across rounds: one materialization so each
    # iteration's join re-reads blocks instead of re-deriving the pair
    # generation lineage. A single (unchained) localCheckpoint is safe —
    # the pathology above needs a chain.
    sym = sym.localCheckpoint()

    spark = nodes.sparkSession
    owns_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="cc_labels_")

    def _truncate(df: DataFrame, rnd: int, obs=None) -> DataFrame:
        # Observation metrics ride the write job, so the convergence count
        # costs no second action per round
        path = f"{scratch}/r{rnd % 2}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    labels = _truncate(
        nodes.select(
            F.col(node_col).alias("u"), F.col(node_col).alias("comp")
        ),
        -1,
    )

    for _round in range(max_iter):
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
        stepped = labels.join(nbr, "u", "left").select(
            "u",
            F.least(
                F.col("comp"), F.coalesce(F.col("_nbr"), F.col("comp"))
            ).alias("_mid"),
            F.col("comp").alias("_old"),
        )
        # pointer jumping (path halving): follow THIS round's label of the
        # label. _mid always names a real node, so the lookup is a
        # self-join of the stepped frame (explicit DataFrame aliases — a
        # bare re-select shares attribute ids with the left side and the
        # join silently degenerates), and the fetched label is <= _mid by
        # the min invariant. Plain min-propagation needs DIAMETER rounds —
        # a chain of k edit-distance-1 records takes k rounds — while
        # halving reaches O(log diameter). stepped is deliberately NOT
        # checkpointed: computing it twice inside one round is one extra
        # join-agg over label-frame-sized data, cheaper than a third
        # materialization job.
        st = stepped.alias("st")
        hp = stepped.alias("hp")
        new = (
            st.join(hp, F.col("st._mid") == F.col("hp.u"), "left")
            .select(
                F.col("st.u").alias("u"),
                F.least(
                    F.col("st._mid"),
                    F.coalesce(F.col("hp._mid"), F.col("st._mid")),
                ).alias("_new"),
                F.col("st._old").alias("_old"),
            )
            .select(
                "u",
                F.col("_new").alias("comp"),
                (F.col("_new") != F.col("_old")).alias("_chg"),
            )
        )
        obs = Observation()
        new = new.observe(
            obs, F.sum(F.col("_chg").cast("long")).alias("changed")
        )
        new = _truncate(new, _round)
        changed = obs.get["changed"] or 0
        labels = new.drop("_chg")
        if changed == 0:
            break
    out = labels.select(
        F.col("u").alias(node_col), F.col("comp").alias("cluster_id")
    )
    # the result still reads from the scratch slot: hand the rows back as
    # a self-contained frame before dropping the temp dir
    if owns_scratch:
        out = out.localCheckpoint()
        shutil.rmtree(scratch, ignore_errors=True)
    return out


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
