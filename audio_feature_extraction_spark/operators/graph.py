"""Connected components over duplicate-pair graphs (graph-lite, SURVEY §1.1).

The reference's only graph structure is the teacher→students pairing map
(`05_dtw_alignment_experiment/dtw_alignment.py:1377-1416`) — a one-level
grouping. The curation analog a 100 TB pipeline actually needs is one step
more: near-duplicate PAIRS (minhash/simhash/jaccard output) must become
duplicate CLUSTERS so exactly one representative per cluster survives.
That is connected components, implemented here as distributed min-label
propagation on DataFrames.

Scale shape: each round is one shuffle join (messages along edges) + one
keyed min-agg; rounds needed = max component diameter. Near-dup clusters
are dense and shallow (diameter ≲ 4 in practice), so this converges in a
handful of rounds; for adversarial long-chain graphs swap in the
large-star/small-star contraction (same primitive ops, O(log n) rounds).
Lineage is truncated every round with localCheckpoint so the plan does not
grow with iterations; the convergence check is one count() per round —
a scalar driver action, not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    edge_a: str = "id_a",
    edge_b: str = "id_b",
    out: str = "cluster_id",
    max_iter: int = 50,
) -> DataFrame:
    """(node, cluster_id) where cluster_id = min node id reachable in the
    undirected graph; isolated nodes are their own singleton cluster.

    ``edges`` may list each undirected pair once in either orientation;
    duplicate edges are harmless (min-agg absorbs them)."""
    sym = edges.select(
        F.col(edge_a).alias("src"), F.col(edge_b).alias("dst")
    ).unionAll(
        edges.select(F.col(edge_b).alias("src"), F.col(edge_a).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)
    # only edge-endpoint nodes ride the iteration: isolated nodes are their
    # own singleton cluster by definition and would otherwise multiply every
    # round's join/agg/checkpoint by |nodes| / |touched| (a dup graph is
    # SPARSE — a few % of a 100 TB corpus has a near-dup partner)
    all_nodes = nodes.select(F.col(id_col).alias("node"))
    touched = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .join(all_nodes, "node", "left_semi")  # output universe = nodes
    )
    lbl = touched.select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            sym.join(
                lbl.select(
                    F.col("node").alias("dst"), F.col("lbl").alias("dst_lbl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("dst_lbl").alias("nbr_min"))
        )
        new = (
            lbl.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.select("node", F.col("lbl").alias("new_lbl"))
            .join(lbl, "node")
            .where(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        lbl = new
        if changed == 0:
            break
    isolated = all_nodes.join(touched, "node", "left_anti").select(
        "node", F.col("node").alias("lbl")
    )
    return lbl.unionAll(isolated).select("node", F.col("lbl").alias(out))
