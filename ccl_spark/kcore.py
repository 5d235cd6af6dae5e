"""k-core decomposition: the maximal subgraph where every vertex has
degree >= k (undirected). The standard link-graph structure filter —
spam farms and boilerplate nav rings fall out of low cores; the dense
web sits in high ones.

Algorithm: iterative peel. Each round drops every vertex whose current
degree is below k; removing them lowers neighbors' degrees, so repeat
to a fixpoint. Rounds are one degree aggregation + two semi-joins —
all whole-stage-codegen, AQE-managed; the edge set only ever shrinks,
so per-round cost is monotonically decreasing. Round count is the peel
depth (small for power-law graphs). Same lazy-checkpoint/signature
pattern as cc.py: one job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 200,
) -> DataFrame:
    """Return ``(vertex long, degree long)`` — the vertices of the
    k-core with their degree INSIDE the core (all >= k). Self-loops
    are ignored; edge direction is ignored."""
    cur = (
        edges.select(
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = cur.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            cur.select(F.col("u").alias("vertex"))
            .unionByName(cur.select(F.col("v").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("vertex")
        nxt = (
            cur.join(keep.withColumnRenamed("vertex", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("vertex", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()  # materializes the lazy checkpoint
        cur.unpersist()
        converged = n_next == n_edges
        cur, n_edges = nxt, n_next
        if converged:
            break
    else:
        raise RuntimeError(f"k_core: no fixpoint in {max_iter} rounds")
    final_deg = (
        cur.select(F.col("u").alias("vertex"))
        .unionByName(cur.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return final_deg
