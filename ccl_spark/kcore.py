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

from pyspark.sql import DataFrame, Window, functions as F


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


def core_numbers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 200,
) -> DataFrame:
    """Return ``(vertex long, core long)`` — the full k-core
    decomposition (each vertex's coreness: the largest k such that it
    survives in the k-core) via the iterative-h-index algorithm of
    Lü et al., "The H-index of a network node" (Nature Communications
    2016): start from c₀(v) = deg(v) and repeatedly set
    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)}), where H is the Hirsch
    h-index of the neighbor multiset.  The sequence is monotone
    non-increasing and converges exactly to the coreness — a fully
    distributed alternative to the inherently sequential min-degree
    peel.

    Execution shape: each round is one edge-keyed equi-join (neighbor
    value lookup), one ``row_number`` window per destination vertex
    (the h-index is max(min(val_desc_rank_r, r))), and one aggregate —
    all shuffle-partitioned on the vertex key, no collect_list, no
    driver data.  Hub skew lands on the window sort, which is
    spill-safe.  Rounds are O(peel depth) in practice (single digits
    on power-law graphs).  Convergence is probed with one count per
    round; the iteration is idempotent at the fixpoint, so the SQL
    oracle replays it as a fixed unroll with headroom rounds.
    """
    und = (
        edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .unionByName(
            edges.select(
                F.col(dst).cast("long").alias("s"), F.col(src).cast("long").alias("d")
            ).filter(F.col("s") != F.col("d"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = und.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("val")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = und.join(cur.withColumnRenamed("v", "d"), "d").select("s", "val")
        rn = nbr.withColumn(
            "rn", F.row_number().over(Window.partitionBy("s").orderBy(F.desc("val")))
        )
        h = rn.groupBy("s").agg(
            F.max(F.least(F.col("val"), F.col("rn"))).cast("long").alias("h")
        )
        nxt = (
            cur.join(h.withColumnRenamed("s", "v"), "v", "left")
            .select("v", F.least(F.col("val"), F.coalesce("h", F.lit(0))).alias("val"))
            .localCheckpoint(eager=False)
        )
        changed = nxt.join(
            cur.withColumnRenamed("val", "old"), "v"
        ).filter(F.col("val") != F.col("old")).count()
        cur.unpersist()
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(f"core_numbers: no fixpoint in {max_iter} rounds")
    return cur.select(F.col("v").alias("vertex"), F.col("val").alias("core"))
