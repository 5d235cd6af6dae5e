"""Distributed greedy graph coloring — Jones-Plassmann (1993) with
deterministic md5 priorities.

A vertex colors itself once every UNCOLORED neighbor has lower
priority ``(U(v), v)``; it takes the mex (minimum excludant — the
smallest color its already-colored neighbors don't use).  Two adjacent
vertices are never simultaneously ready (one outranks the other), so
every round extends a proper coloring; expected O(log n) rounds with
hash priorities.  Priorities are pure functions of (vertex, salt), so
the coloring is one specific assignment — reproducible across
partitionings, retries, and engines (the SQL oracle unrolls the same
rounds).

Per round, all vertex-keyed equi-joins:
- ready test: one join of the edge table against the uncolored set's
  priorities + one left-anti (no uncolored higher neighbor survives);
- mex: colored-neighbor colors per ready vertex (one join + groupBy),
  candidate colors 0..n generated JVM-side (sequence explode — a
  vertex with n colored neighbors needs no candidate above n), one
  anti-join, one min;
- state: colored grows, uncolored shrinks geometrically; both
  localCheckpoint-ed so plan depth stays O(1) per round.

Web-graph use: coloring is the classic scheduling primitive —
conflict-free update batches for asynchronous algorithms, register
allocation for co-hosted crawls; chromatic structure also bounds
clique size from below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccl_spark.graphstats import _symmetrized
from ccl_spark.mis import _priority


def greedy_coloring(
    edges: DataFrame,
    salt: str = "jp",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """Return ``(vertex long, color long)`` — a proper coloring of the
    symmetrized simple graph by Jones-Plassmann rounds (self-loops
    dropped; isolated vertices don't appear in the edge table and are
    trivially color 0 by convention — callers with a vertex universe
    can left-join and coalesce).  Raises if ``max_rounds`` is
    exhausted with uncolored vertices — never returns a partial
    coloring."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    spark = edges.sparkSession
    uncolored = (
        und.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("p", _priority("v", salt))
        .localCheckpoint(eager=True)
    )
    colored = spark.createDataFrame([], "vertex long, color long")
    # newly's count doubles as the stop signal — the globally
    # highest-priority uncolored vertex is always ready, so an empty
    # round means the uncolored set is empty. colored stays a union of
    # already-checkpointed per-round frames (measured faster than
    # re-checkpointing the growing union each round at gate scale).
    for _ in range(max_rounds):
        # max uncolored-neighbor priority per uncolored vertex (the MIS
        # shape: one edge join + one map-side-partial struct-max), then
        # ready = no uncolored neighbor outranks me
        mx = (
            und.join(uncolored.select(F.col("v").alias("s")), "s", "left_semi")
            .join(
                uncolored.select(
                    F.col("v").alias("d"),
                    F.col("p").alias("pn"),
                    F.col("v").alias("vn"),
                ),
                "d",
            )
            .groupBy("s")
            .agg(F.max(F.struct("pn", "vn")).alias("mx"))
            .select(F.col("s").alias("v"), "mx")
        )
        ready = (
            uncolored.join(mx, "v", "left")
            .filter(
                F.col("mx").isNull()
                | (F.col("mx") < F.struct(F.col("p"), F.col("v")))
            )
            .select("v")
        )
        # mex over colored-neighbor colors
        used = (
            und.join(ready.withColumnRenamed("v", "s"), "s", "left_semi")
            .join(
                colored.select(
                    F.col("vertex").alias("d"), F.col("color").alias("c")
                ),
                "d",
            )
            .select(F.col("s").alias("v"), "c")
            .distinct()
        )
        n_used = used.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        cand = (
            ready.join(n_used, "v", "left")
            .select("v", F.coalesce("n", F.lit(0)).alias("n"))
            .select(
                "v",
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.col("n").cast("long"))
                ).alias("c"),
            )
        )
        newly = (
            cand.join(used, ["v", "c"], "left_anti")
            .groupBy("v")
            .agg(F.min("c").cast("long").alias("color"))
            .select(F.col("v").alias("vertex"), "color")
            .localCheckpoint(eager=True)
        )
        if newly.count() == 0:
            return colored
        colored = colored.unionByName(newly)
        uncolored = uncolored.join(
            newly.select(F.col("vertex").alias("v")), "v", "left_anti"
        ).localCheckpoint(eager=True)
    if uncolored.limit(1).count() == 0:
        return colored
    raise RuntimeError(f"greedy_coloring: uncolored vertices after {max_rounds} rounds")
