"""SimRank structural similarity (Jeh & Widom, KDD 2002): two pages
are similar if they are linked to by similar pages — the link-graph
dual of co-citation, iterated to a fixpoint.

Reference scope: the reference engine's component/label machinery
(ccl.py large-star/small-star, replay equivalences) answers "which
pages are CONNECTED"; SimRank answers the ranking question next door —
"which pages are ALIKE" — over the same directed edge table, and sits
in SURVEY §2's link-analysis extensions beside cocitation/coupling.

Recurrence: ``s(a,a) = 1``;
``s(a,b) = C / (|I(a)||I(b)|) * Σ_{i∈I(a), j∈I(b)} s(i,j)``
with decay ``C`` and in-neighbor sets ``I``.

Execution shape: the state is the SPARSE pair table — only pairs with
nonzero similarity, i.e. pairs whose in-neighborhoods meet within the
iterated closure — and one iteration is exactly two edge-keyed hash
equi-joins (state.i→a, state.j→b) + a grouped sum + the in-degree
normalization, never a |V|² materialization.  Each round is eagerly
checkpointed (the round-loop lesson: lazy checkpoints recompute the
whole chain through multi-reference DAGs).

Scale honesty: pair state is THE classic SimRank bottleneck — on a
100-TB web graph it is run over a partition of the graph (a host or a
crawl segment) or with ``prune_below`` dropping sub-threshold pairs
each round (the standard threshold-sieve approximation; error is
bounded by the dropped mass times the geometric tail of ``C``).  The
default keeps the arithmetic exact so the fixed-iteration sequence
has a chained-CTE oracle twin.

Decay ``C`` defaults to 0.5 — a power of two, so the per-round scale
factor is exact in binary (the katz/node2vec dyadic trick); the only
cross-engine float noise is summation order, absorbed by the final
6dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def simrank(
    edges: DataFrame,
    max_iter: int = 3,
    c: float = 0.5,
    prune_below: float = 0.0,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration SimRank over a directed edge table.

    Returns the full symmetric pair state ``(a, b, score)`` after
    ``max_iter`` rounds (diagonal included, score unrounded — callers
    round/filter for presentation).  ``prune_below > 0`` drops pairs
    whose score falls below the threshold after each round (the
    approximation lever; 0.0 = exact).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("s").alias("v"))
        .unionByName(e.select(F.col("d").alias("v")))
        .distinct()
    )
    indeg = e.groupBy("d").agg(F.count(F.lit(1)).alias("ind")).localCheckpoint(
        eager=True
    )
    diag = verts.select(
        F.col("v").alias("a"), F.col("v").alias("b"), F.lit(1.0).alias("score")
    ).localCheckpoint(eager=True)

    state = diag
    for _ in range(max_iter):
        moved = (
            state.join(e.select(F.col("s").alias("a"), F.col("d").alias("na")), "a")
            .join(e.select(F.col("s").alias("b"), F.col("d").alias("nb")), "b")
            .filter(F.col("na") != F.col("nb"))
            .groupBy("na", "nb")
            .agg(F.sum("score").alias("m"))
        )
        off = (
            moved.join(indeg.select(F.col("d").alias("na"), F.col("ind").alias("ia")), "na")
            .join(indeg.select(F.col("d").alias("nb"), F.col("ind").alias("ib")), "nb")
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                (F.lit(c) * F.col("m") / (F.col("ia") * F.col("ib"))).alias("score"),
            )
        )
        if prune_below > 0.0:
            off = off.filter(F.col("score") >= prune_below)
        state = off.unionByName(diag).localCheckpoint(eager=True)
    return state


def simrank_topk(
    edges: DataFrame,
    max_iter: int = 3,
    c: float = 0.5,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-``k`` off-diagonal similar pairs ``(u, v, score)`` with
    ``u < v`` (the state is symmetric, so one orientation carries all
    the information), 6dp-rounded, deterministic (score DESC, u, v)
    tie-break."""
    s = simrank(edges, max_iter=max_iter, c=c, src=src, dst=dst)
    return (
        s.filter(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .limit(k)
    )
