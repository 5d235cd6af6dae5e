"""Maximal independent set — Luby's algorithm with deterministic
hash priorities (Luby 1986).

Each round, an undecided vertex enters the MIS iff its priority
``(U(v), v)`` (md5-derived unit draw, vertex id as tiebreak) is
strictly smaller than every undecided neighbor's; the new MIS members
and their neighbors then leave the undecided set.  Expected O(log n)
rounds; priorities are pure functions of (vertex, salt), so the
result is one specific MIS — reproducible across partitionings,
retries and engines (the SQL oracle replays the identical rounds).

Per round: one edge-keyed join against the undecided set to find each
vertex's minimum neighbor priority (map-side partial min), one
semi-join to peel winners and their neighbors.  State is O(|V|) rows
and shrinks geometrically; every round's survivor set is
``localCheckpoint``-ed.  Raises if ``max_rounds`` is exhausted with
vertices still undecided — never returns a non-maximal set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccl_spark.graphstats import _symmetrized


def _priority(col: str, salt: str) -> F.Column:
    return F.expr(
        f"cast(conv(substring(md5(concat(cast({col} as string), ',{salt}')),"
        f" 1, 13), 16, 10) as bigint)"
    )


def maximal_independent_set(
    edges: DataFrame,
    salt: str = "mis",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """Return ``(vertex long)`` — the members of the deterministic
    Luby MIS of the symmetrized simple graph (isolated vertices are
    trivially members; self-loops are dropped)."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    verts = und.select(F.col("s").alias("v")).distinct()
    undecided = verts.withColumn("p", _priority("v", salt)).localCheckpoint(
        eager=True
    )
    spark = und.sparkSession
    mis = spark.createDataFrame([], "vertex long")
    for _ in range(max_rounds):
        if undecided.limit(1).count() == 0:
            return mis
        nbr_p = undecided.select(
            F.col("v").alias("d"), F.col("p").alias("p_n"), F.col("v").alias("v_n")
        )
        # min undecided-neighbor priority per undecided vertex
        # (lexicographic (p, v) — encode as struct min)
        m = (
            und.join(undecided.select(F.col("v").alias("s")), "s")
            .join(nbr_p, "d")
            .groupBy("s")
            .agg(F.min(F.struct("p_n", "v_n")).alias("mn"))
            .select(
                F.col("s").alias("v"),
                F.col("mn.p_n").alias("np"),
                F.col("mn.v_n").alias("nv"),
            )
        )
        winners = (
            undecided.join(m, "v", "left")
            .filter(
                F.col("np").isNull()
                | (F.struct(F.col("p"), F.col("v")) < F.struct("np", "nv"))
            )
            .select("v")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(winners.select(F.col("v").alias("vertex")))
        removed = winners.unionByName(
            und.join(winners.withColumnRenamed("v", "s"), "s").select(
                F.col("d").alias("v")
            )
        ).distinct()
        undecided = undecided.join(removed, "v", "left_anti").localCheckpoint(
            eager=True
        )
    raise RuntimeError(f"MIS did not decide every vertex in {max_rounds} rounds")


def maximal_matching(
    edges: DataFrame,
    salt: str = "mm",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """Return ``(u long, v long)`` — a deterministic maximal matching
    of the symmetrized simple graph, by the edge-analogue of Luby's
    algorithm (Israeli & Itai 1986): each round, a live edge enters
    the matching iff its priority ``(U(e), u, v)`` is strictly
    smallest among all live edges sharing either endpoint; matched
    endpoints then drop out with all their edges.  The globally
    minimal live edge always wins, so every round makes progress;
    expected O(log n) rounds with hash priorities.

    Per round: one explode of each edge to its two endpoints, one
    per-endpoint struct-min aggregate (map-side partial), and one
    join-back to find edges that win at BOTH endpoints — all
    vertex-keyed equi-joins, state O(live edges) and shrinking.
    Priorities are pure md5 functions of (u, v, salt), so the result
    is one specific matching, reproducible across partitionings and
    engines.  Raises if ``max_rounds`` is exhausted with live edges
    remaining — never returns a non-maximal matching.
    """
    und = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    live = und.withColumn(
        "p",
        F.expr(
            f"cast(conv(substring(md5(concat(cast(u as string), ',',"
            f" cast(v as string), ',{salt}')), 1, 13), 16, 10) as bigint)"
        ),
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    matched = spark.createDataFrame([], "u long, v long")
    # winners' count doubles as the stop signal — the globally minimal
    # live edge always wins, so an empty round means the live set is
    # empty (no separate emptiness probe per round)
    for _ in range(max_rounds):
        s = F.struct("p", "u", "v").alias("s")
        ep = live.select(F.col("u").alias("x"), s).unionByName(
            live.select(F.col("v").alias("x"), s)
        )
        mn = ep.groupBy("x").agg(F.min("s").alias("mn"))
        winners = (
            live.join(mn.withColumnRenamed("x", "u"), "u")
            .filter(F.struct("p", "u", "v") == F.col("mn"))
            .drop("mn")
            .join(mn.withColumnRenamed("x", "v"), "v")
            .filter(F.struct("p", "u", "v") == F.col("mn"))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if winners.count() == 0:
            return matched
        matched = matched.unionByName(winners)
        mv = (
            winners.select(F.col("u").alias("x"))
            .unionByName(winners.select(F.col("v").alias("x")))
            .distinct()
        )
        live = (
            live.join(mv.withColumnRenamed("x", "u"), "u", "left_anti")
            .join(mv.withColumnRenamed("x", "v"), "v", "left_anti")
            .select("u", "v", "p")
            .localCheckpoint(eager=True)
        )
    if live.limit(1).count() == 0:
        return matched
    raise RuntimeError(f"maximal_matching: live edges after {max_rounds} rounds")


def vertex_cover(
    edges: DataFrame,
    salt: str = "mm",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """2-approximate minimum vertex cover: both endpoints of every
    edge in the deterministic maximal matching (Gavril/Yannakakis —
    the matching's endpoints hit every edge, and any cover needs at
    least one endpoint per matched edge, hence the factor 2).  Same
    distributed shape and determinism as :func:`maximal_matching`;
    returns ``(vertex long)`` sorted."""
    m = maximal_matching(edges, salt=salt, src=src, dst=dst, max_rounds=max_rounds)
    return (
        m.select(F.col("u").alias("vertex"))
        .unionByName(m.select(F.col("v").alias("vertex")))
        .distinct()
        .orderBy("vertex")
    )
