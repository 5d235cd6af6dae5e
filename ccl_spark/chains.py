"""Redirect-chain resolution — pointer doubling on a functional graph.

Web crawls accumulate redirect maps (301/canonical links): a
``(src, dst)`` table with one outgoing link per source.  Resolving
every URL to its terminal target by walking chains one hop per round
costs O(chain length) rounds; *pointer doubling* (``g ← g∘g``, the
classic parallel list-ranking contraction) halves every chain per
round, so L-long chains resolve in ⌈log₂ L⌉ self-joins — each round
is ONE hash equi-join of the O(|V|)-row pointer table with itself.

Determinism: duplicate out-edges collapse to the minimum target;
self-redirects are terminals.  A cycle never reaches a fixpoint —
``max_rounds`` exhaustion raises rather than returning a partial
resolution (2^max_rounds bounds the resolvable chain length, so the
default 32 covers any real redirect chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_chains(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 32,
) -> DataFrame:
    """``(v, target)`` — the terminal target of every source in the
    redirect map (targets that redirect nowhere resolve to themselves
    transitively; sources only appear as rows)."""
    f = (
        redirects.select(
            F.col(src).cast("long").alias("v"), F.col(dst).cast("long").alias("nxt")
        )
        .groupBy("v")
        .agg(F.min("nxt").alias("nxt"))
        .filter(F.col("v") != F.col("nxt"))
        .localCheckpoint(eager=True)
    )
    heads = f.select(F.col("v").alias("nxt"))  # sources with outgoing links
    g = f
    for _ in range(max_rounds):
        jumped = (
            g.join(
                g.select(F.col("v").alias("m"), F.col("nxt").alias("nxt2")),
                g["nxt"] == F.col("m"),
                "left",
            )
            .select("v", F.coalesce("nxt2", g["nxt"]).alias("nxt"))
            .localCheckpoint(eager=True)
        )
        g = jumped
        # resolved when no pointer lands on a source that still has an
        # outgoing link (one scalar probe per round)
        if g.join(heads, "nxt", "left_semi").limit(1).count() == 0:
            return g.select("v", F.col("nxt").alias("target"))
    raise RuntimeError(
        f"chains unresolved after {max_rounds} doubling rounds (cycle?)"
    )


def sssp(
    edges: DataFrame,
    source: int,
    weight_col: str | None = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 256,
    check_every: int = 1,
) -> DataFrame:
    """Single-source shortest paths by synchronous Bellman-Ford
    relaxation: dist_{t+1}(v) = min(dist_t(v), min over in-edges
    (dist_t(u) + w)).  ``weight_col=None`` means unit weights (= BFS
    levels).  Integer weights keep every distance an exact long, so
    results are bit-identical across engines and partitionings.

    Per round: one edge-keyed join of the O(|V|)-row distance table
    with the edge list and one per-vertex min (map-side partial) —
    the PageRank shuffle shape.  Converges in at most (hop count of
    the longest shortest path) rounds; the per-round improvement
    count doubles as the stop signal — ``check_every > 1`` probes it
    only every k rounds (rounds past the fixpoint are identity, so
    correctness is unchanged; k-1 scheduler round-trips saved, the
    same trade as betweenness ``early_stop=False``).  Raises if
    ``max_rounds`` is exhausted before the fixpoint (negative-weight
    cycles are out of scope: weights must be non-negative).

    Returns ``(vertex, dist)`` for every vertex reachable from
    ``source``.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        w.alias("w"),
    ).localCheckpoint(eager=True)
    spark = e.sparkSession
    dist = spark.createDataFrame([(int(source), 0)], "vertex long, dist long")
    for r in range(max_rounds):
        cand = (
            dist.join(e, dist["vertex"] == e["u"])
            .select(e["v"].alias("vertex"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("vertex")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "vertex", "full_outer")
            .select(
                "vertex",
                F.least("dist", "nd").alias("dist"),  # least skips NULLs
                (
                    F.col("dist").isNull()
                    | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
                ).alias("improved"),
            )
            .localCheckpoint(eager=True)
        )
        dist = merged.select("vertex", "dist")
        if (r + 1) % check_every == 0:
            if merged.filter("improved").limit(1).count() == 0:
                return dist
    raise RuntimeError(f"sssp did not converge in {max_rounds} rounds")


def temporal_reachability(
    contacts: DataFrame,
    source: int,
    start_t: int = 0,
    max_hops: int | None = 8,
    src: str = "src",
    dst: str = "dst",
    t_col: str = "t",
    max_rounds: int = 256,
    check_every: int = 1,
) -> DataFrame:
    """Earliest-arrival times over a temporal contact table
    ``(src, dst, t)`` — the time-respecting reachability of temporal
    graphs: a contact is usable only if its time is >= the current
    arrival at its source (instantaneous relay allowed), so
    information can never ride a contact that happened before it got
    there.  Synchronous relaxation, the sssp shape with ``min(t)``
    replacing ``min(dist + w)``:

        arr_{r+1}(v) = min(arr_r(v),
                           min over contacts (u, v, t), t >= arr_r(u): t)

    Integer times (epoch micros) keep every arrival an exact long.

    ``max_hops=H`` bounds the horizon to H hops (one relaxation round
    per hop, no convergence probe) — the scale framing for long
    temporal chains, where the exact fixpoint needs as many rounds as
    the longest time-respecting path (same trade as betweenness'
    ``max_depth``).  ``max_hops=None`` runs to the fixpoint with a
    per-``check_every`` improvement probe and raises on ``max_rounds``
    exhaustion.

    Returns ``(vertex, arrival)`` for every vertex reachable under
    the horizon; the source row carries ``start_t``.
    """
    c = contacts.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        F.col(t_col).cast("long").alias("t"),
    ).localCheckpoint(eager=True)
    spark = c.sparkSession
    arr = spark.createDataFrame(
        [(int(source), int(start_t))], "vertex long, arrival long"
    )
    rounds = max_hops if max_hops is not None else max_rounds
    if rounds < 1:
        raise ValueError("temporal_reachability: horizon must be >= 1")
    for r in range(rounds):
        cand = (
            arr.join(c, (arr["vertex"] == c["u"]) & (c["t"] >= arr["arrival"]))
            .select(c["v"].alias("vertex"), c["t"].alias("nt"))
            .groupBy("vertex")
            .agg(F.min("nt").alias("nt"))
        )
        merged = (
            arr.join(cand, "vertex", "full_outer")
            .select(
                "vertex",
                F.least("arrival", "nt").alias("arrival"),
                (
                    F.col("arrival").isNull()
                    | (F.col("nt").isNotNull() & (F.col("nt") < F.col("arrival")))
                ).alias("improved"),
            )
            .localCheckpoint(eager=True)
        )
        arr = merged.select("vertex", "arrival")
        if max_hops is None and (r + 1) % check_every == 0:
            if merged.filter("improved").limit(1).count() == 0:
                return arr
    if max_hops is None:
        raise RuntimeError(
            f"temporal_reachability did not converge in {max_rounds} rounds"
        )
    return arr
