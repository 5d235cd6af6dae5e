"""Approximate betweenness centrality: pivot-sampled, depth-bounded
Brandes (Brandes 2001; pivot sampling per Brandes & Pich 2007).

Exact betweenness is O(|V|·|E|) — infeasible at web scale. The
standard approximation runs Brandes' two-phase algorithm from a small
deterministic pivot set (here: the ``n_pivots`` highest-degree
vertices, ties on vertex id — hubs cover the most shortest paths) and
bounds the BFS at ``max_depth`` levels (web graphs have tiny
effective diameter, so a small bound captures almost all dependency
mass; both the engine and the oracle use the same bound, so results
are exactly comparable).

Execution shape (100-TB story):
- state is one (pivot, vertex, dist, sigma) table — O(n_pivots·|V|)
  rows, never O(|V|²);
- each forward round is frontier ⋈ edges (keyed on the vertex id)
  then a (pivot, vertex) groupBy for path counts, with a left-anti
  join against the visited set — all hash-partitioned equi-joins;
- the backward (dependency) sweep walks levels deepest-first; each
  level is one keyed join to the next level's state. 2·max_depth
  rounds total, every round's result ``localCheckpoint``-ed so plan
  depth stays O(1) per round;
- no collect on the hot path: the only driver-side values are the
  per-round frontier counts (one scalar each, also the empty-frontier
  stop signal).

All tie-breaks are deterministic: pivot selection (degree DESC, id
ASC) and the final ranking (round(bc, 6) DESC, vertex ASC), so Spark
and the DuckDB chained-CTE oracle select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccl_spark.graphstats import _symmetrized


def _pivot_bfs(
    und: DataFrame, n_pivots: int, max_depth: int, early_stop: bool
) -> list[DataFrame]:
    """Level-synchronous BFS with shortest-path counting from the
    n_pivots highest-degree vertices of the symmetrized edge table
    ``und(s, d)``. Returns one (p, v, dist, sigma) frame per level
    (level 0 = the pivots themselves), each localCheckpoint-ed."""
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    pivots = (
        deg.orderBy(F.desc("dg"), F.asc("s"))
        .limit(n_pivots)
        .select(F.col("s").alias("p"))
    )
    level0 = pivots.select(
        "p", F.col("p").alias("v"), F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [level0]
    visited = level0.select("p", "v")
    frontier = level0
    for r in range(1, max_depth + 1):
        cand = frontier.join(und, frontier["v"] == und["s"]).select(
            "p", F.col("d").alias("v"), "sigma"
        )
        newf = (
            cand.join(visited, ["p", "v"], "left_anti")
            .groupBy("p", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("dist", F.lit(r))
            .select("p", "v", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if early_stop and newf.limit(1).count() == 0:
            break
        levels.append(newf)
        visited = visited.unionByName(newf.select("p", "v"))
        frontier = newf
    return levels


def harmonic_centrality(
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 8,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
    early_stop: bool = True,
) -> DataFrame:
    """Top-k vertices by pivot-sampled depth-bounded harmonic
    centrality H(v) = Σ_{pivot p ≠ v} 1/d(p, v) (Boldi & Vigna 2014
    "Axioms for centrality" — the closeness variant that handles
    disconnected graphs). Same pivot rule, BFS and determinism as
    :func:`betweenness_approx`; the forward phase alone suffices, so
    the cost is half a betweenness run."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    levels = _pivot_bfs(und, n_pivots, max_depth, early_stop)
    if len(levels) < 2:  # no edges at all
        return und.sparkSession.createDataFrame([], "vertex long, hc double")
    reached = levels[1]
    for lv in levels[2:]:
        reached = reached.unionByName(lv)
    return (
        reached.groupBy(F.col("v").alias("vertex"))
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("hc"))
        .orderBy(F.desc("hc"), F.asc("vertex"))
        .limit(k)
    )


def closeness_centrality(
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 8,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
    early_stop: bool = True,
) -> DataFrame:
    """Top-k vertices by pivot-sampled depth-bounded closeness
    C(v) = r(v) / Σ_{reaching pivots p} d(p, v), where r(v) is the
    number of pivots that reach v — the disconnection-safe
    generalization (Lin/Boldi-Vigna family: score 0-extends to
    vertices no pivot reaches, and a vertex reached by more pivots is
    not penalized for the extra distance terms). Shares the forward
    BFS with :func:`harmonic_centrality`; same determinism contract
    (round 6dp, (score DESC, vertex ASC) tie-break)."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    levels = _pivot_bfs(und, n_pivots, max_depth, early_stop)
    if len(levels) < 2:  # no edges at all
        return und.sparkSession.createDataFrame([], "vertex long, closeness double")
    reached = levels[1]
    for lv in levels[2:]:
        reached = reached.unionByName(lv)
    return (
        reached.groupBy(F.col("v").alias("vertex"))
        .agg(
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum(F.col("dist")), 6
            ).alias("closeness")
        )
        .orderBy(F.desc("closeness"), F.asc("vertex"))
        .limit(k)
    )


def landmark_distances(
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
    early_stop: bool = True,
) -> DataFrame:
    """``(p, v, dist)`` — exact BFS distance from each of the
    n_pivots highest-degree landmarks to every vertex within
    ``max_depth`` (the forward phase of the shared pivot BFS).  This
    is the classic landmark/distance-oracle precomputation (Potamias
    et al. 2009): store O(n_pivots·|V|) rows once, then serve
    d(u,v) ≲ min_p d(p,u)+d(p,v) with two index lookups — no graph
    traversal at query time."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    levels = _pivot_bfs(und, n_pivots, max_depth, early_stop)
    out = levels[0].select("p", "v", "dist")
    for lv in levels[1:]:
        out = out.unionByName(lv.select("p", "v", "dist"))
    return out


def pivot_eccentricity(
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
    early_stop: bool = True,
) -> DataFrame:
    """``(p long, ecc long)`` — per-pivot eccentricity (the largest
    BFS distance any vertex sits from pivot ``p``, bounded at
    ``max_depth``).  max(ecc) over the pivots is the classic
    lower bound on the graph diameter (Magnien, Latapy & Habib 2009);
    pivots are the same deterministic hub set as the other
    pivot-sampled centralities, so the forward BFS (and its oracle
    CTE chain) is shared."""
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    levels = _pivot_bfs(und, n_pivots, max_depth, early_stop)
    out = levels[0].select("p", "dist")
    for lv in levels[1:]:
        out = out.unionByName(lv.select("p", "dist"))
    return out.groupBy(F.col("p").cast("long").alias("p")).agg(
        F.max("dist").cast("long").alias("ecc")
    )


def landmark_pair_estimates(
    landmarks: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Upper-bound distance estimates for ``pairs(u, v)`` from a
    :func:`landmark_distances` table: ``est = min_p d(p,u)+d(p,v)``
    (exact when a shortest path passes a landmark; NULL-free — pairs
    not covered by any common landmark are omitted).  Two hash
    equi-joins against the landmark table + one per-pair min."""
    lu = landmarks.select(F.col("p"), F.col("v").alias("u"), F.col("dist").alias("du"))
    lv = landmarks.select(F.col("p"), F.col("v").alias("v"), F.col("dist").alias("dv"))
    return (
        pairs.join(lu, "u")
        .join(lv, ["p", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("est"))
    )


def betweenness_approx(
    edges: DataFrame,
    n_pivots: int = 8,
    max_depth: int = 8,
    k: int = 20,
    src: str = "src",
    dst: str = "dst",
    early_stop: bool = True,
) -> DataFrame:
    """Top-k vertices by pivot-sampled depth-bounded betweenness.

    Returns ``(vertex, bc)`` with bc rounded to 6dp, ordered by
    (bc DESC, vertex ASC), pivot endpoints excluded per Brandes.

    ``early_stop=False`` skips the per-round empty-frontier probe (one
    scalar job per level): correct either way — an emptied frontier
    just flows empty frames through the remaining rounds — so callers
    that know the graph spans the depth bound (web graphs at depth ≤
    8) save max_depth scheduler round-trips.
    """
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    levels = _pivot_bfs(und, n_pivots, max_depth, early_stop)

    # ---- backward phase: dependency accumulation, deepest level first ----
    # delta(v) = sum over BFS-DAG successors w (at dist+1):
    #            sigma(v)/sigma(w) * (1 + delta(w))
    deepest = len(levels) - 1
    delta_states: list[DataFrame] = [None] * (deepest + 1)
    delta_states[deepest] = levels[deepest].select(
        "p", "v", "sigma", F.lit(0.0).alias("delta")
    )
    for lv in range(deepest - 1, 0, -1):
        cur = levels[lv]
        nxt = delta_states[lv + 1].select(
            "p",
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            cur.join(und, cur["v"] == und["s"])
            .select("p", "v", "sigma", F.col("d").alias("w"))
            .join(nxt, ["p", "w"])
            .groupBy("p", "v")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                ).alias("cd")
            )
        )
        delta_states[lv] = (
            cur.select("p", "v", "sigma")
            .join(contrib, ["p", "v"], "left")
            .select("p", "v", "sigma", F.coalesce("cd", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )

    inner = [d for d in delta_states[1:] if d is not None]
    if not inner:  # no edges at all
        return und.sparkSession.createDataFrame([], "vertex long, bc double")
    all_delta = inner[0]
    for d in inner[1:]:
        all_delta = all_delta.unionByName(d)
    return (
        all_delta.groupBy(F.col("v").alias("vertex"))
        .agg(F.round(F.sum("delta"), 6).alias("bc"))
        .orderBy(F.desc("bc"), F.asc("vertex"))
        .limit(k)
    )
