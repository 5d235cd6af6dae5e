"""Minimum spanning forest — distributed Borůvka (1926; the textbook
parallel MST, e.g. JáJá 1992 §5).

Each round every component selects its minimum-weight outgoing edge
(total order (w, u, v) — distinct priorities make THE minimum spanning
forest unique, so the result is one specific edge set, reproducible
across partitionings, engines, and against a sequential Kruskal
oracle).  Selected edges join the forest; touching components merge
(the pick graph's 2-cycles and trees contract to their minimum
component label via the library's own connected_components — MSF
composes on top of CC).  Components at least halve per round, so
O(log V) rounds.

Per round, all hash equi-joins on vertex/component keys:
- cross edges: two label lookups + one filter (edges inside a
  component stop participating — the candidate set only shrinks);
- pick: one component-keyed struct-min aggregate (map-side partials);
- contract: CC on the pick graph — O(#components) edges, tiny next to
  the corpus, and shrinking geometrically.

Web-graph use: MSF is the clustering backbone (single-linkage
clustering IS the MSF), the cheapest connectivity certificate, and
the standard weighted-graph sparsifier before expensive analyses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccl_spark.cc import connected_components


def md5_edge_weights(u: str = "u", v: str = "v", salt: str = "mstw") -> F.Column:
    """Deterministic pseudo-random edge weights — the md5-draw trick:
    a pure function of the canonical endpoint pair, identical in any
    engine with md5."""
    return F.expr(
        f"cast(conv(substring(md5(concat(cast({u} as string), ',',"
        f" cast({v} as string), ',{salt}')), 1, 13), 16, 10) as bigint)"
    )


def boruvka_msf(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Return ``(u long, v long, w long)`` — the unique minimum
    spanning forest of the symmetrized simple graph under the total
    edge order (w, u, v).  ``weight_col`` names an integer weight
    column on ``edges``; if None, deterministic md5 weights are
    derived from the canonical endpoints (see
    :func:`md5_edge_weights`).  Raises if ``max_rounds`` is exhausted
    with mergeable components remaining — never returns a partial
    forest."""
    base = (
        edges.select(
            F.least(F.col(src).cast("long"), F.col(dst).cast("long")).alias("u"),
            F.greatest(F.col(src).cast("long"), F.col(dst).cast("long")).alias("v"),
            *([F.col(weight_col).cast("long").alias("w")] if weight_col else []),
        )
        .filter(F.col("u") != F.col("v"))
    )
    if weight_col is None:
        base = base.withColumn("w", md5_edge_weights())
    else:
        # canonical (u, v) may collapse parallel edges: keep the lightest
        base = base.groupBy("u", "v").agg(F.min("w").alias("w"))
    e = base.dropDuplicates(["u", "v"]).localCheckpoint(eager=True)
    labels = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    forest = spark.createDataFrame([], "u long, v long, w long")
    for _ in range(max_rounds):
        cross = (
            e.join(
                labels.select(
                    F.col("vertex").alias("u"), F.col("component").alias("cu")
                ),
                "u",
            )
            .join(
                labels.select(
                    F.col("vertex").alias("v"), F.col("component").alias("cv")
                ),
                "v",
            )
            .filter(F.col("cu") != F.col("cv"))
        )
        s = F.struct("w", "u", "v").alias("s")
        both = cross.select(F.col("cu").alias("c"), s).unionByName(
            cross.select(F.col("cv").alias("c"), s)
        )
        picks = (
            both.groupBy("c")
            .agg(F.min("s").alias("s"))
            .select(F.col("s.u").alias("u"), F.col("s.v").alias("v"), F.col("s.w").alias("w"))
            .dropDuplicates(["u", "v"])
            .localCheckpoint(eager=False)
        )
        if picks.count() == 0:
            return forest
        forest = forest.unionByName(picks)
        pc = (
            picks.join(
                labels.select(
                    F.col("vertex").alias("u"), F.col("component").alias("cu")
                ),
                "u",
            )
            .join(
                labels.select(
                    F.col("vertex").alias("v"), F.col("component").alias("cv")
                ),
                "v",
            )
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        )
        newmap = connected_components(pc).select(
            F.col("vertex").alias("component"), F.col("component").alias("newc")
        )
        labels = (
            labels.join(newmap, "component", "left")
            .select(
                "vertex", F.coalesce("newc", "component").alias("component")
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"boruvka_msf: components still mergeable after {max_rounds} rounds")


def single_linkage(
    edges: DataFrame,
    threshold: int,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    msf: DataFrame | None = None,
) -> DataFrame:
    """``(vertex long, cluster long)`` — single-linkage clustering at
    ``threshold``: two vertices share a cluster iff a path of edges
    with weight ≤ threshold connects them.  The classic identity
    (Gower & Ross 1969): that partition is exactly the connected
    components of the MSF's sub-threshold edges, so the expensive part
    is computed ONCE (pass a precomputed ``msf`` to cluster the same
    graph at many thresholds — the dendrogram-serving shape).
    Vertices above every threshold edge become singleton clusters
    (cluster = own id, the CC label convention)."""
    if msf is None:
        msf = boruvka_msf(edges, src, dst, weight_col=weight_col)
    keep = msf.filter(F.col("w") <= F.lit(threshold))
    verts = (
        edges.select(F.col(src).cast("long").alias("vertex"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("vertex")))
        .distinct()
    )
    lab = connected_components(keep.select(F.col("u").alias("src"), F.col("v").alias("dst")))
    return verts.join(lab, "vertex", "left").select(
        "vertex", F.coalesce("component", "vertex").alias("cluster")
    )
