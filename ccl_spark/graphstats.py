"""Whole-graph statistics and neighborhood-overlap link prediction.

Reciprocity, degree assortativity, and Adamic-Adar scores are the
standard first-order characterization of a crawled web/link graph
(reciprocity and assortativity summarize its directedness and hub
mixing; Adamic-Adar is the classic common-neighbor link-prediction
baseline).  The reference corpus motivates these through its
component/connectivity benchmarks (ccl_marker_stack.py:1, tests/ccl
grids); here they are expressed as single declarative Spark plans:

- ``reciprocity``: one self-equi-join on the (hashed) reversed edge
  key + one aggregate — a single shuffle, no per-vertex state.
- ``assortativity``: degree table joined back to the symmetrized edge
  list, then ``corr`` — two hash joins on the vertex key, all
  JVM-side, and correlation is computed map-side-partial by Catalyst.
- ``adamic_adar``: wedge generation through the shared-neighbor key
  with an explicit ``max_degree`` cap.  Uncapped, a degree-d hub
  emits d^2 candidate pairs, which is quadratic on power-law graphs;
  capping drops only near-zero-weight evidence (a hub contributes
  1/ln(d) per pair) and bounds the blowup at cap^2 per vertex —
  the standard scale story for neighborhood-overlap scoring at
  100 TB.  Existing edges are removed with a left-anti equi-join.

Ranking ties are broken on ``(round(score, 6) DESC, u, v)`` so the
selected top-k set is reproducible bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _directed(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _symmetrized(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = _directed(edges, src, dst)
    return e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Fraction of distinct directed edges whose reverse edge exists.

    Returns a one-row DataFrame ``(reciprocity: double)``; computed in
    a single job (left join against the reversed edge set, then one
    aggregate).
    """
    e = _directed(edges, src, dst)
    rev = e.select(
        F.col("d").alias("s"), F.col("s").alias("d"), F.lit(1).alias("has_rev")
    )
    return e.join(rev, ["s", "d"], "left").agg(
        F.round(
            F.sum(F.coalesce(F.col("has_rev"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("reciprocity")
    )


def assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity of the symmetrized graph: Pearson
    correlation of endpoint degrees over all (both-orientation) edges.

    Returns a one-row DataFrame ``(assortativity: double)``.
    """
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("v").alias("s"), F.col("deg").alias("deg_s"))
    db = deg.select(F.col("v").alias("d"), F.col("deg").alias("deg_d"))
    return (
        und.join(da, "s")
        .join(db, "d")
        .agg(F.round(F.corr("deg_s", "deg_d"), 6).alias("assortativity"))
    )


def adamic_adar(
    edges: DataFrame,
    k: int = 20,
    max_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Top-k non-adjacent vertex pairs by Adamic-Adar score
    ``sum_{w in N(u) & N(v)} 1 / ln(deg(w))`` on the symmetrized graph.

    Vertices with degree above ``max_degree`` (or below 2, which
    cannot witness a pair) are excluded as witnesses — the cap bounds
    wedge generation at ``max_degree**2`` candidates per witness while
    dropping only the lowest-weight evidence.  Returns
    ``(u, v, score)`` with score rounded to 6dp and the deterministic
    ``(score DESC, u, v)`` tie-break.
    """
    und = _symmetrized(edges, src, dst)
    deg = und.groupBy(F.col("s").alias("w")).agg(F.count(F.lit(1)).alias("deg"))
    nb = (
        und.select(F.col("s").alias("w"), F.col("d").alias("n"))
        .join(deg.filter((F.col("deg") >= 2) & (F.col("deg") <= max_degree)), "w")
        .withColumn("wgt", F.lit(1.0) / F.log(F.col("deg").cast("double")))
    )
    a = nb.select("w", F.col("n").alias("u"), "wgt")
    b = nb.select("w", F.col("n").alias("v"))
    scores = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("wgt").alias("score"))
    )
    existing = und.select(
        F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
    ).distinct()
    return (
        scores.join(existing, ["u", "v"], "left_anti")
        .orderBy(F.round("score", 6).desc(), "u", "v")
        .limit(k)
        .select("u", "v", F.round("score", 6).alias("score"))
    )
