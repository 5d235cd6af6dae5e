"""Deterministic random-walk corpus generation (DeepWalk / node2vec
p=q=1 style; Perozzi et al. 2014).

The walk corpus — ``n_walks`` truncated walks of ``walk_len`` steps
from every vertex — is the standard input for skip-gram graph
embeddings.  Walks here are *deterministically pseudo-random*: the
step-t choice at a walk is ``H(start, rep, t, seed) mod deg(cur)``
with H = the first 15 hex digits of md5, a hash both Spark
(``conv(substring(md5(..)..)``) and ANSI-SQL engines (hex cast)
compute identically, so the full corpus is reproducible bit-for-bit
across engines, partitionings and retries — the property that makes
the operator testable and its output cacheable.

Execution shape (100-TB story):
- the adjacency is ranked once — ``(s, d, rank)`` via a per-vertex
  row_number window (partition key = the vertex, so a partition never
  exceeds one vertex's degree) plus a degree table;
- each step is two hash equi-joins keyed on the walk's current vertex
  (state ⋈ degree to draw the index, then ⋈ adjacency on
  (vertex, rank) to move) — state stays O(|V|·n_walks) rows with one
  growing string column, never materializing anything per-edge;
- walks run on the symmetrized graph, where every reachable vertex
  has degree ≥ 1, so walks never strand (no ragged-length handling);
- each step's state is ``localCheckpoint``-ed so plan depth stays
  O(1) per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ccl_spark.graphstats import _symmetrized


def _choice_expr(step: int, seed: int) -> F.Column:
    """Deterministic per-(walk, step) draw in [0, 2^60): md5 of the
    walk identity, first 15 hex digits as an integer — identical in
    Spark and DuckDB."""
    key = (
        "concat(cast(v0 as string), ',', cast(rep as string), "
        f"',', '{step}', ',', '{seed}')"
    )
    return F.expr(f"cast(conv(substring(md5({key}), 1, 15), 16, 10) as bigint)")


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    n_walks: int = 1,
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``n_walks`` deterministic uniform random walks of ``walk_len``
    steps from every vertex of the symmetrized graph.

    Returns ``(start, rep, walk)`` where ``walk`` is the
    space-joined vertex sequence (walk_len + 1 ids) — the text-line
    shape a skip-gram trainer consumes directly.
    """
    und = _symmetrized(edges, src, dst).localCheckpoint(eager=True)
    w = Window.partitionBy("s").orderBy("d")
    adj = und.select(
        "s", "d", (F.row_number().over(w) - 1).alias("rank")
    ).localCheckpoint(eager=True)
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    state = (
        deg.select("s")
        .select(
            F.col("s").alias("v0"),
            F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("rep"),
        )
        .select(
            "v0",
            "rep",
            F.col("v0").alias("cur"),
            F.col("v0").cast("string").alias("walk"),
        )
    )
    for step in range(walk_len):
        drawn = (
            state.join(deg, state["cur"] == deg["s"])
            .withColumn("idx", _choice_expr(step, seed) % F.col("dg"))
            .select("v0", "rep", "cur", "walk", "idx")
        )
        state = (
            drawn.join(
                adj,
                (drawn["cur"] == adj["s"]) & (drawn["idx"] == adj["rank"]),
            )
            .select(
                "v0",
                "rep",
                F.col("d").alias("cur"),
                F.concat_ws(" ", "walk", F.col("d").cast("string")).alias("walk"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        F.col("v0").alias("start"), F.col("rep").cast("long").alias("rep"), "walk"
    )
