"""HITS (Kleinberg hubs & authorities) by power iteration.

Per iteration: authority(v) = sum of hub over in-neighbors, then
L2-normalize; hub(u) = sum of authority over out-neighbors, then
L2-normalize. Same scale shape as pagerank.py: the edge table is
shuffled ONCE (repartition by the join key side used every round) and
each half-step is one equi-join + one groupBy sum (map-side partial,
AQE skew-split for hub vertices); the normalization scalar is a 1-row
aggregate broadcast into the plan — no driver round-trip. State is
|V|-sized and localCheckpoint'ed per iteration.

Fixed-iteration mode (tol=0) replays a deterministic sequence, which
is what the driver-gate's chained-CTE oracle reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    tol: float = 0.0,
) -> DataFrame:
    """Return ``(vertex long, hub double, authority double)``, both
    scores L2-normalized. ``tol > 0`` stops early when the max
    per-vertex change of both scores drops below it."""
    pairs = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    verts = (
        pairs.select(F.col("src").alias("vertex"))
        .unionByName(pairs.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = pairs.repartition("src").localCheckpoint(eager=True)

    def _normalized(scores: DataFrame, col: str) -> DataFrame:
        nrm = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        )
        return scores.crossJoin(F.broadcast(nrm)).select(
            "vertex",
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    # init all-ones; the in-iteration normalization makes the sequence
    # of NORMALIZED scores independent of the initial scaling
    state = verts.select(
        "vertex", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        a_raw = (
            e.join(state.select(F.col("vertex").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _normalized(
            verts.join(a_raw, "vertex", "left").select(
                "vertex", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        h_raw = (
            e.join(auth.select(F.col("vertex").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _normalized(
            verts.join(h_raw, "vertex", "left").select(
                "vertex", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        nxt = (
            _join2(state.select("vertex",
                                F.col("hub").alias("old_hub"),
                                F.col("authority").alias("old_authority")),
                   hub, auth)
            .localCheckpoint(eager=False)
        )
        delta = nxt.agg(
            F.max(
                F.greatest(
                    F.abs(F.col("hub") - F.col("old_hub")),
                    F.abs(F.col("authority") - F.col("old_authority")),
                )
            )
        ).first()[0]
        state = nxt.select("vertex", "hub", "authority")
        if tol > 0 and delta is not None and delta < tol:
            break
    return state


def _join2(base: DataFrame, hub: DataFrame, auth: DataFrame) -> DataFrame:
    keep = [c for c in base.columns if c not in ("vertex", "hub", "authority")]
    return (
        base.join(hub, "vertex").join(auth, "vertex").select("vertex", *keep, "hub", "authority")
    )
