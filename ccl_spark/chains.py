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
