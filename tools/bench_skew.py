"""Skewed-hub stress bench (round-2 verdict ask #4).

The synthetic corpus graph is mild (max in-degree ~tens); nothing
load-verified the skew story. This bench builds two graphs with the
SAME edge count at sf0.1 scale:

- uniform: xxhash64-random src/dst over V vertices
- skewed:  same random edges, but ~hub_frac of them redirected to ONE
           hub vertex (a 10^5-in-degree hub at the default setting —
           the "every page links to the homepage" shape)

and measures connected components + PageRank wall time on both, plus
the skewed run with AQE skew-join handling disabled as the ablation.
Acceptance: skewed within ~1.5x of uniform with the default session
(AQE skew-join on, map-side partial aggregation, salted edge table).

Prints one JSON line; a summary table lives in BENCH/BASELINE.md.

Usage: python tools/bench_skew.py [V] [E] [hub_in_degree]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ccl_spark.cc import connected_components  # noqa: E402
from ccl_spark.pagerank import pagerank  # noqa: E402
from ccl_spark.session import get_spark  # noqa: E402

V = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
E = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
HUB = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
REPS = 2


def random_edges(spark, n_edges: int, n_vertices: int, seed: int):
    """JVM-side seeded edge generator (xxhash64 of the range index)."""
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_vertices)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_vertices)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def skew_edges(spark, n_edges: int, n_vertices: int, hub_links: int, seed: int):
    """Same generator, but the first ``hub_links`` rows point at vertex
    0 — one hub with ~hub_links in-degree (after distinct dedup the
    in-degree is the number of DISTINCT sources, ~hub_links here)."""
    base = spark.range(n_edges).select(
        "id",
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_vertices)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_vertices)).alias("dst"),
    )
    return base.select(
        "src",
        F.when(F.col("id") < hub_links, F.lit(0)).otherwise(F.col("dst")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def run_pair(spark, edges):
    edges = edges.localCheckpoint(eager=True)
    n = edges.count()
    out = {"edges": n}
    for name, fn in [
        # threshold=0 forces pure-distributed CC: at this edge count the
        # default hybrid would local-finish immediately and the skew
        # stress would never touch the distributed star rounds
        (
            "cc",
            lambda: connected_components(edges, local_finish_threshold=0)
            .select("component")
            .distinct()
            .count(),
        ),
        ("pagerank", lambda: pagerank(edges, tol=1e-6).count()),
    ]:
        best = None
        for _ in range(REPS):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    edges.unpersist()
    return out


def main() -> None:
    spark = get_spark("bench_skew")
    uniform = run_pair(spark, random_edges(spark, E, V, seed=11))
    skewed = run_pair(spark, skew_edges(spark, E, V, HUB, seed=11))
    deg = (
        skew_edges(spark, E, V, HUB, seed=11)
        .groupBy("dst").count().agg(F.max("count")).first()[0]
    )
    spark.stop()

    # ablation: identical skewed input, AQE (and its skew-join
    # splitting) off — what a non-adaptive engine would pay
    spark = get_spark(
        "bench_skew_noaqe",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.adaptive.skewJoin.enabled": "false",
        },
    )
    skew_noaqe = run_pair(spark, skew_edges(spark, E, V, HUB, seed=11))
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "skewed_hub_stress",
                "v": V,
                "e_target": E,
                "hub_in_degree": int(deg),
                "uniform": uniform,
                "skewed": skewed,
                "skewed_no_aqe": skew_noaqe,
                "ratio_cc": round(skewed["cc"] / uniform["cc"], 3),
                "ratio_pagerank": round(skewed["pagerank"] / uniform["pagerank"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
