"""Extra benchmarks for the r06 optimization round (bench.py is FROZEN
for driver measurement; this file hosts the guide-§1.4 noop-sink probes
and per-operator experiments whose numbers OPTIMIZATION_r06.md cites).

Usage:
    python bench_extra.py [probe ...]        # default: all probes
    BENCH_REPS=3 python bench_extra.py pagerank lpa

Environment: same contract as bench.py (SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, BENCH_V, BENCH_REPS).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from ccl_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    v = int(os.environ.get("BENCH_V", str(max(int(sf * 1_000_000), 1000))))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(int(os.environ.get("BENCH_REPS", "3")), 1)
    only = set(sys.argv[1:])
    spark = get_spark("ccl_spark_bench_extra", master=f"local[{cpus}]")
    timings: dict[str, float] = {}

    def settle():
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.5)

    def timed(name, fn, group=None):
        if only and (group or name.split(":")[0]) not in only:
            return None
        best, out = None, None
        for _ in range(reps):
            settle()
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)
        return out

    from ccl_spark.datagen import generate_pages
    from ccl_spark.edges import page_edges

    pages = generate_pages(spark, v, seed=42)

    # --- datagen_extract decomposition --------------------------------
    timed("datagen:pages_noop", lambda: noop(pages), group="datagen")
    timed("datagen:edges_count", lambda: page_edges(pages).count(), group="datagen")

    edges = page_edges(pages).localCheckpoint(eager=True)
    edges.count()

    # --- graph ops (same calls as bench.py) ---------------------------
    from ccl_spark.betweenness import betweenness_approx
    from ccl_spark.cc import connected_components
    from ccl_spark.lpa import label_propagation
    from ccl_spark.pagerank import pagerank
    from ccl_spark.triangles import triangle_count

    timed(
        "cc",
        lambda: connected_components(edges).select("component").distinct().count(),
    )
    timed("pagerank", lambda: pagerank(edges, tol=1e-6, iters_per_check=4).count())
    timed("lpa", lambda: label_propagation(edges, max_iter=5).count())
    timed("triangles", lambda: triangle_count(edges))
    timed(
        "betweenness",
        lambda: betweenness_approx(
            edges, n_pivots=4, max_depth=4, k=20, early_stop=False
        ).count(),
    )

    # --- text/dedup ops ------------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ccl_spark.dedup import chunk_dedup_corpus, near_duplicates, simhash
    from ccl_spark.textops import bpe_encode_docs, bpe_merges

    if not only or "tokens_ids" in only:
        merges = [
            (r.lhs, r.rhs)
            for r in bpe_merges(docs, n_merges=8).orderBy("merge_rank").collect()
        ]
        timed("tokens_ids", lambda: bpe_encode_docs(docs, merges).count())
    timed(
        "near_dup_minhash",
        lambda: near_duplicates(
            docs, n=3, n_hashes=32, bands=16, threshold=0.8, log_dropped=False
        ).count(),
    )
    timed("simhash", lambda: simhash(docs).agg(F.bit_xor("simhash")).first())
    timed(
        "chunk_dedup",
        lambda: chunk_dedup_corpus(docs, n=4, boundary_mod=8).count(),
    )

    print(json.dumps({"probes": timings, "sf": sf, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
