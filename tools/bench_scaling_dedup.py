"""Dedup-pipeline scaling evidence (round-4 verdict #5): the
LLM-pipeline flagship — MinHash-LSH near-dup pairs folded into
transitive dup clusters — measured at two local-cluster sizes (1x4 vs
4x4 executor JVMs), same methodology as bench_scaling.py (shared
parquet input, fresh JVM per level, min of reps).

Corpus: the scaling pages' extracted text (~V docs) plus a 1% injected
duplicate tail (same text, shifted doc_id) so the cluster stage has
real merge work. Appends the table to BENCH/BASELINE.md.

Usage: python tools/bench_scaling_dedup.py [V] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

GEN = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ccl_spark.session import get_spark
from ccl_spark.extract import extract_text
pages_path = sys.argv[1]; out = sys.argv[2]
spark = get_spark("dedup_gen", master="local[32]")
pages = spark.read.parquet(pages_path)
docs = extract_text(pages).select(
    F.xxhash64("url").alias("doc_id"), "text"
)
# NEAR duplicates, not exact copies: exact dups collapse in
# near_duplicates' pre-collapse stage and never reach the pair/cluster
# path — append a short suffix so Jaccard stays high but texts differ
dups = docs.filter(F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100)) == 0)
dups = dups.select(
    (F.col("doc_id") + F.lit(1)).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" trailing near dup marker")).alias("text"),
)
docs.unionByName(dups).write.mode("overwrite").parquet(out)
print("GENERATED")
spark.stop()
"""

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ccl_spark.session import get_spark
from ccl_spark.dedup import near_duplicates, dup_clusters

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("dedup_scaling", master=f"local-cluster[{{execs}},4,10240]")
docs = spark.read.parquet(path).localCheckpoint(eager=True)
n_docs = docs.count()
def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
t_nd, t_cl, n_pairs, n_clusters = [], [], 0, 0
for _ in range(reps):
    t0 = time.monotonic()
    pairs = near_duplicates(docs, threshold=0.7).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_nd.append(time.monotonic() - t0)
    t0 = time.monotonic()
    n_clusters = dup_clusters(pairs).select("cluster_id").distinct().count()
    t_cl.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": execs * 4, "docs": n_docs, "pairs": n_pairs,
                   "clusters": n_clusters, "t_nd": min(t_nd), "t_cl": min(t_cl),
                   "t_nd_all": t_nd, "t_cl_all": t_cl}}))
spark.stop()
"""


def _run(script: str, args: list[str]) -> str:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        SPARK_EXECUTOR_MEMORY=os.environ.get("SPARK_EXECUTOR_MEMORY", "9g"),
        SPARK_GRAFT_LOCAL_DIR=os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-shuffle"),
    )
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"subprocess failed: {args}")
    return out.stdout


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pages_path = f"/tmp/ccl_spark_scaling_edges_{v}_pages"
    if not Path(pages_path, "_SUCCESS").exists():
        raise SystemExit(f"run bench_scaling.py first to generate {pages_path}")
    dpath = f"/tmp/ccl_spark_scaling_docs_{v}"
    if not Path(dpath, "_SUCCESS").exists():
        _run(GEN.format(repo=str(REPO)), [pages_path, dpath])

    results = {}
    for execs in (1, 4):
        out = _run(JOB.format(repo=str(REPO)), [str(execs), dpath, str(reps)])
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results[execs] = json.loads(line)
    lo, hi = results[1], results[4]
    eff_nd = (lo["t_nd"] / hi["t_nd"]) / 4
    eff_cl = (lo["t_cl"] / hi["t_cl"]) / 4
    summary = {
        "docs": hi["docs"], "pairs": hi["pairs"], "clusters": hi["clusters"],
        "reps": reps,
        "t4_near_dup": round(lo["t_nd"], 2), "t16_near_dup": round(hi["t_nd"], 2),
        "t4_clusters": round(lo["t_cl"], 2), "t16_clusters": round(hi["t_cl"], 2),
        "eff_near_dup": round(eff_nd, 3), "eff_clusters": round(eff_cl, 3),
        "docs_per_sec_near_dup_16": round(hi["docs"] / hi["t_nd"], 1),
        "raw": results,
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as f:
        f.write(
            f"\n## Dedup-pipeline scaling {stamp} "
            f"(docs={hi['docs']}, pairs={hi['pairs']}, clusters={hi['clusters']}, "
            f"min of {reps}, fresh local-cluster JVM per level)\n\n"
            "| stage | 1x4 (N=4) | 4x4 (4N=16) | efficiency (tN/t4N)/4 |\n"
            "|---|---|---|---|\n"
            f"| near_dup_minhash (s) | {summary['t4_near_dup']} | {summary['t16_near_dup']} | {summary['eff_near_dup']} |\n"
            f"| dup_clusters (s) | {summary['t4_clusters']} | {summary['t16_clusters']} | {summary['eff_clusters']} |\n\n"
        )


if __name__ == "__main__":
    main()
