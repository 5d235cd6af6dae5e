"""Winnowing scaling evidence: the MOSS fingerprint build + shared-
fingerprint pair join measured at two local-cluster sizes (1x4 vs 4x4
executor JVMs), same methodology as bench_scaling.py (shared parquet
input — reuses bench_scaling_dedup's generated docs — fresh JVM per
level, min of reps).  The per-stage shapes under test are the gram
explode + bounded window expansion + (doc, window) argmin (a window
sort no other scaled dedup stage exercises) and the capped
inverted-index pair join.

The corpus is a deterministic 1/``mod`` subset of the scaling docs
(md5-free: doc_id % mod == 0) so the run fits the same wall budget as
the other scaling rows.

Usage: python tools/bench_scaling_winnow.py [V] [reps] [mod]
(docs must already exist at /tmp/ccl_spark_scaling_docs_{V} — run
bench_scaling.py then bench_scaling_dedup.py once for this V first)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ccl_spark.session import get_spark
from ccl_spark.textops import winnow_fingerprints, winnow_pairs

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
mod = int(sys.argv[4])
spark = get_spark("winnow_scaling", master=f"local-cluster[{{execs}},4,10240]")
docs = (spark.read.parquet(path)
        .filter(F.pmod(F.col("doc_id"), F.lit(mod)) == 0)
        .localCheckpoint(eager=True))
n_docs = docs.count()

def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

t_fp, t_pr, n_fps, n_pairs = [], [], 0, 0
for _ in range(reps):
    t0 = time.monotonic()
    n_fps = winnow_fingerprints(docs).count()
    t_fp.append(time.monotonic() - t0)
    t0 = time.monotonic()
    n_pairs = winnow_pairs(docs, min_shared=2, max_df=50).count()
    t_pr.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": execs * 4, "docs": n_docs, "fps": n_fps,
                   "pairs": n_pairs, "t_fp": min(t_fp), "t_pr": min(t_pr),
                   "t_fp_all": t_fp, "t_pr_all": t_pr}}))
spark.stop()
"""


def _run(script: str, args: list[str]) -> str:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        SPARK_EXECUTOR_MEMORY=os.environ.get("SPARK_EXECUTOR_MEMORY", "9g"),
        SPARK_GRAFT_LOCAL_DIR=os.environ.get(
            "SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-shuffle"
        ),
    )
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"winnow scaling subprocess failed: {args}")
    return out.stdout


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dpath = f"/tmp/ccl_spark_scaling_docs_{v}"
    if not Path(dpath, "_SUCCESS").exists():
        raise SystemExit(f"run bench_scaling_dedup.py {v} first to generate {dpath}")
    results = {}
    for execs in (1, 4):
        line = [
            l
            for l in _run(
                JOB.format(repo=str(REPO)), [str(execs), dpath, str(reps), str(mod)]
            ).splitlines()
            if l.startswith("{")
        ][-1]
        results[execs] = json.loads(line)
    lo, hi = results[1], results[4]
    eff_fp = (lo["t_fp"] / hi["t_fp"]) / 4
    eff_pr = (lo["t_pr"] / hi["t_pr"]) / 4
    summary = {
        "docs": hi["docs"], "fps": hi["fps"], "pairs": hi["pairs"], "reps": reps,
        "t4_fps": round(lo["t_fp"], 2), "t16_fps": round(hi["t_fp"], 2),
        "t4_pairs": round(lo["t_pr"], 2), "t16_pairs": round(hi["t_pr"], 2),
        "eff_fps": round(eff_fp, 3), "eff_pairs": round(eff_pr, 3),
        "docs_per_sec_fps_16": round(hi["docs"] / hi["t_fp"], 1),
        "raw": results,
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as f:
        f.write(
            f"\n## Winnowing scaling {stamp} "
            f"(docs={hi['docs']}, fingerprints={hi['fps']}, pairs={hi['pairs']}, "
            f"min of {reps}, fresh local-cluster JVM per level)\n\n"
            "| stage | 1x4 (N=4) | 4x4 (4N=16) | efficiency (tN/t4N)/4 |\n"
            "|---|---|---|---|\n"
            f"| winnow_fingerprints (s) | {summary['t4_fps']} | {summary['t16_fps']} | {summary['eff_fps']} |\n"
            f"| winnow_pairs (s) | {summary['t4_pairs']} | {summary['t16_pairs']} | {summary['eff_pairs']} |\n"
        )


if __name__ == "__main__":
    main()
