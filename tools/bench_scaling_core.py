"""Coreness-decomposition scaling evidence: the iterative-h-index
core_numbers operator measured at two local-cluster sizes (1x4 vs 4x4
executor JVMs), same methodology as bench_scaling.py (shared parquet
edge input — reuses bench_scaling's generated corpus edges — fresh JVM
per level, min of reps).  The per-round shape under test is edge join
+ per-vertex window row_number + aggregate: the window sort is the
piece no other scaled operator exercises.

Usage: python tools/bench_scaling_core.py [V] [reps]
(edges must already exist at /tmp/ccl_spark_scaling_edges_{V}, i.e.
run bench_scaling.py once for this V first)
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
from ccl_spark.session import get_spark
from ccl_spark.kcore import core_numbers

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("core_scaling", master=f"local-cluster[{{execs}},4,10240]")
edges = spark.read.parquet(path).localCheckpoint(eager=True)
n_edges = edges.count()

def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

t_core, n_verts, max_core = [], 0, 0
for _ in range(reps):
    t0 = time.monotonic()
    out = core_numbers(edges)
    row = out.selectExpr("count(*) AS n", "max(core) AS m").first()
    n_verts, max_core = row["n"], row["m"]
    t_core.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": execs * 4, "edges": n_edges, "verts": n_verts,
                   "max_core": max_core, "t_core": min(t_core),
                   "t_core_all": t_core}}))
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
        raise SystemExit(f"core scaling subprocess failed: {args}")
    return out.stdout


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    epath = f"/tmp/ccl_spark_scaling_edges_{v}"
    if not Path(epath, "_SUCCESS").exists():
        raise SystemExit(f"run bench_scaling.py {v} first to generate {epath}")
    results = {}
    for execs in (1, 4):
        line = [
            l for l in _run(JOB.format(repo=str(REPO)), [str(execs), epath, str(reps)]).splitlines()
            if l.startswith("{")
        ][-1]
        results[execs] = json.loads(line)
    lo, hi = results[1], results[4]
    eff = (lo["t_core"] / hi["t_core"]) / 4
    summary = {
        "edges": hi["edges"], "verts": hi["verts"], "max_core": hi["max_core"],
        "reps": reps,
        "t_core_1x4": round(lo["t_core"], 2), "t_core_4x4": round(hi["t_core"], 2),
        "scaling_efficiency_core": round(eff, 3),
        "raw": results,
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as f:
        f.write(
            f"\n## Coreness scaling {stamp} (edges={hi['edges']}, verts={hi['verts']}, "
            f"max core {hi['max_core']}, min of {reps}, local-cluster executors)\n\n"
            "| stage | 1x4 (N=4) | 4x4 (4N=16) | efficiency (tN/t4N)/4 |\n|---|---|---|---|\n"
            f"| core_numbers h-index fixpoint (s) | {summary['t_core_1x4']} | "
            f"{summary['t_core_4x4']} | {summary['scaling_efficiency_core']} |\n"
        )


if __name__ == "__main__":
    main()
