"""A/B: CC convergence signature via df.observe() accumulators vs the
lazy-checkpoint + aggregation job (round-4 verdict ask #4 — the one
untried lever on the CC N->4N scaling item).

Both variants run pure-distributed CC (local_finish_threshold=0) on the
shared 6.8M-edge corpus at BOTH local-cluster sizes (1x4 and 4x4
executor JVMs, same pairing as bench_scaling.py), fresh JVM per level,
min of reps. Appends the table to BENCH/BASELINE.md.

Usage: python tools/bench_cc_observe.py [V] [reps]
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
from ccl_spark.cc import connected_components

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("cc_observe_ab", master=f"local-cluster[{{execs}},4,10240]")
edges = spark.read.parquet(path).localCheckpoint(eager=True)
n_edges = edges.count()
def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
# one untimed warm-up run, then variants INTERLEAVED per rep so
# JIT/shuffle-file warm-up and machine phases cannot bias one side
connected_components(edges, local_finish_threshold=0).select("component").distinct().count()
_settle()
res = {{"observe": {{"all": []}}, "agg": {{"all": []}}}}
for _ in range(reps):
    for observe in (True, False):
        t0 = time.monotonic()
        connected_components(
            edges, local_finish_threshold=0, observe_signature=observe
        ).select("component").distinct().count()
        res["observe" if observe else "agg"]["all"].append(time.monotonic() - t0)
        _settle()
for k in res:
    res[k]["min"] = min(res[k]["all"])
print(json.dumps({{"cpus": execs * 4, "edges": n_edges, **res}}))
spark.stop()
"""


def _run(args: list[str]) -> dict:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        SPARK_EXECUTOR_MEMORY=os.environ.get("SPARK_EXECUTOR_MEMORY", "9g"),
        SPARK_GRAFT_LOCAL_DIR=os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-shuffle"),
    )
    out = subprocess.run(
        [sys.executable, "-c", JOB.format(repo=str(REPO)), *args],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("subprocess failed")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    epath = f"/tmp/ccl_spark_scaling_edges_{v}"
    if not Path(epath, "_SUCCESS").exists():
        raise SystemExit(f"run bench_scaling.py first to generate {epath}")
    lo = _run(["1", epath, str(reps)])
    hi = _run(["4", epath, str(reps)])
    eff_obs = (lo["observe"]["min"] / hi["observe"]["min"]) / 4
    eff_agg = (lo["agg"]["min"] / hi["agg"]["min"]) / 4
    summary = {
        "edges": hi["edges"], "reps": reps,
        "t4_observe": round(lo["observe"]["min"], 2),
        "t4_agg": round(lo["agg"]["min"], 2),
        "t16_observe": round(hi["observe"]["min"], 2),
        "t16_agg": round(hi["agg"]["min"], 2),
        "eff_observe": round(eff_obs, 3), "eff_agg": round(eff_agg, 3),
        "raw": {"lo": lo, "hi": hi},
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as f:
        f.write(
            f"\n## CC observe-signature A/B {stamp} "
            f"(edges={hi['edges']}, pure-distributed, min of {reps}, "
            f"fresh local-cluster JVM per level)\n\n"
            "| signature shape | 1x4 (N=4) | 4x4 (4N=16) | efficiency (tN/t4N)/4 |\n"
            "|---|---|---|---|\n"
            f"| observe() in round job | {summary['t4_observe']} | {summary['t16_observe']} | {summary['eff_observe']} |\n"
            f"| lazy-checkpoint + agg | {summary['t4_agg']} | {summary['t16_agg']} | {summary['eff_agg']} |\n\n"
        )


if __name__ == "__main__":
    main()
