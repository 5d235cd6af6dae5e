"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so the sanctioned proxy is the
identical job on identical input at two local parallelism levels:
local[8] (N) and local[32] (4N). Methodology:

1. the corpus is generated ONCE and written to parquet — both JVMs read
   the same bytes (generation is not part of the timed job);
2. each parallelism level runs in a FRESH JVM (subprocess);
3. CC and PageRank each run `reps` times per JVM and the minimum is
   reported — local mode shares one heap/page cache, so cold-start
   variance is real and the minimum is the honest steady-state number;
4. efficiency = (t_N / t_4N) / 4, appended to BENCH/BASELINE.md.

Caveat recorded with the results: a single-socket shared-memory JVM is
a pessimistic proxy for multi-executor scaling — 8->32 threads share
one memory bus and one GC, which a real 4x cluster does not.

Two executor pairings are supported (argv 3/4, default 2 8):

- 2x4 vs 8x4 (8 -> 32 threads): uses every vCPU, but 32 vCPUs are SMT
  siblings sharing one memory bus, so shuffle-bound stages hit a
  hardware ceiling a real 4x cluster does not have (the calibration
  probe quantifies it).
- 1x4 vs 4x4 (4 -> 16 threads): still a 4x executor scale-out, but
  below the SMT/bus saturation artifacts — the closer proxy to adding
  machines, since a real cluster multiplies memory bandwidth with
  nodes.

Usage: python bench_scaling.py [V] [reps] [execs_lo] [execs_hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

GEN = """
import sys
sys.path.insert(0, {repo!r})
from ccl_spark.session import get_spark
from ccl_spark.datagen import generate_pages
from ccl_spark.edges import page_edges
v = int(sys.argv[1]); out = sys.argv[2]
spark = get_spark("scaling_gen", master="local[32]")
pages = generate_pages(spark, v, seed=42)
pages.write.mode("overwrite").parquet(out + "_pages")
page_edges(spark.read.parquet(out + "_pages")).write.mode("overwrite").parquet(out)
print("GENERATED")
spark.stop()
"""

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from ccl_spark.session import get_spark
from ccl_spark.cc import connected_components
from ccl_spark.pagerank import pagerank

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
# real separate executor JVMs: the honest N -> 4N proxy
spark = get_spark("scaling", master=f"local-cluster[{{execs}},4,10240]")
cpus = execs * 4
edges = spark.read.parquet(path).localCheckpoint(eager=True)
n_edges = edges.count()
# extraction: the CPU-bound stage (regex over html) — demonstrates
# scaling where the scaled resource (cores) is the bottleneck
from ccl_spark.edges import page_edges
pages = spark.read.parquet(path + "_pages").localCheckpoint(eager=True)
pages.count()
def _settle():
    # each rep leaves superseded localCheckpoint blocks behind until the
    # driver GC lets ContextCleaner release them; force that between
    # reps so rep k+1 doesn't pay rep k's executor-storage eviction
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

t_ex = []
for _ in range(reps):
    t0 = time.monotonic()
    page_edges(pages).count()
    t_ex.append(time.monotonic() - t0)
    _settle()
t_cc, t_pr, n_comp = [], [], 0
for _ in range(reps):
    t0 = time.monotonic()
    n_comp = connected_components(edges).select("component").distinct().count()
    t_cc.append(time.monotonic() - t0)
    _settle()
# pure-distributed CC (no subcritical finish): the ALGORITHM-scaling
# number — the hybrid finish trades a serial tail for wall time, which
# deflates the N->4N ratio while speeding both levels up (see
# BENCH/BASELINE.md round-3 summary)
t_cc0 = []
for _ in range(reps):
    t0 = time.monotonic()
    connected_components(edges, local_finish_threshold=0).select("component").distinct().count()
    t_cc0.append(time.monotonic() - t0)
    _settle()
for _ in range(reps):
    t0 = time.monotonic()
    pagerank(edges, tol=1e-6).count()
    t_pr.append(time.monotonic() - t0)
    _settle()
# walk-corpus generation (DeepWalk input): per step two keyed
# equi-joins over O(V) walk state — the embedding-pipeline stage
from ccl_spark.walks import random_walks
t_wk = []
for _ in range(reps):
    t0 = time.monotonic()
    random_walks(edges, walk_len=4, n_walks=1, seed=42).count()
    t_wk.append(time.monotonic() - t0)
    _settle()
# node2vec (2nd-order p/q-biased) walks: per step the draw joins the
# previous vertex's adjacency too — the heavier, weighted variant
from ccl_spark.walks import node2vec_walks
t_n2v = []
for _ in range(reps):
    t0 = time.monotonic()
    node2vec_walks(edges, walk_len=4, n_walks=1, p=2.0, q=0.5, seed=42).count()
    t_n2v.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": cpus, "edges": n_edges, "components": n_comp,
                   "t_ex": min(t_ex), "t_cc": min(t_cc), "t_pr": min(t_pr),
                   "t_cc0": min(t_cc0), "t_cc0_all": t_cc0, "t_wk": min(t_wk),
                   "t_wk_all": t_wk, "t_n2v": min(t_n2v), "t_n2v_all": t_n2v,
                   "t_ex_all": t_ex, "t_cc_all": t_cc, "t_pr_all": t_pr}}))
spark.stop()
"""


def _run(script: str, args: list[str]) -> str:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        SPARK_EXECUTOR_MEMORY=os.environ.get("SPARK_EXECUTOR_MEMORY", "9g"),
        SPARK_GRAFT_LOCAL_DIR=os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-shuffle"),
        CCL_SPARK_DEBUG="1",
    )
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    Path(f"/tmp/scaling_job_{'_'.join(args[:1] or ['gen'])}.err").write_text(out.stderr[-20000:])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"scaling subprocess failed: {args}")
    return out.stdout


def _spin(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _hw_speedup() -> float:
    """Measured deliverable CPU speedup 8 -> 32 workers on THIS machine.

    The sandbox's 32 vCPUs are SMT threads: a pure-CPU multiprocessing
    probe measures what 4x 'more cores' can actually deliver here
    (~2.9x, i.e. a 0.72 efficiency ceiling before any framework cost).
    Efficiencies are reported both raw (vs the ideal 4x) and normalized
    by this ceiling — a real N -> 4N executor cluster has 4x hardware.
    """
    import multiprocessing as mp

    def bench(procs: int) -> float:
        with mp.Pool(procs) as p:
            t0 = time.monotonic()
            p.map(_spin, [4_000_000] * 64)
            return time.monotonic() - t0

    return bench(8) / bench(32)


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_V", "2000000"))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    execs_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    execs_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    epath = f"/tmp/ccl_spark_scaling_edges_{v}"
    if not Path(epath, "_SUCCESS").exists():
        _run(GEN.format(repo=str(REPO)), [str(v), epath])

    results = {}
    for execs in (execs_lo, execs_hi):  # N = lo*4 cores vs 4N = hi*4 cores
        out = _run(JOB.format(repo=str(REPO)), [str(execs), epath, str(reps)])
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results[execs * 4] = json.loads(line)

    lo, hi = results[execs_lo * 4], results[execs_hi * 4]
    hw = _hw_speedup()
    eff_cc = (lo["t_cc"] / hi["t_cc"]) / 4
    eff_cc0 = (lo["t_cc0"] / hi["t_cc0"]) / 4
    eff_pr = (lo["t_pr"] / hi["t_pr"]) / 4
    eff_ex = (lo["t_ex"] / hi["t_ex"]) / 4
    eff_wk = (lo["t_wk"] / hi["t_wk"]) / 4
    eff_n2v = (lo["t_n2v"] / hi["t_n2v"]) / 4
    summary = {
        "vertices": v,
        "edges": hi["edges"],
        "reps": reps,
        "hw_speedup_8_to_32": round(hw, 2),
        "normalized_efficiency_cc": round((lo["t_cc"] / hi["t_cc"]) / hw, 3),
        "normalized_efficiency_pagerank": round((lo["t_pr"] / hi["t_pr"]) / hw, 3),
        "scaling_efficiency_extract": round(eff_ex, 3),
        "cores": {"lo": execs_lo * 4, "hi": execs_hi * 4},
        "local8": {"t_ex": round(lo["t_ex"], 2), "t_cc": round(lo["t_cc"], 2), "t_pr": round(lo["t_pr"], 2)},
        "local32": {"t_ex": round(hi["t_ex"], 2), "t_cc": round(hi["t_cc"], 2), "t_pr": round(hi["t_pr"], 2)},
        "edges_per_sec_cc_local8": round(lo["edges"] / lo["t_cc"], 1),
        "edges_per_sec_cc_local32": round(hi["edges"] / hi["t_cc"], 1),
        "edges_per_sec_pr_local8": round(lo["edges"] / lo["t_pr"], 1),
        "edges_per_sec_pr_local32": round(hi["edges"] / hi["t_pr"], 1),
        "scaling_efficiency_cc": round(eff_cc, 3),
        "scaling_efficiency_cc_pure_distributed": round(eff_cc0, 3),
        "scaling_efficiency_pagerank": round(eff_pr, 3),
        "scaling_efficiency_walks": round(eff_wk, 3),
        "scaling_efficiency_node2vec": round(eff_n2v, 3),
        "raw": {"local8": lo, "local32": hi},
    }
    print(json.dumps(summary))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    nlo, nhi = execs_lo * 4, execs_hi * 4
    lines = [
        f"\n## Scaling run {stamp} (V={v}, edges={hi['edges']}, min of {reps} reps, shared-input parquet, local-cluster executors, fresh driver JVM per level)\n",
        f"| metric | {execs_lo} executors x 4 cores (N={nlo}) | {execs_hi} executors x 4 cores (4N={nhi}) | efficiency (tN/t4N)/4 |",
        "|---|---|---|---|",
        f"| extraction (s, CPU-bound) | {summary['local8']['t_ex']} | {summary['local32']['t_ex']} | {summary['scaling_efficiency_extract']} |",
        f"| CC to fixpoint (s) | {summary['local8']['t_cc']} | {summary['local32']['t_cc']} | {summary['scaling_efficiency_cc']} |",
        f"| CC pure-distributed (s, threshold=0) | {round(lo['t_cc0'], 2)} | {round(hi['t_cc0'], 2)} | {summary['scaling_efficiency_cc_pure_distributed']} |",
        f"| PageRank to 1e-6 (s) | {summary['local8']['t_pr']} | {summary['local32']['t_pr']} | {summary['scaling_efficiency_pagerank']} |",
        f"| walk corpus len-4 (s) | {round(lo['t_wk'], 2)} | {round(hi['t_wk'], 2)} | {summary['scaling_efficiency_walks']} |",
        f"| node2vec walks len-4 p=2 q=.5 (s) | {round(lo['t_n2v'], 2)} | {round(hi['t_n2v'], 2)} | {summary['scaling_efficiency_node2vec']} |",
        f"| CC edges/sec | {summary['edges_per_sec_cc_local8']} | {summary['edges_per_sec_cc_local32']} | |",
        f"| PR edges/sec | {summary['edges_per_sec_pr_local8']} | {summary['edges_per_sec_pr_local32']} | |",
        "",
        f"Hardware calibration: a pure-CPU multiprocessing probe measures "
        f"{summary['hw_speedup_8_to_32']}x deliverable speedup from 8 to 32 workers on this "
        f"machine (32 vCPUs are SMT threads), i.e. a "
        f"{round(summary['hw_speedup_8_to_32'] / 4, 2)} efficiency ceiling before any framework "
        f"cost. Normalized to that ceiling: CC {summary['normalized_efficiency_cc']}, "
        f"PageRank {summary['normalized_efficiency_pagerank']}.",
        "",
        "Executors are separate JVMs (local-cluster mode): shuffles cross",
        "process boundaries and each executor has its own heap/GC — the",
        "closest single-machine proxy to an N->4N cluster scale-out.",
        "",
    ]
    with md.open("a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
