"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so the sanctioned proxy is the
identical job on identical input at two local parallelism levels:
local[8] (N) and local[32] (4N), each in a FRESH JVM (subprocess) so
neither run inherits the other's warmed state. Efficiency
= (t_N / t_4N) / 4. Results are appended to BENCH/BASELINE.md and
printed as one JSON line.

Usage: python bench_scaling.py [V]    (default V=200000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from ccl_spark.session import get_spark
from ccl_spark.datagen import generate_pages
from ccl_spark.edges import page_edges
from ccl_spark.cc import connected_components
from ccl_spark.pagerank import pagerank

cpus = int(sys.argv[1]); v = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
edges = page_edges(generate_pages(spark, v, seed=42)).localCheckpoint(eager=True)
n_edges = edges.count()
t0 = time.monotonic()
n_comp = connected_components(edges).select("component").distinct().count()
t_cc = time.monotonic() - t0
t0 = time.monotonic()
pagerank(edges, tol=1e-6).count()
t_pr = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "edges": n_edges, "components": n_comp,
                   "t_cc": t_cc, "t_pr": t_pr}}))
spark.stop()
"""


def run(cpus: int, v: int) -> dict:
    script = JOB.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(v)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_V", "200000"))
    lo = run(8, v)
    hi = run(32, v)
    eff_cc = (lo["t_cc"] / hi["t_cc"]) / 4
    eff_pr = (lo["t_pr"] / hi["t_pr"]) / 4
    result = {
        "vertices": v,
        "edges": hi["edges"],
        "local8": {"t_cc": round(lo["t_cc"], 2), "t_pr": round(lo["t_pr"], 2)},
        "local32": {"t_cc": round(hi["t_cc"], 2), "t_pr": round(hi["t_pr"], 2)},
        "edges_per_sec_cc_local8": round(lo["edges"] / lo["t_cc"], 1),
        "edges_per_sec_cc_local32": round(hi["edges"] / hi["t_cc"], 1),
        "edges_per_sec_pr_local8": round(lo["edges"] / lo["t_pr"], 1),
        "edges_per_sec_pr_local32": round(hi["edges"] / hi["t_pr"], 1),
        "scaling_efficiency_cc": round(eff_cc, 3),
        "scaling_efficiency_pagerank": round(eff_pr, 3),
    }
    print(json.dumps(result))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    lines = [
        f"\n## Scaling run {stamp} (V={v}, edges={hi['edges']})\n",
        "| metric | local[8] (N) | local[32] (4N) | efficiency (t8/t32)/4 |",
        "|---|---|---|---|",
        f"| CC to fixpoint (s) | {result['local8']['t_cc']} | {result['local32']['t_cc']} | {result['scaling_efficiency_cc']} |",
        f"| PageRank to 1e-6 (s) | {result['local8']['t_pr']} | {result['local32']['t_pr']} | {result['scaling_efficiency_pagerank']} |",
        f"| CC edges/sec | {result['edges_per_sec_cc_local8']} | {result['edges_per_sec_cc_local32']} | |",
        f"| PR edges/sec | {result['edges_per_sec_pr_local8']} | {result['edges_per_sec_pr_local32']} | |",
        "",
    ]
    with md.open("a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
