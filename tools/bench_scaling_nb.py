"""Naive-Bayes classifier scaling evidence: train (one token->class
count shuffle) + classify (broadcast model joins + per-doc aggregate)
measured at two local-cluster sizes (1x4 vs 4x4 executor JVMs), same
methodology as bench_scaling.py (shared parquet input, fresh JVM per
level, min of reps).

The classify stage is one corpus tokenization + broadcast joins + a
(doc, class) aggregate — a single exchange over the exploded token
stream — so it sits between the shuffle-free pHash bound (~0.94 raw)
and the shuffle-round-bound CC floor (~0.5-0.6 raw) documented in
BENCH/BASELINE.md.

Usage: python tools/bench_scaling_nb.py [n_docs] [reps]
(generates /tmp/ccl_spark_scaling_nbdocs_{n_docs} on first run)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

GEN = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ccl_spark.session import get_spark
from ccl_spark.datagen import generate_pages
n_docs = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark("nb_scaling_gen")
docs = generate_pages(spark, n_docs, seed=42).select(
    F.xxhash64("url").alias("doc_id"), "text", "lang",
)
docs.repartition(64).write.mode("overwrite").parquet(path)
spark.stop()
"""

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from ccl_spark.session import get_spark
from ccl_spark.textops import naive_bayes_train, naive_bayes_classify

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("nb_scaling", master=f"local-cluster[{{execs}},4,10240]")
docs = spark.read.parquet(path).repartition(128).localCheckpoint(eager=True)
n_docs = docs.count()

def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

t_train, t_cls, n_scored = [], [], 0
for _ in range(reps):
    t0 = time.monotonic()
    cs, tc, v = naive_bayes_train(docs)
    cs = cs.localCheckpoint(eager=True)
    tc = tc.localCheckpoint(eager=True)
    cs.count(); tc.count()
    t_train.append(time.monotonic() - t0)
    t0 = time.monotonic()
    n_scored = naive_bayes_classify(docs, cs, tc, v, n_docs).count()
    t_cls.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": execs * 4, "docs": n_docs, "scored": n_scored,
                   "vocab": v, "t_train": min(t_train), "t_cls": min(t_cls),
                   "t_train_all": t_train, "t_cls_all": t_cls}}))
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
        raise SystemExit(f"nb scaling subprocess failed: {args}")
    return out.stdout


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = f"/tmp/ccl_spark_scaling_nbdocs_{n_docs}"
    if not Path(path, "_SUCCESS").exists():
        print(f"generating {path} ...", flush=True)
        _run(GEN.format(repo=str(REPO)), [str(n_docs), path])
    results = {}
    for execs in (1, 4):
        line = [
            l
            for l in _run(JOB.format(repo=str(REPO)), [str(execs), path, str(reps)]).splitlines()
            if l.startswith("{")
        ][-1]
        results[execs] = json.loads(line)
        print(json.dumps(results[execs]), flush=True)
    r1, r4 = results[1], results[4]
    for stage in ("t_train", "t_cls"):
        eff = (r1[stage] / r4[stage]) / 4.0
        print(
            f"{stage}: 1x4 {r1[stage]:.2f}s -> 4x4 {r4[stage]:.2f}s  "
            f"raw N->4N efficiency {eff:.3f}"
        )


if __name__ == "__main__":
    main()
