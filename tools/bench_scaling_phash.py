"""Perceptual-hash scaling evidence over DIVERSE random-frame MP4s
(synth_mp4_media; the sinusoid near-dup synth repeats its base
pattern on small parameter moduli and floods the pair join at scale):
the Arrow-batched video decode + mean-frame pHash stage (video_mean_phashes) and the full
near-dup pipeline (hash + 4-piece pigeonhole join) measured at two
local-cluster sizes (1x4 vs 4x4 executor JVMs), same methodology as
bench_scaling.py (shared parquet input, fresh JVM per level, min of
reps).

The hash stage is a pure mapInPandas scan — ZERO exchanges — so it
bounds what this box allows for shuffle-free stages (the input is
repartitioned to 128 before the checkpoint: a 128MB-split parquet
read yields ~12 partitions of this table, which starves 16 cores and
masquerades as bad scaling): any gap from
1.0 efficiency here is the hardware (SMT / memory bandwidth), not
the plan.  Contrast with the shuffle-bound CC rows in
BENCH/BASELINE.md.

Usage: python tools/bench_scaling_phash.py [n_videos] [reps]
(generates /tmp/ccl_spark_scaling_videos_{n_videos} on first run)
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
from ccl_spark.session import get_spark
from ccl_spark.multimodal import synth_mp4_media
n_videos = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark("phash_scaling_gen")
synth_mp4_media(spark, n_videos, seed=42).repartition(64).write.mode(
    "overwrite").parquet(path)
spark.stop()
"""

JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from ccl_spark.session import get_spark
from ccl_spark.multimodal import video_mean_phashes, video_near_dup_pairs

execs = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("phash_scaling", master=f"local-cluster[{{execs}},4,10240]")
media = spark.read.parquet(path).repartition(128).localCheckpoint(eager=True)
n_media = media.count()

def _settle():
    import gc
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)

t_hash, t_pairs, n_h, n_p = [], [], 0, 0
for _ in range(reps):
    t0 = time.monotonic()
    n_h = video_mean_phashes(media).count()
    t_hash.append(time.monotonic() - t0)
    t0 = time.monotonic()
    n_p = video_near_dup_pairs(media).count()
    t_pairs.append(time.monotonic() - t0)
    _settle()
print(json.dumps({{"cpus": execs * 4, "media": n_media, "hashes": n_h,
                   "pairs": n_p, "t_hash": min(t_hash), "t_pairs": min(t_pairs),
                   "t_hash_all": t_hash, "t_pairs_all": t_pairs}}))
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
        raise SystemExit(f"phash scaling subprocess failed: {args}")
    return out.stdout


def main() -> None:
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = f"/tmp/ccl_spark_scaling_videos_{n_videos}"
    if not Path(path, "_SUCCESS").exists():
        print(f"generating {path} ...", flush=True)
        _run(GEN.format(repo=str(REPO)), [str(n_videos), path])
    results = {}
    for execs in (1, 4):
        line = [
            l
            for l in _run(
                JOB.format(repo=str(REPO)), [str(execs), path, str(reps)]
            ).splitlines()
            if l.startswith("{")
        ][-1]
        results[execs] = json.loads(line)
        print(json.dumps(results[execs]), flush=True)
    lo, hi = results[1], results[4]
    eff_h = (lo["t_hash"] / hi["t_hash"]) / 4
    eff_p = (lo["t_pairs"] / hi["t_pairs"]) / 4
    summary = {
        "media": hi["media"], "hashes": hi["hashes"], "pairs": hi["pairs"],
        "reps": reps,
        "t4_hash": round(lo["t_hash"], 2), "t16_hash": round(hi["t_hash"], 2),
        "t4_pairs": round(lo["t_pairs"], 2), "t16_pairs": round(hi["t_pairs"], 2),
        "eff_hash": round(eff_h, 3), "eff_pairs": round(eff_p, 3),
        "videos_per_sec_16": round(hi["media"] / hi["t_hash"], 1),
        "raw": results,
    }
    print(json.dumps(summary))
    md = REPO / "BENCH" / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with md.open("a") as f:
        f.write(
            f"\n## Video pHash scaling {stamp} "
            f"(videos={hi['media']}, pairs={hi['pairs']}, min of {reps}, "
            f"fresh local-cluster JVM per level)\n\n"
            "| stage | 1x4 (N=4) | 4x4 (4N=16) | efficiency (tN/t4N)/4 |\n"
            "|---|---|---|---|\n"
            f"| video_mean_phashes (s) | {summary['t4_hash']} | {summary['t16_hash']} | {summary['eff_hash']} |\n"
            f"| video_near_dup_pairs (s) | {summary['t4_pairs']} | {summary['t16_pairs']} | {summary['eff_pairs']} |\n"
        )


if __name__ == "__main__":
    main()
