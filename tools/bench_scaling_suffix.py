"""N -> 4N scaling of the distributed suffix-array ranking (r6):
builds synthetic token streams of N and 4N tokens (deterministic
splitmix64 words, Zipf-ish small vocab so ranks collide for several
doubling rounds) and times suffix_array end-to-end.

Usage: BENCH_N=2500000 python tools/bench_scaling_suffix.py
Prints one JSON line with both walls and the raw scaling efficiency
(t_N * 4 / t_4N).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ccl_spark.session import get_spark  # noqa: E402
from ccl_spark.suffix import suffix_array  # noqa: E402


def stream(spark, n: int):
    # pos, tok: tok = "w<h%V>" with V small enough that prefix doubling
    # needs several rounds
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("pos"),
            F.concat(
                F.lit("w"), (F.xxhash64("id") % 200).cast("string")
            ).alias("tok"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    n = int(os.environ.get("BENCH_N", "2500000"))
    spark = get_spark("bench_scaling_suffix")

    def settle():
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.5)

    walls = {}
    for label, size in (("N", n), ("4N", 4 * n)):
        s = stream(spark, size)
        best = None
        for _ in range(2):
            settle()
            t0 = time.monotonic()
            out = suffix_array(s, max_rounds=20)
            cnt = out.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        walls[label] = round(best, 3)
        print(f"  {label} ({size} tokens): {best:.2f}s rows={cnt}", file=sys.stderr)
        s.unpersist()
    eff = round(walls["N"] * 4 / walls["4N"], 3)
    print(json.dumps({"metric": "suffix_array_scaling", "n": n,
                      "wall_N": walls["N"], "wall_4N": walls["4N"],
                      "raw_efficiency": eff}))
    spark.stop()


if __name__ == "__main__":
    main()
