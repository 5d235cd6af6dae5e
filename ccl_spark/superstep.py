"""Checkpoint / lineage / resume harness for iterative graph jobs.

The reference tracked per-stage wall time in a global stopwatch
(/root/reference/stopwatch.py) and had no resume story — a crash
re-ran the whole stack. Here every k-th superstep persists the
iteration state to parquet together with per-partition lineage rows
(superstep, partition_id, rows, wall_s, changed, delta, ts), so a
killed run restarts from the latest complete superstep, and the
lineage table doubles as the metrics/convergence log the north rule
asks for.

Layout under ``root``::

    state/step=<n>/...parquet     iteration state at superstep n
    lineage/...parquet            append-only metrics rows

At 100 TB this is an Iceberg table append (`df.writeTo(...).append()`);
parquet-with-identical-layout is the sandbox stand-in, and the write
pattern (immutable per-superstep snapshots + append-only log) is the
same one Iceberg snapshots give for free.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe (works for any configured scheme)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    p = jvm_path(path)
    return p.getFileSystem(conf).exists(p)


def edge_signature(df: DataFrame, *cols: str) -> tuple[int, int]:
    """Order-free exact signature of a row set: (count, xor of row
    hashes) — the cheap identity check pinned next to iterative-job
    checkpoints (see pin_input_signature)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*cols)), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def pin_input_signature(
    harness: "SuperstepHarness",
    resumed: object,
    sig: tuple[int, int],
    params: str,
    what: str,
) -> None:
    """Validate (on resume) or persist (on fresh run) an order-free
    input signature (count + bit_xor(xxhash64)) plus a parameter string
    next to the harness root, so resuming a checkpoint against a
    different edge table — or a different recurrence — raises instead
    of silently continuing the wrong computation (the failure mode
    ADVICE r2 flagged for pagerank; this is the shared version for
    hits/lpa/scc)."""
    spath = f"{harness.root}/input_sig"
    if resumed is not None and fs_exists(harness.spark, f"{spath}/_SUCCESS"):
        s = harness.spark.read.parquet(spath).first()
        if (s["n"], s["h"]) != (sig[0], sig[1]):
            raise ValueError(
                f"{what} resume: the edges argument does not match the edge "
                f"table this checkpoint was built from ({harness.root}); "
                "clear the harness root (or use a new one) to start fresh"
            )
        if s["params"] != params:
            raise ValueError(
                f"{what} resume: parameters do not match the run this "
                f"checkpoint was built from ({harness.root}: "
                f"stored={s['params']!r}, requested={params!r}); clear the "
                "harness root (or use a new one) to start fresh"
            )
    if resumed is None or not fs_exists(harness.spark, f"{spath}/_SUCCESS"):
        harness.spark.createDataFrame(
            [(int(sig[0]), int(sig[1]), params)], "n long, h long, params string"
        ).write.mode("overwrite").parquet(spath)


class SuperstepHarness:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        algo: str,
        run_id: str | None = None,
        interval: int = 1,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.algo = algo
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.interval = max(int(interval), 1)

    # -- timing ----------------------------------------------------------
    def timer(self) -> float:
        return time.monotonic()

    # -- state -----------------------------------------------------------
    def _state_path(self, step: int) -> str:
        return f"{self.root}/state/step={step}"

    def record(
        self,
        superstep: int,
        df: DataFrame,
        changed: int,
        delta: float,
        timer: float | None = None,
    ) -> DataFrame:
        """Persist state + lineage for a completed superstep; return the
        (possibly re-read) state DataFrame."""
        wall = time.monotonic() - timer if timer is not None else float("nan")
        if superstep % self.interval != 0:
            return df
        path = self._state_path(superstep)
        df.write.mode("overwrite").parquet(path)
        state = self.spark.read.parquet(path)
        # ONE scan of the just-written state: per-partition row counts
        # (one tiny row per partition) summed driver-side give the
        # total, so no standalone count() job on the hot iterative
        # path (ADVICE r2); the lineage rows are then a local-relation
        # write, not a second scan.
        pp = (
            state.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        total = sum(r["rows"] for r in pp)
        rows_per_sec = total / wall if wall == wall and wall > 0 else float("nan")
        per_part = self.spark.createDataFrame(
            [
                (
                    self.run_id,
                    self.algo,
                    superstep,
                    r["partition_id"],
                    r["rows"],
                    int(changed),
                    float(delta),
                    float(wall),
                    float(rows_per_sec),
                )
                for r in pp
            ],
            "run_id string, algo string, superstep int, partition_id int, "
            "rows long, changed long, delta double, wall_s double, "
            "rows_per_sec double",
        ).withColumn("ts", F.current_timestamp())
        per_part.write.mode("append").parquet(f"{self.root}/lineage")
        return state

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/lineage")

    def latest(self):
        """(superstep, state DataFrame) of the newest complete checkpoint,
        or None. Completeness is judged by the parquet _SUCCESS marker."""
        jvm_path = self.spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
        conf = self.spark._jsc.hadoopConfiguration()  # noqa: SLF001
        root = jvm_path(f"{self.root}/state")
        fs = root.getFileSystem(conf)
        if not fs.exists(root):
            return None
        steps = []
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if name.startswith("step="):
                step = int(name.split("=", 1)[1])
                if fs.exists(jvm_path(f"{self.root}/state/step={step}/_SUCCESS")):
                    steps.append(step)
        if not steps:
            return None
        best = max(steps)
        return best + 1, self.spark.read.parquet(self._state_path(best))
