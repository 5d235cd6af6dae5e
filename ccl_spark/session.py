"""SparkSession builders tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: AQE on
(runtime coalescing + skew-join splitting), shuffle partitions sized to
the core count rather than the 200 default, Arrow enabled for the
pandas-UDF extraction path.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ccl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] or local[*]; oversubscribe 2x — uneven task durations
        # and GC pauses make exact-fit partitioning leave cores idle
        # (same insight as the reference's 1.5x Dask oversharding,
        # ccl_marker_stack.py:223-233)
        n = master[master.index("[") + 1 : -1] if "[" in master else str(cpus)
        if n == "*":
            cores = cpus
        elif "," in n:  # local-cluster[execs,cores,mem]
            execs, per_exec, _ = n.split(",")
            cores = int(execs) * int(per_exec)
        else:
            cores = max(int(n), 1)
        shuffle_partitions = 2 * cores
    # AQE starts shuffles wide (so hash-join build sides stay small on
    # big inputs) and coalesces down to ~shuffle_partitions for small
    # stages — partition count follows the data, not a fixed knob
    initial_parts = max(4 * shuffle_partitions, 128)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(initial_parts),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # vertex-keyed equi-joins: shuffled-hash beats sort-merge (no
        # per-round sorts); AQE skew-split keeps build sides bounded
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # local-cluster mode: the master string's third field is WORKER
        # capacity; the executor heap comes from this conf (1g default
        # otherwise — an easy OOM on real data)
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "8g"))
        # executor python workers must find this package in
        # local-cluster mode (separate worker processes, no inherited
        # sys.path); on a real cluster --py-files supplies it instead
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p
                for p in (
                    str(Path(__file__).resolve().parents[1]),
                    os.environ.get("PYTHONPATH", ""),
                )
                if p
            ),
        )
    )
    # fast shuffle storage (clusters put shuffle on NVMe/ramdisk);
    # benches set this to tmpfs so both scaling levels measure compute,
    # not the sandbox's virtio disk
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
