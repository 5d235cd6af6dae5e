"""Structured Streaming operators.

The reference is batch (slice lists); its temporal semantics — per-label
lifetimes ("ages"), end-of-life detection — map naturally onto streams
of timestamped events. This module provides the streaming versions:

- `windowed_activity`: watermarked tumbling-window counts per key
  (late data handled by the watermark, not by reprocessing);
- `running_ages`: a custom stateful operator via
  ``applyInPandasWithState`` — per key, maintains (first_seen,
  last_seen, n_events, n_days) across microbatches; this is the
  streaming generalization of the reference's m_ages accumulation
  (ccl_marker_stack.py:989-1003).
- `streaming_dedup`: exact content dedup on an unbounded stream —
  first occurrence of each content hash passes, later copies are
  dropped. State is bounded by the event-time watermark
  (``dropDuplicatesWithinWatermark``), the production shape for a
  crawl stream where re-fetches of the same page cluster in time; a
  training corpus is deduped exactly by the batch operators, the
  stream layer pre-filters the firehose.

Tests drive these with a file source + ``trigger(availableNow=True)``
so results are deterministic; production uses the same code over
Kafka/files with continuous triggers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_activity(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts per key with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via native session windows: events of
    one key closer than ``gap`` merge into one session; a session spans
    [first event, last event + gap). Works on batch frames as-is and on
    streams when ``watermark`` is set (state for a session closes once
    the watermark passes its end — the standard unbounded-stream
    sessionization shape).

    Returns ``(key, session_start, session_end, n_events)`` where
    ``session_end`` is the window end (last event + gap). One shuffle
    on the key; sessions of different keys never interact, so the
    operator scales with the per-key event density, not the corpus."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


# Distinct active days are kept exactly, as a sorted int32 epoch-day
# array in binary state, capped at MAX_STATE_DAYS entries (256 KiB —
# ~180 years of daily activity; beyond the cap the count saturates,
# documented rather than silently wrong). This matches the batch
# `ages` definition (countDistinct(to_date(ts))), i.e. the reference's
# m_ages = number of slices a label appears in — NOT the calendar span.
MAX_STATE_DAYS = 65536

AGE_STATE = StructType(
    [
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("days_blob", BinaryType()),
    ]
)

AGE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("n_days", IntegerType()),
    ]
)


def _ages_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_seen, last_seen, n_events, days_blob = state.get
        days = np.frombuffer(days_blob, dtype=np.int32) if days_blob else np.array([], np.int32)
    else:
        first_seen = last_seen = None
        n_events = 0
        days = np.array([], dtype=np.int32)
    batch_days: set[int] = set()
    for pdf in pdf_iter:
        ts = pd.to_datetime(pdf["ts"])
        n_events += len(pdf)
        lo, hi = ts.min(), ts.max()
        first_seen = lo if first_seen is None else min(first_seen, lo)
        last_seen = hi if last_seen is None else max(last_seen, hi)
        batch_days.update(
            (ts.values.astype("datetime64[D]").astype(np.int64)).tolist()
        )
    if batch_days:
        days = np.union1d(days, np.array(sorted(batch_days), dtype=np.int32))
    if len(days) > MAX_STATE_DAYS:
        days = days[:MAX_STATE_DAYS]  # saturate: count stops growing
    n_days = int(len(days))
    state.update((first_seen, last_seen, n_events, days.tobytes()))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "first_seen": [first_seen],
            "last_seen": [last_seen],
            "n_events": [n_events],
            "n_days": [n_days],
        }
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence-wins exact dedup over a stream: rows whose
    content hash was already seen within the watermark horizon are
    dropped. State per distinct hash is evicted once the watermark
    passes, so state size is bounded by the dedup horizon — the only
    sound contract on an unbounded stream (an unbounded seen-set is a
    slow OOM). In batch mode the same semantics run as a
    hash-partitioned first-row window (deterministic: earliest
    (ts, id) wins), which is how the parity test pins the operator
    against dedup.exact_duplicates' keep set."""
    from pyspark.sql import Window

    hashed = docs.withColumn("text_hash", F.md5(F.col(text_col).cast("binary")))
    if docs.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    w = Window.partitionBy("text_hash").orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _complete_versions(
    spark, root: str, prefix: str, before: int | None = None,
    subpaths: tuple[str, ...] = ("",),
) -> list[int]:
    """Versions of ``root/{prefix}{v}`` snapshots whose _SUCCESS
    markers are all present (one per entry in ``subpaths``; "" = the
    directory itself), optionally restricted strictly below ``before``
    — the shared replay-idempotence contract of every streaming fold
    here (a replayed microbatch must never read the snapshot it is
    about to overwrite)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    rootp = jvm_path(root)
    fs = rootp.getFileSystem(conf)
    if not fs.exists(rootp):
        return []
    versions = []
    for status in fs.listStatus(rootp):
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        v = int(name[len(prefix):])
        if before is not None and v >= before:
            continue
        base = f"{root}/{prefix}{v}"
        if all(
            fs.exists(jvm_path(f"{base}/{sp}/_SUCCESS" if sp else f"{base}/_SUCCESS"))
            for sp in subpaths
        ):
            versions.append(v)
    return sorted(versions)


def latest_cc_labels(spark, root: str, before: int | None = None):
    """(version, labels DataFrame) of the newest COMPLETE snapshot under
    ``root`` written by streaming_cc, or None. Completeness is judged by
    the parquet _SUCCESS marker (same contract as SuperstepHarness).
    ``before`` restricts to versions strictly below it — the fold uses
    ``before=batch_id`` so a REPLAYED microbatch (crash between the
    parquet write and the stream-checkpoint commit) never reads the
    snapshot it is about to overwrite (ADVICE r4: the overwrite would
    otherwise consume its own input plan and fail or corrupt)."""
    versions = _complete_versions(spark, root, "labels_v", before)
    if not versions:
        return None
    best = versions[-1]
    return best, spark.read.parquet(f"{root}/labels_v{best}")


def streaming_cc(
    edge_stream: DataFrame,
    root: str,
    src: str = "src",
    dst: str = "dst",
):
    """Continuous crawl-snapshot fold-in: each microbatch of edges
    merges into the persisted component labels via
    components.incremental_cc (prior labels enter the union-find as
    already-converged star edges, so only newly-connected regions
    iterate), and the updated ``(vertex, component)`` table lands in
    ``root/labels_v{batch_id}`` — the streaming generalization of the
    reference's slice-by-slice ccl_relabel2 linking
    (ccl_marker_stack.py:262-723). Labels stay canonical minima, so the
    stream's final snapshot equals from-scratch CC over all edges seen
    (pinned by tests/test_streaming.py::test_streaming_cc_parity) and
    the fold is insensitive to batch order.

    Returns the DataStreamWriter — caller sets checkpointLocation /
    trigger and calls .start(). Use trigger(availableNow=True) to fold
    a backlog and stop."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        cc_fold_batch(batch_df, batch_id, root, src, dst)

    return edge_stream.writeStream.foreachBatch(fold)


def cc_fold_batch(
    batch_df: DataFrame, batch_id: int, root: str, src: str = "src", dst: str = "dst"
) -> None:
    """One streaming_cc microbatch fold, REPLAY-IDEMPOTENT (ADVICE r4):
    after a crash between the parquet write and the stream-checkpoint
    commit, Spark replays the same batch_id — so the fold only ever
    reads snapshot versions strictly below its own batch_id (never the
    snapshot this very batch may have half-written), making the
    replayed overwrite a clean recompute of the identical result."""
    from .components import incremental_cc

    spark = batch_df.sparkSession
    latest = latest_cc_labels(spark, root, before=batch_id)
    prev = latest[1] if latest is not None else None
    out = incremental_cc(prev, batch_df, src, dst)
    out.write.mode("overwrite").parquet(f"{root}/labels_v{batch_id}")


def running_ages(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator: per-key running lifetime stats."""
    return (
        events.groupBy(F.col(key_col).cast("long").alias("user_id"))
        .applyInPandasWithState(
            _ages_fn,
            outputStructType=AGE_OUTPUT,
            stateStructType=AGE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_hll_registers(spark, root: str, before: int | None = None):
    """(version, registers DataFrame) of the newest COMPLETE HLL
    register snapshot under ``root`` written by streaming_hll, or None
    — the same _SUCCESS/before contract as latest_cc_labels."""
    versions = _complete_versions(spark, root, "registers_v", before)
    if not versions:
        return None
    best = versions[-1]
    return best, spark.read.parquet(f"{root}/registers_v{best}")


def hll_fold_batch(
    batch_df: DataFrame, batch_id: int, root: str, value_col: str, b: int = 6
) -> None:
    """One streaming_hll microbatch fold: build the batch's registers,
    per-bucket-MAX them into the previous snapshot, write
    ``registers_v{batch_id}``.  REPLAY-IDEMPOTENT like cc_fold_batch:
    only snapshots strictly below batch_id are read, so a replayed
    batch recomputes the identical merge instead of consuming its own
    half-written output."""
    from .sketch import hll_build, hll_merge

    spark = batch_df.sparkSession
    new = hll_build(batch_df, value_col, b=b)
    latest = latest_hll_registers(spark, root, before=batch_id)
    merged = new if latest is None else hll_merge(latest[1], new)
    merged.write.mode("overwrite").parquet(f"{root}/registers_v{batch_id}")


def streaming_hll(
    value_stream: DataFrame, root: str, value_col: str, b: int = 6
):
    """Continuous distinct-count maintenance: each microbatch's HLL
    registers MAX-merge into the persisted snapshot — because the
    merge is the sketch's own associative/commutative/idempotent
    fold, the final registers equal a from-scratch build over every
    row seen, in ANY batch split (pinned by
    tests/test_streaming.py::test_streaming_hll_parity), and replays
    cannot inflate the estimate (MAX is idempotent — the property
    that makes HLL, unlike a raw counter, safe under at-least-once
    delivery).  Returns the DataStreamWriter — caller sets
    checkpointLocation / trigger and calls .start()."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        hll_fold_batch(batch_df, batch_id, root, value_col, b)

    return value_stream.writeStream.foreachBatch(fold)


def latest_dedup_index(spark, root: str, before: int | None = None):
    """(version, shingles DF, banded DF) of the newest COMPLETE
    MinHash index snapshot under ``root`` written by
    streaming_dedup_index, or None.  Complete = _SUCCESS present in
    BOTH parquet directories of the version (the banded table is
    written last, so its marker is the commit point); ``before``
    gives the same replay-idempotence contract as latest_cc_labels."""
    versions = _complete_versions(
        spark, root, "index_v", before, subpaths=("shingles", "banded")
    )
    if not versions:
        return None
    best = versions[-1]
    return (
        best,
        spark.read.parquet(f"{root}/index_v{best}/shingles"),
        spark.read.parquet(f"{root}/index_v{best}/banded"),
    )


def dedup_fold_batch(
    batch_df,
    batch_id: int,
    root: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One streaming dedup-index microbatch: fold the batch into the
    newest complete index snapshot (versions strictly below batch_id —
    replay-idempotent like cc_fold_batch), persist the updated
    shingle/banded index under ``index_v{batch_id}`` and the pairs the
    batch surfaced under ``pairs_v{batch_id}``."""
    from .dedup import near_duplicates_fold

    spark = batch_df.sparkSession
    latest = latest_dedup_index(spark, root, before=batch_id)
    if latest is None:
        sh_prev = spark.createDataFrame([], "id long, shingle string")
        b_prev = spark.createDataFrame([], "id long, band int, bucket long")
    else:
        _, sh_prev, b_prev = latest
    pairs, all_sh, all_banded = near_duplicates_fold(
        sh_prev, b_prev, batch_df, id_col=id_col, text_col=text_col,
        threshold=threshold,
    )
    pairs.write.mode("overwrite").parquet(f"{root}/pairs_v{batch_id}")
    all_sh.write.mode("overwrite").parquet(f"{root}/index_v{batch_id}/shingles")
    all_banded.write.mode("overwrite").parquet(f"{root}/index_v{batch_id}/banded")


def streaming_dedup_index(
    doc_stream,
    root: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous dedup-index maintenance: each microbatch of crawled
    documents folds into the persisted MinHash-LSH index via
    dedup.near_duplicates_fold — batch-sized shingling + one probe
    join per batch, never a corpus re-scan — and emits the near-dup
    pairs the batch introduced.  The final index equals a from-scratch
    minhash_index over every doc seen, and the union of per-batch
    pair snapshots equals from-scratch near_duplicates
    (pre_collapse=False) over the whole corpus, in ANY batch split
    (pinned by tests/test_streaming.py::test_streaming_dedup_index_parity).

    Returns the DataStreamWriter — caller sets checkpointLocation /
    trigger and calls .start()."""
    def fold(batch_df, batch_id: int) -> None:
        dedup_fold_batch(batch_df, batch_id, root, threshold, id_col, text_col)

    return doc_stream.writeStream.foreachBatch(fold)


def latest_pagerank(spark, root: str, before: int | None = None):
    """(version, ranks DataFrame) of the newest COMPLETE PageRank
    snapshot under ``root`` written by streaming_pagerank, or None —
    same _SUCCESS/before contract as latest_cc_labels."""
    versions = _complete_versions(spark, root, "ranks_v", before)
    if not versions:
        return None
    best = versions[-1]
    return best, spark.read.parquet(f"{root}/ranks_v{best}")


def pr_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-9,
) -> None:
    """One streaming_pagerank microbatch: persist the batch's edges
    under ``edges_v{batch_id}``, re-solve PageRank over ALL edge
    batches seen so far WARM-STARTED from the previous snapshot's
    ranks (the measured 1.9x fold-in win — a 1% edge delta needs a
    handful of refresh iterations, not a cold converge), and write
    ``ranks_v{batch_id}``.

    REPLAY-IDEMPOTENT like cc_fold_batch: only snapshots strictly
    below batch_id are read (edges and ranks both), so a crash
    between the two writes replays into a clean identical recompute.
    Unlike CC's label fold-in, rank mass redistributes globally, so
    the edge history must be retained — per-batch parquet keeps the
    retention append-only and the re-read is a multi-path scan, not
    a growing union plan.
    """
    from .pagerank import pagerank

    spark = batch_df.sparkSession
    batch_df.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).write.mode("overwrite").parquet(f"{root}/edges_v{batch_id}")
    evs = _complete_versions(spark, root, "edges_v", before=batch_id)
    paths = [f"{root}/edges_v{v}" for v in evs] + [f"{root}/edges_v{batch_id}"]
    all_edges = spark.read.parquet(*paths)
    latest = latest_pagerank(spark, root, before=batch_id)
    ranks = pagerank(
        all_edges,
        damping=damping,
        tol=tol,
        warm_start=latest[1] if latest is not None else None,
    )
    ranks.write.mode("overwrite").parquet(f"{root}/ranks_v{batch_id}")


def streaming_pagerank(
    edge_stream: DataFrame,
    root: str,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-9,
):
    """Continuous PageRank maintenance over an edge stream: every
    microbatch folds into the persisted ranks via warm-started
    re-solve over the retained edge history — each snapshot agrees
    with a from-scratch solve over all edges seen to within the
    convergence tolerance (pinned by
    tests/test_streaming.py::test_streaming_pagerank_parity), and
    replayed batches recompute identical snapshots.  Returns the
    DataStreamWriter — caller sets checkpointLocation / trigger and
    calls .start(); trigger(availableNow=True) folds a backlog and
    stops."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        pr_fold_batch(batch_df, batch_id, root, src, dst, damping, tol)

    return edge_stream.writeStream.foreachBatch(fold)


def merge_session_tables(sessions: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Merge overlapping-or-touching sessions of one key (classic
    gaps-and-islands): sessions sorted by start break into islands
    where a start exceeds the running max of prior ends; each island
    collapses to (min start, max end, summed n_events).

    This is the fold algebra of incremental sessionization: a session
    [first, last+gap] from one microbatch touches a session from
    another exactly when some event of one is within ``gap`` of an
    event of the other, so interval merging reproduces global
    sessionization REGARDLESS of how events were split across batches
    (even out of order) — order-insensitive, associative, idempotent.
    One shuffle on the key; state is one row per open session."""
    w = Window.partitionBy(key_col).orderBy("session_start", "session_end")
    prev_end = F.max("session_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("session_start") > prev_end), 1
    ).otherwise(0)
    sid = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        sessions.withColumn("sid", sid)
        .groupBy(key_col, "sid")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("sid")
    )


def latest_sessions(spark, root: str, before: int | None = None):
    """(version, sessions DataFrame) of the newest COMPLETE session
    snapshot under ``root``, or None — same _SUCCESS / strictly-below
    replay contract as every fold here."""
    versions = _complete_versions(spark, root, "sessions_v", before)
    if not versions:
        return None
    best = versions[-1]
    return best, spark.read.parquet(f"{root}/sessions_v{best}")


def session_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> None:
    """One incremental-sessionization microbatch fold, REPLAY-
    IDEMPOTENT: sessionize the batch alone, union with the newest
    snapshot strictly below this batch_id, interval-merge, write
    ``root/sessions_v{batch_id}``. Because the merge algebra is
    order-insensitive, the final snapshot equals from-scratch
    sessionize() over all events seen (test_streaming parity)."""
    spark = batch_df.sparkSession
    batch_s = sessionize(batch_df, key_col=key_col, ts_col=ts_col, gap=gap)
    latest = latest_sessions(spark, root, before=batch_id)
    allcat = batch_s if latest is None else latest[1].unionByName(batch_s)
    merged = merge_session_tables(allcat, key_col)
    merged.write.mode("overwrite").parquet(f"{root}/sessions_v{batch_id}")


def streaming_sessions(
    event_stream: DataFrame,
    root: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
):
    """Continuous sessionization fold: each microbatch's sessions
    interval-merge into the persisted session table (the unbounded-
    retention complement of sessionize(watermark=...), which must
    close state; here closed sessions can still reopen if a late
    event bridges them — correct for crawl/event archives folded in
    arbitrary order). Returns the DataStreamWriter."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        session_fold_batch(batch_df, batch_id, root, key_col, ts_col, gap)

    return event_stream.writeStream.foreachBatch(fold)
