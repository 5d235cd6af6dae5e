"""Structured Streaming operators, driven deterministically with a
file source + availableNow trigger + memory sink."""

from __future__ import annotations

import pytest

from ccl_spark.streaming import running_ages, windowed_activity


@pytest.fixture()
def event_stream(spark, tmp_path):
    rows = [
        (1, "2026-01-01 00:10:00"),
        (1, "2026-01-01 00:40:00"),
        (1, "2026-01-02 05:00:00"),
        (2, "2026-01-01 00:20:00"),
        (2, "2026-01-01 03:20:00"),
        # gap-y user: active Jan 1 and Jan 30 only — n_days must be the
        # distinct-day count (2), not the calendar span (30)
        (3, "2026-01-01 12:00:00"),
        (3, "2026-01-30 12:00:00"),
        (3, "2026-01-30 13:00:00"),
    ]
    src = tmp_path / "events"
    df = spark.createDataFrame(rows, "user_id long, ts_s string").selectExpr(
        "user_id", "cast(ts_s as timestamp) as ts"
    )
    df.write.parquet(str(src))
    return spark.readStream.schema("user_id long, ts timestamp").parquet(str(src))


def _run(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_windowed_activity(spark, event_stream, tmp_path):
    out = windowed_activity(event_stream, window="1 hour", watermark="2 hours")
    # update mode: append-mode windows only emit once the watermark
    # passes them, which a single availableNow batch never does
    name = _run(out, "win_act", "update")
    rows = {
        (str(r.window_start), r.user_id): r.n_events
        for r in spark.sql(f"select * from {name}").collect()
    }
    assert rows[("2026-01-01 00:00:00", 1)] == 2
    assert rows[("2026-01-01 00:00:00", 2)] == 1
    assert rows[("2026-01-01 03:00:00", 2)] == 1
    assert rows[("2026-01-02 05:00:00", 1)] == 1


def test_running_ages_stateful(spark, event_stream, tmp_path):
    out = running_ages(event_stream)
    name = _run(out, "ages_state", "update")
    rows = {r.user_id: r for r in spark.sql(f"select * from {name}").collect()}
    assert rows[1].n_events == 3 and rows[1].n_days == 2
    assert rows[2].n_events == 2 and rows[2].n_days == 1
    # distinct-day semantics on gap-y data: Jan 1 + Jan 30 = 2 days, not 30
    assert rows[3].n_events == 3 and rows[3].n_days == 2
    assert str(rows[1].first_seen) == "2026-01-01 00:10:00"
    assert str(rows[1].last_seen) == "2026-01-02 05:00:00"
    # parity with the batch `ages` definition (countDistinct(to_date(ts)))
    import pyspark.sql.functions as F

    batch = (
        spark.read.parquet(str(tmp_path / "events"))
        .groupBy("user_id")
        .agg(F.countDistinct(F.to_date("ts")).alias("age"))
        .collect()
    )
    for r in batch:
        assert rows[r.user_id].n_days == r.age, f"user {r.user_id}"


def test_streaming_dedup(spark, tmp_path):
    from ccl_spark.dedup import exact_duplicates
    from ccl_spark.streaming import streaming_dedup

    rows = [
        (0, "alpha beta", "2026-01-01 00:00:00"),
        (1, "gamma", "2026-01-01 00:01:00"),
        (2, "alpha beta", "2026-01-01 00:02:00"),  # dup of 0, in horizon
        (3, "delta", "2026-01-01 00:03:00"),
        (4, "gamma", "2026-01-01 00:04:00"),  # dup of 1
    ]
    src = tmp_path / "docs"
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string").selectExpr(
        "doc_id", "text", "cast(ts_s as timestamp) as ts"
    )
    df.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        str(src)
    )
    out = streaming_dedup(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.sql("select * from sdedup").collect()}
    # one survivor per distinct text; within one microbatch the kept row
    # of a dup group is arbitrary, so assert group-level survival
    assert len(kept) == 3 and 3 in kept
    assert len(kept & {0, 2}) == 1 and len(kept & {1, 4}) == 1

    # batch mode: deterministic earliest-(ts, id) winner, keep set equal
    # to exact_duplicates' min-id representatives on this input
    batch = streaming_dedup(spark.read.parquet(str(src)))
    got = {(r.doc_id, r.text) for r in batch.select("doc_id", "text").collect()}
    assert got == {(0, "alpha beta"), (1, "gamma"), (3, "delta")}
    dup_groups = exact_duplicates(spark.read.parquet(str(src))).collect()
    keepers = {r.keep_doc_id for r in dup_groups}
    assert keepers <= {r[0] for r in got}


def test_streaming_cc_parity(spark, tmp_path):
    """Crawl-snapshot fold-in: stream the edge set in 3 file-batches
    through streaming_cc (foreachBatch incremental_cc); the final
    label snapshot must equal from-scratch CC over ALL edges, and
    intermediate snapshots must exist per processed batch."""
    from ccl_spark.cc import connected_components
    from ccl_spark.streaming import latest_cc_labels, streaming_cc

    # a chain split across batches so components MERGE at fold time:
    # batch files each hold a third of a 30-vertex path + a separate clique
    edges = [(i, i + 1) for i in range(29)] + [(100, 101), (101, 102), (100, 102)]
    src_dir = tmp_path / "edges_in"
    src_dir.mkdir()
    for b in range(3):
        chunk = [e for i, e in enumerate(edges) if i % 3 == b]
        spark.createDataFrame(chunk, "src long, dst long").coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    root = str(tmp_path / "cc_snapshots")
    q = (
        streaming_cc(stream, root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    latest = latest_cc_labels(spark, root)
    assert latest is not None
    version, labels = latest
    assert version >= 2  # one snapshot per file-batch
    got = {r.vertex: r.component for r in labels.collect()}
    exp = {
        r.vertex: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == exp


def test_streaming_cc_replay_idempotent(spark, tmp_path):
    """ADVICE r4: a replayed microbatch (crash between the snapshot
    write and the stream-checkpoint commit) must fold from versions
    strictly below its own batch_id — never from the snapshot it wrote
    itself — so the replay recomputes the identical result instead of
    reading its own output."""
    from ccl_spark.cc import connected_components
    from ccl_spark.streaming import cc_fold_batch, latest_cc_labels

    root = str(tmp_path / "cc_replay")
    b0 = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    b1 = spark.createDataFrame([(2, 3), (10, 11)], "src long, dst long")
    cc_fold_batch(b0, 0, root)
    cc_fold_batch(b1, 1, root)
    before = {r.vertex: r.component for r in latest_cc_labels(spark, root)[1].collect()}

    # simulate the crash-replay of batch 1: same batch_id, same data
    cc_fold_batch(b1, 1, root)
    version, labels = latest_cc_labels(spark, root)
    assert version == 1
    got = {r.vertex: r.component for r in labels.collect()}
    assert got == before
    exp = {
        r.vertex: r.component
        for r in connected_components(
            spark.createDataFrame(
                [(0, 1), (1, 2), (2, 3), (10, 11)], "src long, dst long"
            )
        ).collect()
    }
    assert got == exp


def test_sessionize_batch_gap_semantics(spark):
    """Inclusive session boundary: an event exactly `gap` after the
    previous one still MERGES (Spark merges touching ranges); an event
    `gap`+1s later starts a new session; session_end = last + gap."""
    import pyspark.sql.functions as F

    from ccl_spark.streaming import sessionize

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 10:40:00"),  # exactly 30min after 10:10 -> merges
        (1, "2024-01-01 11:10:01"),  # 30min 1s after 10:40 -> new session
        (2, "2024-01-01 09:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    out = sessionize(ev, gap="30 minutes").select(
        "user_id",
        F.date_format("session_start", "HH:mm").alias("s"),
        F.date_format("session_end", "HH:mm").alias("e"),
        "n_events",
    )
    got = {(r["user_id"], r["s"]): (r["e"], r["n_events"]) for r in out.collect()}
    assert got == {
        (1, "10:00"): ("11:10", 3),
        (1, "11:10"): ("11:40", 1),
        (2, "09:00"): ("09:30", 1),
    }


def test_streaming_hll_parity(spark, tmp_path):
    """Distinct-count fold-in: stream values in 3 file-batches with
    overlap between batches; the folded registers (and estimate) must
    equal a from-scratch build over the union — MAX-merge is
    idempotent, so overlapping/replayed rows cannot inflate it."""
    from ccl_spark.sketch import hll_build, hll_estimate
    from ccl_spark.streaming import latest_hll_registers, streaming_hll

    src_dir = tmp_path / "vals_in"
    src_dir.mkdir()
    chunks = [range(0, 500), range(400, 900), range(800, 1200)]  # overlaps
    for i, ch in enumerate(chunks):
        spark.createDataFrame([(v,) for v in ch], "v long").coalesce(1).write.parquet(
            str(src_dir / f"b{i}")
        )
    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    root = str(tmp_path / "hll_snapshots")
    q = (
        streaming_hll(stream, root, "v")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    latest = latest_hll_registers(spark, root)
    assert latest is not None
    _, regs = latest
    whole = spark.createDataFrame([(v,) for v in range(1200)], "v long")
    direct = hll_build(whole, "v")
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert (
        hll_estimate(regs).first()["estimate"]
        == hll_estimate(direct).first()["estimate"]
    )


def test_streaming_dedup_index_parity(spark, tmp_path):
    """Continuous dedup-index maintenance: stream a corpus in 3
    file-batches; the final index snapshot must equal a from-scratch
    minhash_index over all docs, and the union of per-batch pair
    snapshots must equal from-scratch near_duplicates
    (pre_collapse=False) over the whole corpus."""
    from pyspark.sql import functions as F

    from ccl_spark.dedup import minhash_index, near_duplicates
    from ccl_spark.streaming import latest_dedup_index, streaming_dedup_index

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    texts = {
        1: base + " a b",
        2: base + " c d",
        3: "p q r s t u v w x y z",
        4: base + " e f",
        5: base,
        6: "k l m n o p q r s",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    root = str(tmp_path / "dedup_snapshots")
    q = (
        streaming_dedup_index(stream, root, threshold=0.5)
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    latest = latest_dedup_index(spark, root)
    assert latest is not None
    _, sh_final, banded_final = latest
    sh_scratch, banded_scratch = minhash_index(docs)
    assert sh_final.count() == sh_scratch.count()
    assert sh_final.exceptAll(sh_scratch).count() == 0
    assert banded_final.count() == banded_scratch.count()
    assert banded_final.exceptAll(banded_scratch).count() == 0

    streamed_pairs = (
        spark.read.parquet(f"{root}/pairs_v*")
        .select("id_a", "id_b", "jaccard")
        .collect()
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in streamed_pairs}
    assert len(got) == len(streamed_pairs)  # no pair reported twice
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_duplicates(docs, threshold=0.5, pre_collapse=False).collect()
    }
    assert got == full and got


def test_streaming_pagerank_parity(spark, tmp_path):
    """Edge stream folds into persisted ranks via warm-started
    re-solve; the final snapshot must match from-scratch PageRank
    over ALL edges to within convergence tolerance."""
    import random

    from ccl_spark.pagerank import pagerank
    from ccl_spark.streaming import latest_pagerank, streaming_pagerank

    rng = random.Random(5)
    n = 40
    edges = [(a, b) for a in range(n) for b in range(n) if a != b and rng.random() < 0.08]
    src_dir = tmp_path / "edges_in"
    src_dir.mkdir()
    for b in range(3):
        chunk = [e for i, e in enumerate(edges) if i % 3 == b]
        spark.createDataFrame(chunk, "src long, dst long").coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    root = str(tmp_path / "pr_snapshots")
    q = (
        streaming_pagerank(stream, root, tol=1e-10)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    latest = latest_pagerank(spark, root)
    assert latest is not None
    version, ranks = latest
    assert version >= 2
    got = {r.vertex: r.rank for r in ranks.collect()}
    exp = {
        r.vertex: r.rank
        for r in pagerank(
            spark.createDataFrame(edges, "src long, dst long"), tol=1e-10
        ).collect()
    }
    assert set(got) == set(exp)
    assert max(abs(got[v] - exp[v]) for v in exp) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pr_fold_batch_replay_idempotent(spark, tmp_path):
    """Replaying a microbatch (crash between parquet write and stream
    commit) recomputes the identical snapshot instead of consuming its
    own half-written output."""
    from ccl_spark.streaming import latest_pagerank, pr_fold_batch

    root = str(tmp_path / "pr")
    b0 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    b1 = spark.createDataFrame([(3, 1), (2, 1)], "src long, dst long")
    pr_fold_batch(b0, 0, root, tol=1e-10)
    pr_fold_batch(b1, 1, root, tol=1e-10)
    v1, r1 = latest_pagerank(spark, root)
    first = {r.vertex: r.rank for r in r1.collect()}
    pr_fold_batch(b1, 1, root, tol=1e-10)  # replay
    v2, r2 = latest_pagerank(spark, root)
    second = {r.vertex: r.rank for r in r2.collect()}
    assert v1 == v2 == 1
    assert first == second


def test_session_fold_parity_and_replay(spark, tmp_path):
    """Incremental sessionization: fold events in 3 NON-time-ordered
    batches; the final snapshot equals from-scratch sessionize() over
    all events; replaying a batch (crash between parquet write and
    checkpoint commit) leaves the result unchanged."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ccl_spark.streaming import (
        latest_sessions,
        merge_session_tables,
        session_fold_batch,
        sessionize,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions (25-min steps merge; a 31-min hole breaks)
    for i in range(4):
        rows.append((1, base + dt.timedelta(minutes=25 * i)))
    rows.append((1, base + dt.timedelta(minutes=25 * 3 + 31)))
    # user 2: events exactly 30 minutes apart — the gap boundary
    rows.append((2, base))
    rows.append((2, base + dt.timedelta(minutes=30)))
    # user 3: single event
    rows.append((3, base + dt.timedelta(hours=5)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev, gap="30 minutes").collect()
    )

    root = str(tmp_path / "sess")
    for b in range(3):
        batch = ev.filter(F.pmod(F.col("user_id") + F.xxhash64("ts"), F.lit(3)) == b)
        session_fold_batch(batch, b, root)
    _, final = latest_sessions(spark, root)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in final.collect()
    )
    assert got == want

    # replay batch 1: fold must only read snapshots strictly below 1
    batch1 = ev.filter(F.pmod(F.col("user_id") + F.xxhash64("ts"), F.lit(3)) == 1)
    session_fold_batch(batch1, 1, root)
    # ...and the final (v2) snapshot still reflects everything
    v, final2 = latest_sessions(spark, root)
    assert v == 2
    got2 = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in final2.collect()
    )
    assert got2 == want

    # merge is idempotent: re-merging the merged table is a no-op
    m1 = merge_session_tables(final2)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, final2.collect()))
