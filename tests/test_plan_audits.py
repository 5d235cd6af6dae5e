"""Physical-plan audits as tests — the scale discipline enforced, not
just documented (ARCHITECTURE.md "Plan audits"):

- predicate + projection pushdown reach the parquet scan;
- the extraction/graph hot paths contain NO row-at-a-time Python
  (``BatchEvalPython``) — only whole-stage-codegen JVM stages and,
  where data must cross into numpy, Arrow ``mapInPandas``;
- the CC broadcast-frontier path produces a real BroadcastExchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.cc import connected_components
from ccl_spark.datagen import generate_pages
from ccl_spark.edges import page_edges
from ccl_spark.pagerank import pagerank


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_pushdown(spark, tmp_path):
    path = str(tmp_path / "edges_pq")
    spark.createDataFrame(
        [(i, i + 1, i % 7) for i in range(100)], "src long, dst long, salt int"
    ).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("src") == 5).select("dst")
    plan = _executed(df)
    assert "PushedFilters: [IsNotNull(src), EqualTo(src,5)]" in plan
    # column pruning: the scan reads only the filter + projection
    # columns, never the unused salt column
    assert "ReadSchema: struct<src:bigint,dst:bigint>" in plan
    assert "salt" not in plan


def test_extraction_is_jvm_only(spark):
    pages = generate_pages(spark, 50, seed=3)
    plan = _executed(page_edges(pages))
    # the extraction path must never fall back to row-at-a-time Python
    assert "BatchEvalPython" not in plan
    # link extraction itself is a JVM Generate over regexp_extract_all
    assert "regexp_extract_all" in plan
    # the only Python in the plan is the Arrow datagen synthesis stage
    assert plan.count("MapInPandas") == 1


def test_graph_iteration_plans_no_row_python(spark):
    e = spark.createDataFrame(
        [(i, (i + 1) % 30) for i in range(30)], "src long, dst long"
    )
    labels = connected_components(e, local_finish_threshold=0)
    ranks = pagerank(e, tol=0.0, max_iter=2)
    for df in (labels, ranks):
        assert "BatchEvalPython" not in _executed(df)


def test_cc_small_frontier_broadcasts(spark):
    """End-to-end: a tiny graph's star rounds run with the mins table
    broadcast (frontier below broadcast_threshold)."""
    from ccl_spark.cc import large_star

    e = spark.createDataFrame([(i, i + 1) for i in range(20)], "u long, v long")
    plan = _executed(large_star(e, broadcast_mins=True))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_asof_join_single_shuffle_no_python(spark):
    """asof_join's plan promise: ONE hash exchange (the keyed window),
    no pair-explosion join, no Python stage."""
    from ccl_spark.asof import asof_join

    left = spark.range(1000).selectExpr("id % 50 as k", "id as t", "id * 2 as x")
    right = spark.range(300).selectExpr(
        "id % 50 as k", "id * 3 as t", "cast(id as double) as v"
    )
    plan = _executed(asof_join(left, right, on="t", by="k"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
