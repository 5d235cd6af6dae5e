from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.dedup import contamination
from ccl_spark.edges import snapshot_diff


def test_contamination_detects_embedded_bench(spark):
    body = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    docs = spark.createDataFrame(
        [
            (1, "pre " + body + " post"),  # contains the full bench item
            (2, body.replace("w5", "zz")),  # broken run: no shared 8-gram
            (3, "q r s t u v w x y z a b c"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, body)], "bench_id long, text string")
    rows = {r.doc_id: r for r in contamination(docs, bench, n=8).collect()}
    # bench has 12-8+1 = 5 distinct 8-grams; doc 1 contains all of them
    assert rows[1].n_shared == 5 and rows[1].bench_frac == 1.0
    assert 2 not in rows and 3 not in rows


def test_contamination_partial_overlap(spark):
    body = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8 tail tail")],  # only the first 8-gram
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, body)], "bench_id long, text string")
    r = contamination(docs, bench, n=8).collect()[0]
    assert r.n_shared == 1 and r.bench_frac == round(1 / 5, 6)


def test_snapshot_diff_counts_and_jaccard(spark):
    a = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)], "src long, dst long"
    )
    b = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 13), (3, 30)], "src long, dst long"
    )
    rows = {r.src: r for r in snapshot_diff(a, b).collect()}
    assert rows[1].n_stable == 2 and rows[1].n_added == 1 and rows[1].n_removed == 1
    assert rows[1].jaccard == 0.5
    assert rows[2].n_removed == 1 and rows[2].n_added == 0 and rows[2].jaccard == 0.0
    assert rows[3].n_added == 1 and rows[3].jaccard == 0.0
    assert set(rows) == {1, 2, 3}


def test_snapshot_diff_dedupes_multiedges(spark):
    a = spark.createDataFrame([(1, 10), (1, 10)], "src long, dst long")
    b = spark.createDataFrame([(1, 10)], "src long, dst long")
    r = snapshot_diff(a, b).collect()[0]
    assert r.n_stable == 1 and r.n_added == 0 and r.n_removed == 0
    assert r.jaccard == 1.0
