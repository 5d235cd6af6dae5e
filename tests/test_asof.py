from __future__ import annotations

from ccl_spark.asof import asof_join


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 9, "e")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 8, 80.0)],
        "k long, t long, v double",
    )
    out = {
        (r.k, r.t): (r.tag, r.v_asof)
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    assert out[(1, 10)] == ("a", 100.0)  # equal ts is inclusive
    assert out[(1, 20)] == ("b", 150.0)  # latest prior (15), not first
    assert out[(1, 5)] == ("c", None)  # before any right row
    assert out[(2, 7)] == ("d", None)  # right row is later (8 > 7)
    assert out[(3, 9)] == ("e", None)  # key absent from right
    assert len(out) == 5  # every left row survives


def test_asof_join_multiple_right_cols_and_determinism(spark):
    left = spark.createDataFrame([(1, 100), (1, 300)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 50, 1.0, "x"), (1, 200, 2.0, "y")], "k long, t long, v double, s string"
    )
    rows = asof_join(left.repartition(7), right.repartition(3), on="t", by="k")
    got = sorted((r.t, r.v_asof, r.s_asof) for r in rows.collect())
    assert got == [(100, 1.0, "x"), (300, 2.0, "y")]
