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


def test_range_join_banded(spark):
    from ccl_spark.asof import range_join

    left = spark.createDataFrame([(1, 100, "L1"), (1, 205, "L2"), (2, 50, "L3")], "k long, t long, who string")
    right = spark.createDataFrame(
        [(1, 40, "a"), (1, 95, "b"), (1, 100, "c"), (1, 150, "d"), (2, 49, "e"), (3, 50, "f")],
        "k long, t long, name string",
    )
    # band [t-60, t] inclusive both ends
    out = range_join(left, right, on="t", by="k", lower=-60, upper=0)
    got = sorted((r.who, r.name_r) for r in out.collect())
    assert got == [
        ("L1", "a"), ("L1", "b"), ("L1", "c"),  # 40, 95, 100 in [40, 100]
        ("L2", "d"),                             # 150 in [145, 205]
        ("L3", "e"),                             # 49 in [-10, 50]; k=3 never joins
    ]
    # brute-force parity on a pseudo-random instance (bucket-boundary cases)
    import itertools
    lrows = [(i % 5, (i * 37) % 400) for i in range(60)]
    rrows = [(i % 5, (i * 23) % 400) for i in range(80)]
    exp = sorted(
        (lk, lt_, rt_)
        for (lk, lt_), (rk, rt_) in itertools.product(lrows, rrows)
        if lk == rk and lt_ - 45 <= rt_ <= lt_ + 45
    )
    ldf = spark.createDataFrame(lrows, "k long, t long")
    rdf = spark.createDataFrame(rrows, "k long, t long")
    got2 = sorted(
        (r.k, r.t, r.t_r)
        for r in range_join(ldf, rdf, on="t", by="k", lower=-45, upper=45).collect()
    )
    assert got2 == exp


def test_asof_join_null_in_matched_row_stays_null(spark):
    """ASOF semantics (ADVICE r3): a NULL field in the LATEST matching
    right row must come through as NULL — not be backfilled from an
    older right row — and multiple right columns must always come from
    the SAME matched row (row atomicity)."""
    left = spark.createDataFrame([(1, 100), (1, 300)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 50, 1.0, "old"), (1, 200, None, "new")],
        "k long, t long, v double, s string",
    )
    got = {
        r.t: (r.v_asof, r.s_asof)
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    assert got[100] == (1.0, "old")
    # matched row is t=200: v is genuinely NULL there, s is "new" —
    # the per-column-carry bug returned (1.0, "new"), mixing rows
    assert got[300] == (None, "new")


def test_asof_join_multiple_right_cols_and_determinism(spark):
    left = spark.createDataFrame([(1, 100), (1, 300)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 50, 1.0, "x"), (1, 200, 2.0, "y")], "k long, t long, v double, s string"
    )
    rows = asof_join(left.repartition(7), right.repartition(3), on="t", by="k")
    got = sorted((r.t, r.v_asof, r.s_asof) for r in rows.collect())
    assert got == [(100, 1.0, "x"), (300, 2.0, "y")]
