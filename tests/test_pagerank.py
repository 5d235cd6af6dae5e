"""pagerank_residuals (per-iteration convergence metrics) vs a
pure-Python replay of the identical weighted update."""

from __future__ import annotations


def test_pagerank_residuals_match_pure_python(spark):
    import math

    # weighted 4-vertex graph with a dangling vertex (3)
    edges = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 3, 1.0), (2, 0, 3.0)],
        "src long, dst long, w double",
    )
    from ccl_spark.pagerank import pagerank_residuals

    got = [
        (r["iter"], r.residual_micro, r.max_delta_micro)
        for r in pagerank_residuals(edges, n_iter=6, weight="w")
        .orderBy("iter")
        .collect()
    ]
    adj = {0: [(1, 2.0), (2, 1.0)], 1: [(2, 1.0)], 2: [(3, 1.0), (0, 3.0)]}
    deg = {u: sum(w for _, w in vs) for u, vs in adj.items()}
    n, d = 4, 0.85
    r = {v: 1.0 / n for v in range(4)}
    exp = []
    for k in range(1, 7):
        dang = sum(rv for v, rv in r.items() if v not in deg)
        c = {v: 0.0 for v in range(4)}
        for u, vs in adj.items():
            for v, w in vs:
                c[v] += r[u] * w / deg[u]
        r_new = {v: (1 - d) / n + d * (c[v] + dang / n) for v in range(4)}
        deltas = [
            int(math.floor(abs(r_new[v] - r[v]) * 1e6 + 0.5)) for v in range(4)
        ]
        exp.append((k, sum(deltas), max(deltas)))
        r = r_new
    assert got == exp
    # residuals must be monotone-ish decreasing overall (power iteration)
    assert got[-1][1] < got[0][1]


def test_pagerank_residuals_empty_and_bad_args(spark):
    import pytest

    from ccl_spark.pagerank import pagerank_residuals

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_residuals(empty, n_iter=2).count() == 0
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_residuals(e, n_iter=0)
