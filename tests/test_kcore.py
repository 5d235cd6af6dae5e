from __future__ import annotations

from ccl_spark.kcore import k_core
from ccl_spark.triangles import clustering_coefficient


def test_k_core_peels_tail(spark):
    # K4 on {0,1,2,3} plus a pendant chain 3-4-5: the chain peels away
    # in two rounds (5 first, then 4), leaving exactly the K4 as 3-core
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(3, 4), (4, 5)], "src long, dst long")
    got = {r.vertex: r.degree for r in k_core(edges, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the max core: empty result
    assert k_core(edges, k=4).count() == 0
    # k=1 keeps everything with at least one edge
    assert k_core(edges, k=1).count() == 6


def test_k_core_cascading_peel(spark):
    # a path 0-1-2-3: 2-core is empty but only after CASCADING removal
    # (endpoints first, then the middle unravels) — requires iteration,
    # not a single degree filter
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert k_core(path, k=2).count() == 0
    # a cycle survives as its own 2-core
    cycle = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.vertex: r.degree for r in k_core(cycle, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_clustering_coefficient(spark):
    # triangle 0-1-2 plus pendant 2-3: C(0)=C(1)=1, C(2)=1/3, C(3)=0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    got = {
        r.vertex: (r.degree, r.n_triangles, r.coefficient)
        for r in clustering_coefficient(edges).collect()
    }
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)


def _peel_coreness(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent oracle: the textbook sequential min-degree peel."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core: dict[int, int] = {}
    k = 0
    live = dict(adj)
    while live:
        k = max(k, min(len(ns) for ns in live.values()))
        peel = [v for v, ns in live.items() if len(ns) <= k]
        while peel:
            v = peel.pop()
            if v not in live:
                continue
            core[v] = k
            for u in live[v]:
                live[u].discard(v)
                if u in live and len(live[u]) <= k:
                    peel.append(u)
            del live[v]
    return core


def test_core_numbers_vs_peel_oracle(spark):
    from ccl_spark.kcore import core_numbers

    # K4 + pendant chain + disjoint cycle + a bridge: mixed corenesses
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (5, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.core for r in core_numbers(df).collect()}
    assert got == _peel_coreness(edges)


def test_core_numbers_random_vs_peel(spark):
    import random

    from ccl_spark.kcore import core_numbers

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.core for r in core_numbers(df).collect()}
    assert got == _peel_coreness(edges)
