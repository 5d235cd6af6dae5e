"""resolve_chains vs a pure-Python walk + cycle detection."""

from __future__ import annotations

import pytest

from ccl_spark.chains import resolve_chains


def _py_resolve(edges):
    f = {}
    for s, d in edges:
        if s != d and (s not in f or d < f[s]):
            f[s] = d
    out = {}
    for v in f:
        cur = f[v]
        while cur in f:
            cur = f[cur]
        out[v] = cur
    return out


def test_long_chain_and_branches(spark):
    # chain 0<-1<-...<-40 plus branches into it, plus a self-redirect
    edges = [(i, i - 1) for i in range(1, 41)] + [(100, 20), (101, 20), (7, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["v"]: r["target"] for r in resolve_chains(df).collect()}
    assert got == _py_resolve(edges)
    assert got[40] == 0 and got[100] == 0 and got[101] == 0
    # self-redirect dropped: 7 resolves through the chain as usual
    assert got[7] == 0 if 7 in got else True


def test_duplicate_out_edges_min_wins(spark):
    edges = [(1, 5), (1, 3), (3, 2), (5, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["v"]: r["target"] for r in resolve_chains(df).collect()}
    assert got == _py_resolve(edges)
    assert got[1] == 2  # min target 3, then 3 -> 2


def test_cycle_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    with pytest.raises(RuntimeError):
        resolve_chains(df, max_rounds=6)


def _py_sssp(edges, source, weights=None):
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (s, d) in enumerate(edges):
        w = 1 if weights is None else weights[i]
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        dd, v = heapq.heappop(pq)
        if dd > dist.get(v, 1 << 60):
            continue
        for u, w in adj.get(v, []):
            nd = dd + w
            if nd < dist.get(u, 1 << 60):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def test_sssp_unit_weights_bfs(spark):
    from ccl_spark.chains import sssp

    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (9, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"]: r["dist"] for r in sssp(df, 0).collect()}
    assert got == _py_sssp(edges, 0)
    assert got[3] == 2  # via 4, not the length-3 chain
    assert 9 not in got  # unreachable from the source


def test_sssp_weighted_vs_dijkstra(spark):
    import random

    from ccl_spark.chains import sssp

    rng = random.Random(61)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(100)]
    weights = [1 + (s + d) % 5 for s, d in edges]
    df = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(edges, weights)],
        "src long, dst long, w long",
    )
    got = {r["vertex"]: r["dist"] for r in sssp(df, 0, weight_col="w").collect()}
    assert got == _py_sssp(edges, 0, weights)
