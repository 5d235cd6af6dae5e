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


def _py_temporal(contacts, source, start_t, rounds):
    arr = {source: start_t}
    for _ in range(rounds):
        new = dict(arr)
        for u, v, t in contacts:
            if u in arr and t >= arr[u] and t < new.get(v, t + 1):
                new[v] = t
        arr = new
    return arr


def test_temporal_reachability_time_respecting(spark):
    from ccl_spark.chains import temporal_reachability

    # (1,2,5) is unusable: information reaches 1 only at t=10
    contacts = [(0, 1, 10), (1, 2, 5), (1, 2, 20), (2, 3, 20), (0, 4, 3)]
    df = spark.createDataFrame(contacts, "src long, dst long, t long")
    got = {r.vertex: r.arrival for r in temporal_reachability(df, 0, max_hops=8).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 20, 4: 3}
    assert got == _py_temporal(contacts, 0, 0, 8)

    # fixpoint mode agrees and stops on its own
    conv = {
        r.vertex: r.arrival
        for r in temporal_reachability(df, 0, max_hops=None, check_every=2).collect()
    }
    assert conv == got


def test_temporal_reachability_horizon_and_guards(spark):
    import pytest

    from ccl_spark.chains import temporal_reachability

    chain = [(i, i + 1, 10 * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(chain, "src long, dst long, t long")
    # horizon 3 sees exactly 3 hops
    got = {r.vertex: r.arrival for r in temporal_reachability(df, 0, max_hops=3).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30}
    assert got == _py_temporal(chain, 0, 0, 3)
    # determinism under repartition
    again = {
        r.vertex: r.arrival
        for r in temporal_reachability(df.repartition(5), 0, max_hops=3).collect()
    }
    assert again == got

    with pytest.raises(ValueError):
        temporal_reachability(df, 0, max_hops=0)
    with pytest.raises(RuntimeError):
        temporal_reachability(df, 0, max_hops=None, max_rounds=2)
