"""Luby MIS vs an independent hashlib.md5 replay + set properties."""

from __future__ import annotations

import hashlib
import random

from ccl_spark.mis import maximal_independent_set


def _p(v, salt):
    return int(hashlib.md5(f"{v},{salt}".encode()).hexdigest()[:13], 16)


def _py_mis(edges, salt):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    undecided = set(adj)
    mis: set[int] = set()
    while undecided:
        winners = {
            v
            for v in undecided
            if all(
                (_p(u, salt), u) > (_p(v, salt), v)
                for u in adj[v]
                if u in undecided
            )
        }
        mis |= winners
        removed = set(winners)
        for w in winners:
            removed |= adj[w]
        undecided -= removed
    return mis


def test_mis_matches_python_replay(spark):
    rng = random.Random(53)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(140)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"] for r in maximal_independent_set(df).collect()}
    assert got == _py_mis(edges, "mis")


def test_mis_independence_and_maximality(spark):
    rng = random.Random(59)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"] for r in maximal_independent_set(df).collect()}
    und = {(a, b) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    # independent: no two members adjacent
    for v in got:
        assert not (adj[v] & got)
    # maximal: every non-member has a member neighbor
    for v in adj:
        if v not in got:
            assert adj[v] & got


def test_mis_star_and_selfloops(spark):
    # star: the center has the most neighbors; whichever side wins,
    # the result is a valid MIS; self-loops must be ignored
    edges = [(0, i) for i in range(1, 6)] + [(3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["vertex"] for r in maximal_independent_set(df).collect()}
    assert got == _py_mis(edges, "mis")
    assert got == {0} or got == set(range(1, 6))


def _matching_oracle(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Exact replay of the Israeli-Itai rounds with md5 priorities."""
    import hashlib

    live = {
        (min(u, v), max(u, v))
        for u, v in edges
        if u != v
    }
    pri = {
        e: int(hashlib.md5(f"{e[0]},{e[1]},mm".encode()).hexdigest()[:13], 16)
        for e in live
    }
    matched: set[tuple[int, int]] = set()
    while live:
        winners = set()
        for e in live:
            key = (pri[e], e[0], e[1])
            if all(
                (pri[f], f[0], f[1]) >= key
                for f in live
                if f != e and (set(f) & set(e))
            ):
                winners.add(e)
        matched |= winners
        mv = {x for e in winners for x in e}
        live = {e for e in live if not (set(e) & mv)}
    return matched


def test_maximal_matching_replays_oracle(spark):
    import random

    from ccl_spark.mis import maximal_matching

    rng = random.Random(11)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.v) for r in maximal_matching(df).collect()}
    assert got == _matching_oracle(edges)
    # matching property: no vertex appears twice
    flat = [x for e in got for x in e]
    assert len(flat) == len(set(flat))
    # maximality: every input edge touches a matched vertex
    mv = set(flat)
    for u, v in edges:
        if u != v:
            assert u in mv or v in mv


def test_maximal_matching_path(spark):
    from ccl_spark.mis import maximal_matching

    # path 0-1-2: exactly one edge can match; result must be maximal
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {(r.u, r.v) for r in maximal_matching(df).collect()}
    assert got in ({(0, 1)}, {(1, 2)})


def test_vertex_cover_covers_every_edge(spark):
    import random

    from ccl_spark.mis import vertex_cover

    rng = random.Random(9)
    edges = [
        (a, b) for a in range(40) for b in range(a + 1, 40) if rng.random() < 0.08
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    cover = {r.vertex for r in vertex_cover(df).collect()}
    # covering property: every edge has an endpoint in the cover
    assert all(a in cover or b in cover for a, b in edges)
    # 2-approximation: |cover| = 2|matching| <= 2 * |min cover|; the
    # trivial bound |cover| <= |V| and evenness certify the shape
    assert len(cover) % 2 == 0
