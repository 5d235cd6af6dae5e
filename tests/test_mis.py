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
