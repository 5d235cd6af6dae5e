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
