from __future__ import annotations

import hashlib
import random

from ccl_spark.mst import boruvka_msf


def _md5_w(u: int, v: int) -> int:
    return int(hashlib.md5(f"{u},{v},mstw".encode()).hexdigest()[:13], 16)


def _kruskal(wedges: list[tuple[int, int, int]]) -> set[tuple[int, int, int]]:
    """Independent oracle: sequential Kruskal with union-find — a
    different algorithm than Borůvka, same unique MSF under the
    (w, u, v) total order."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int, int]] = set()
    for w, u, v in sorted((w, u, v) for u, v, w in wedges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def test_boruvka_matches_kruskal_md5_weights(spark):
    rng = random.Random(17)
    raw = list({(rng.randrange(30), rng.randrange(30)) for _ in range(90)})
    canon = {(min(u, v), max(u, v)) for u, v in raw if u != v}
    wedges = [(u, v, _md5_w(u, v)) for u, v in canon]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {(r.u, r.v, r.w) for r in boruvka_msf(df).collect()}
    assert got == _kruskal(wedges)


def test_boruvka_explicit_weights_and_forest(spark):
    # two disconnected squares with a known cheap diagonal each:
    # MSF = 3 lightest edges per square (a forest, not a tree)
    edges = [
        (0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 0, 10),
        (10, 11, 1), (11, 12, 5), (12, 13, 2), (13, 10, 4),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, wt long")
    got = {(r.u, r.v, r.w) for r in boruvka_msf(df, weight_col="wt").collect()}
    assert got == {
        (0, 1, 1), (1, 2, 2), (2, 3, 3),
        (10, 11, 1), (12, 13, 2), (10, 13, 4),
    }


def test_boruvka_parallel_edges_keep_lightest(spark):
    # duplicate pair with different weights: canonical collapse keeps min
    df = spark.createDataFrame(
        [(0, 1, 9), (1, 0, 2), (1, 2, 3)], "src long, dst long, wt long"
    )
    got = {(r.u, r.v, r.w) for r in boruvka_msf(df, weight_col="wt").collect()}
    assert got == {(0, 1, 2), (1, 2, 3)}


def test_boruvka_quad_matches_pinned_kruskal(spark):
    """Drift guard for the gate pin: the engine's Borůvka on the
    sf0.01 quad graph must equal the committed pure-Python-Kruskal
    parquet exactly."""
    import pandas as pd

    import __spark_entry__ as entry

    got = (
        entry.queries()["mst"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["u", "v", "w"])
        .reset_index(drop=True)
    )
    exp = (
        pd.read_parquet("/root/repo/.oracle/pinned_mst_sf001.parquet")
        .sort_values(["u", "v", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_single_linkage_thresholds(spark):
    from ccl_spark.mst import boruvka_msf, single_linkage

    # chain 0-1-2-3 with weights 1, 5, 2: cutting at t=2 separates {0,1},{2,3}
    edges = [(0, 1, 1), (1, 2, 5), (2, 3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, wt long")
    msf = boruvka_msf(df, weight_col="wt")
    at2 = {r.vertex: r.cluster for r in single_linkage(df, 2, weight_col="wt", msf=msf).collect()}
    assert at2[0] == at2[1] and at2[2] == at2[3] and at2[0] != at2[2]
    # t >= max weight: one cluster
    at5 = {r.vertex: r.cluster for r in single_linkage(df, 5, weight_col="wt", msf=msf).collect()}
    assert len(set(at5.values())) == 1
    # t below every weight: all singletons labeled by own id
    at0 = {r.vertex: r.cluster for r in single_linkage(df, 0, weight_col="wt", msf=msf).collect()}
    assert at0 == {v: v for v in range(4)}
