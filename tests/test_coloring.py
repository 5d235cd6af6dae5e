from __future__ import annotations

from ccl_spark.coloring import greedy_coloring


def _jp_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python Jones-Plassmann replay with the same md5 priorities."""
    import hashlib

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    pri = {
        v: int(hashlib.md5(f"{v},jp".encode()).hexdigest()[:13], 16) for v in adj
    }
    color: dict[int, int] = {}
    while len(color) < len(adj):
        ready = [
            v
            for v in adj
            if v not in color
            and all(
                (pri[n], n) < (pri[v], v) for n in adj[v] if n not in color
            )
        ]
        assert ready, "JP must progress"
        for v in ready:
            used = {color[n] for n in adj[v] if n in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def test_coloring_replays_oracle_and_is_proper(spark):
    import random

    rng = random.Random(13)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.color for r in greedy_coloring(df).collect()}
    assert got == _jp_oracle(edges)
    for u, v in edges:
        if u != v:
            assert got[u] != got[v]


def test_coloring_bipartite_uses_few_colors(spark):
    # even cycle: proper 2-coloring possible; greedy JP may use up to
    # 3 but never more than max_degree+1 = 3
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.color for r in greedy_coloring(df).collect()}
    assert set(got) == set(range(n))
    assert max(got.values()) <= 2
    for u, v in edges:
        assert got[u] != got[v]


def test_butterflies_known_counts(spark):
    from ccl_spark.graphstats import butterflies

    # complete bipartite K23: sources {0,1}, dests {10,11,12}:
    # wedge pairs (0,1) share 3 dests -> c=3 -> C(3,2)=3 butterflies
    edges = [(s, d) for s in (0, 1) for d in (10, 11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = butterflies(df).first()
    assert (row.n_wedges, row.n_butterflies) == (3, 3)
    # no shared dests -> zero of both
    df2 = spark.createDataFrame([(0, 10), (1, 11)], "src long, dst long")
    row2 = butterflies(df2).first()
    assert (row2.n_wedges, row2.n_butterflies) == (0, 0)
