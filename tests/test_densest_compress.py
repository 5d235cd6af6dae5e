from __future__ import annotations

import zlib

from ccl_spark.graphstats import densest_subgraph_peel
from ccl_spark.textops import compression_ratio


def test_densest_clique_plus_tail(spark):
    # a 5-clique with a long pendant path: the peel sheds the path and
    # the densest round is the clique (density (5*4/2)/5 = 2.0)
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4 + i, 5 + i) for i in range(1, 10)]
    e = spark.createDataFrame(clique + path, "src long, dst long")
    rows = sorted(
        (r.round, r.n_vertices, r.n_edges, r.density)
        for r in densest_subgraph_peel(e).collect()
    )
    assert rows[0][0] == 0 and rows[0][1] == 15  # full graph first
    best = max(r[3] for r in rows)
    assert best == 2.0
    best_row = [r for r in rows if r[3] == best][0]
    assert best_row[1] == 5 and best_row[2] == 10


def _peel_oracle(edges, max_rounds=12):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    out = []
    for t in range(max_rounds):
        verts = {v for e in es for v in e}
        n, m = len(verts), len(es)
        if not n:
            break
        out.append((t, n, m, round(m / n, 6)))
        deg = {v: 0 for v in verts}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v in verts if deg[v] * n >= 3 * m}
        es = {e for e in es if e[0] in keep and e[1] in keep}
    return out


def test_densest_matches_python(spark):
    edges = [((i * 7) % 17, (i * 5 + 2) % 17) for i in range(40)]
    e = spark.createDataFrame(
        [p for p in edges if p[0] != p[1]], "src long, dst long"
    )
    got = sorted(
        (r.round, r.n_vertices, r.n_edges, r.density)
        for r in densest_subgraph_peel(e).collect()
    )
    assert got == sorted(_peel_oracle(edges))


def test_compression_ratio_matches_zlib(spark):
    texts = {
        1: "a a a a a a a a a a a a a a a a",   # highly compressible
        2: "q w e r t y u i o p a s d f g h",   # less so
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for d, t in texts.items():
        raw = t.encode()
        zb = len(zlib.compress(raw, 6))
        assert rows[d].raw_bytes == len(raw)
        assert rows[d].zlib_bytes == zb
        assert rows[d].ratio == round(zb / len(raw), 6)
    assert rows[1].ratio < rows[2].ratio  # repetition compresses better


def test_ppr_sweep_finds_local_cluster(spark):
    from ccl_spark.graphstats import ppr_sweep_cut

    # two 4-cliques joined by a single bridge; sweep from a vertex in
    # clique A must hit its conductance minimum exactly at |A| = 4
    # with cut 1 (the bridge)
    a = [(i, j) for i in range(4) for j in range(4) if i < j]
    b = [(i, j) for i in range(10, 14) for j in range(10, 14) if i < j]
    und = a + b + [(0, 10)]
    # PPR walks the DIRECTED edge table: feed both orientations so the
    # random walk sees the undirected community structure
    e = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src long, dst long"
    )
    rows = {r.rank: r for r in ppr_sweep_cut(e, seed=1, n_iter=20, k_max=8).collect()}
    # exclude the trivial whole-graph prefix (vol == 2m -> guard 0.0)
    proper = [r for r in rows.values() if r.vol < 26]
    best = min(proper, key=lambda r: (r.conductance, r.rank))
    assert best.rank == 4 and best.cut == 1
    # prefix of size 4 = clique A (vertices 0..3), vol = 3*3 + 4 = 13
    assert best.vol == 13
    assert best.conductance == round(1 / 13, 6)
    prefix = {rows[k].vertex for k in range(1, 5)}
    assert prefix == {0, 1, 2, 3}
