from __future__ import annotations

import numpy as np

from ccl_spark.similarity import pca_power_top
from ccl_spark.triangles import directed_triangle_census


def test_directed_census_hand_graph(spark):
    # one 3-cycle {1,2,3}, one transitive triad {4,5,6} (4->5->6, 4->6)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (4, 6)], "src long, dst long"
    )
    r = directed_triangle_census(e).first()
    assert r.n_cyclic == 1 and r.n_transitive == 1


def test_directed_census_mutual_edges(spark):
    # a fully mutual triangle contains 2 directed 3-cycles and 6
    # transitive closures
    edges = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = directed_triangle_census(e).first()
    assert r.n_cyclic == 2 and r.n_transitive == 6


def _python_census(edges):
    es = set(edges)
    verts = sorted({v for e in es for v in e})
    cyc = sum(
        1
        for a in verts
        for b in verts
        for c in verts
        if (a, b) in es and (b, c) in es and (c, a) in es
    )
    tra = sum(
        1
        for a in verts
        for b in verts
        for c in verts
        if a != c and (a, b) in es and (b, c) in es and (a, c) in es
    )
    return cyc // 3, tra


def test_directed_census_matches_python(spark):
    edges = [((i * 7) % 11, (i * 3 + 1) % 11) for i in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = directed_triangle_census(e).first()
    cyc, tra = _python_census(edges)
    assert (r.n_cyclic, r.n_transitive) == (cyc, tra)


def test_pca_top_matches_numpy(spark):
    # anisotropic cloud: variance dominated by a known direction
    rng = np.random.default_rng(5)
    d = np.array([3.0, 1.0, 0.0, 0.0])
    d /= np.linalg.norm(d)
    pts = [
        (i, (d * t + rng.normal(0, 0.01, 4)).tolist())
        for i, t in enumerate(rng.normal(0, 1, 40))
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = {r.i: r for r in pca_power_top(emb, n_iter=6).collect()}
    v = np.array([rows[i + 1].v for i in range(4)])
    # numpy replay with the same quantization + iterations
    q = np.array([[round(x * 1000) for x in vec] for _, vec in pts], dtype=np.int64)
    g = (q.T @ q).astype(np.float64)
    w = np.ones(4)
    for _ in range(6):
        w = g @ w
        w = w / np.max(np.abs(w))
    assert np.allclose(v, np.round(w, 6), atol=2e-6)
    ray = rows[1].rayleigh
    expect = round(float(w @ g @ w / (w @ w)), 6)
    assert abs(ray - expect) < max(1e-4 * abs(expect), 1e-4)
    # the sup-normalized direction is proportional to the top
    # eigenvector: dominant axis carries the maximal |entry| of 1
    assert abs(v[0]) == 1.0 and abs(v[1]) < 1.0


def _brute_triad_census(n, edges):
    """Independent O(n^3) triad classifier (Holland-Leinhardt MAN)."""
    import itertools
    from collections import Counter

    es = set(edges)

    def code(a, b):
        f, r = (a, b) in es, (b, a) in es
        return 2 if (f and r) else (1 if f else (-1 if r else 0))

    def relto(center, other):
        c = code(center, other)
        return 2 if c == 2 else (1 if c == 1 else 0)

    wmap = {
        (1, 1): "021D", (0, 0): "021U", (0, 1): "021C",
        (0, 2): "111D", (1, 2): "111U", (2, 2): "201",
    }
    out = Counter()
    for u, v, t in itertools.combinations(range(n), 3):
        c1, c2, c3 = code(u, v), code(v, t), code(u, t)
        nm = sum(1 for x in (c1, c2, c3) if x == 2)
        nn = sum(1 for x in (c1, c2, c3) if x == 0)
        if nn == 3:
            tt = "003"
        elif nn == 2:
            tt = "102" if nm == 1 else "012"
        elif nn == 1:
            if c1 == 0:
                rs = sorted((relto(t, u), relto(t, v)))
            elif c2 == 0:
                rs = sorted((relto(u, v), relto(u, t)))
            else:
                rs = sorted((relto(v, u), relto(v, t)))
            tt = wmap[tuple(rs)]
        elif nm == 3:
            tt = "300"
        elif nm == 2:
            tt = "210"
        elif nm == 1:
            if c1 == 2:
                outb = ((t, v) in es) + ((t, u) in es)
            elif c2 == 2:
                outb = ((u, v) in es) + ((u, t) in es)
            else:
                outb = ((v, u) in es) + ((v, t) in es)
            tt = {2: "120D", 0: "120U", 1: "120C"}[outb]
        else:
            cyc = ((u, v) in es and (v, t) in es and (t, u) in es) or (
                (v, u) in es and (t, v) in es and (u, t) in es
            )
            tt = "030C" if cyc else "030T"
        out[tt] += 1
    return out


def test_triad_census_vs_bruteforce(spark):
    import random

    from ccl_spark.triangles import TRIAD_TYPES, triad_census

    rng = random.Random(7)
    for n, p in [(12, 0.25), (9, 0.5)]:
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < p
        ]
        assert {x for e in edges for x in e} == set(range(n))
        exp = _brute_triad_census(n, edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["triad_type"]: r["n"] for r in triad_census(df).collect()}
        assert set(got) == set(TRIAD_TYPES)
        for tt in TRIAD_TYPES:
            assert got[tt] == exp.get(tt, 0), (n, p, tt, got[tt], exp.get(tt, 0))
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_matches_directed_census(spark):
    # on a mutual-free digraph, 030C == n_cyclic and 030T == n_transitive
    # (each transitive triad has exactly one closing shortcut path)
    import random

    from ccl_spark.triangles import triad_census

    rng = random.Random(11)
    edges = []
    for a in range(15):
        for b in range(a + 1, 15):
            r = rng.random()
            if r < 0.2:
                edges.append((a, b))
            elif r < 0.4:
                edges.append((b, a))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["triad_type"]: r["n"] for r in triad_census(df).collect()}
    dc = directed_triangle_census(df).first()
    assert got["030C"] == dc.n_cyclic
    assert got["030T"] == dc.n_transitive


def test_clique4_vs_bruteforce(spark):
    import itertools
    import random

    from ccl_spark.triangles import clique4_count

    rng = random.Random(3)
    for n, p in [(14, 0.45), (10, 0.7)]:
        und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p}
        exp = sum(
            1
            for q in itertools.combinations(range(n), 4)
            if all((x, y) in und for x, y in itertools.combinations(q, 2))
        )
        edges = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in und]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert clique4_count(df).first().n_k4 == exp


def test_clique4_known_graphs(spark):
    from ccl_spark.triangles import clique4_count

    # K5 contains C(5,4)=5 K4s; directions and duplicates must not matter
    k5 = [(a, b) for a in range(5) for b in range(5) if a != b]
    df = spark.createDataFrame(k5, "src long, dst long")
    assert clique4_count(df).first().n_k4 == 5
    # K4 minus one edge has none
    near = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    df2 = spark.createDataFrame(near, "src long, dst long")
    assert clique4_count(df2).first().n_k4 == 0


def test_triad_significance_expectation(spark):
    import itertools
    import random
    from collections import Counter

    from ccl_spark.triangles import triad_significance

    rng = random.Random(7)
    n = 14
    edges = [
        (a, b) for a in range(n) for b in range(n) if a != b and rng.random() < 0.2
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triad_significance(df).collect()
    # expected polynomial must integrate to C(n,3) exactly
    assert abs(sum(r.expected for r in rows) - n * (n - 1) * (n - 2) / 6) < 1e-5
    assert sum(r.observed for r in rows) == n * (n - 1) * (n - 2) // 6

    # independent replay of the expectation via the brute classifier
    # over all 64 dyad-code combos on a fixed triple
    es = set(edges)
    pairs = list(itertools.combinations(range(n), 2))
    m = sum(1 for a, b in pairs if (a, b) in es and (b, a) in es)
    a_ = sum(1 for a, b in pairs if ((a, b) in es) != ((b, a) in es))
    t = len(pairs)
    pm, pa = m / t, a_ / t
    pn = 1 - pm - pa
    probs = {0: pn, 1: pa / 2, 2: pa / 2, 3: pm}
    arcs = {0: [], 1: [(0, 1)], 2: [(1, 0)], 3: [(0, 1), (1, 0)]}
    exp = Counter()
    for c1 in range(4):
        for c2 in range(4):
            for c3 in range(4):
                combo_edges = (
                    [(u, v) for u, v in arcs[c1]]
                    + [(u + 1, v + 1) for u, v in arcs[c2]]
                    + [(2 * u, 2 * v) for u, v in arcs[c3]]  # (0,2)/(2,0)
                )
                tt = next(iter(_brute_triad_census(3, combo_edges)))
                exp[tt] += probs[c1] * probs[c2] * probs[c3]
    tot3 = n * (n - 1) * (n - 2) / 6
    got = {r.triad_type: r.expected for r in rows}
    for tt, p in exp.items():
        assert abs(got[tt] - round(tot3 * p, 6)) <= 2e-6, (tt, got[tt], tot3 * p)
