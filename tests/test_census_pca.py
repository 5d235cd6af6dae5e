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
