from __future__ import annotations

from ccl_spark.graphstats import attack_robustness
from ccl_spark.lpa import weighted_label_propagation


def _wlpa_oracle(
    wedges: list[tuple[int, int, int]], iters: int
) -> dict[int, int]:
    und: dict[tuple[int, int], int] = {}
    for u, v, w in wedges:
        if u == v:
            continue
        und[(u, v)] = und.get((u, v), 0) + w
        und[(v, u)] = und.get((v, u), 0) + w
    verts = sorted({x for e in und for x in e})
    lab = {v: v for v in verts}
    for _ in range(iters):
        new = {}
        for v in verts:
            scores: dict[int, int] = {}
            for (a, b), w in und.items():
                if a == v:
                    scores[lab[b]] = scores.get(lab[b], 0) + w
            if scores:
                best = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[0][0]
            else:
                best = lab[v]
            new[v] = best
        if new == lab:
            break
        lab = new
    return lab


def test_weighted_lpa_matches_python(spark):
    # weight pulls vertex 3 into {1,2}'s community despite more
    # unweighted links to {4,5}
    wedges = [(1, 2, 5), (1, 3, 10), (3, 4, 1), (3, 5, 1), (4, 5, 1)]
    e = spark.createDataFrame(wedges, "src long, dst long, w long")
    got = {
        r.vertex: r.label
        for r in weighted_label_propagation(e, weight="w", max_iter=5).collect()
    }
    assert got == _wlpa_oracle(wedges, 5)


def test_weighted_lpa_multi_edge_sums(spark):
    # duplicate directed edges and the reverse edge all sum into one
    # undirected weight
    e = spark.createDataFrame(
        [(1, 2, 1), (1, 2, 1), (2, 1, 1), (2, 3, 4)], "src long, dst long, w long"
    )
    got = {
        r.vertex: r.label
        for r in weighted_label_propagation(e, weight="w", max_iter=4).collect()
    }
    exp = _wlpa_oracle([(1, 2, 1), (1, 2, 1), (2, 1, 1), (2, 3, 4)], 4)
    assert got == exp


def test_attack_robustness_star_collapse(spark):
    # star: hub 0 connects 1..6; removing the hub shatters the graph
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(1, 2)], "src long, dst long"
    )
    rows = {r.k: r for r in attack_robustness(e, ks=(0, 1)).collect()}
    assert rows[0].n_vertices == 7 and rows[0].giant_size == 7
    # hub gone: only the 1-2 edge survives
    assert rows[1].n_vertices == 2 and rows[1].giant_size == 2


def test_attack_robustness_k_zero_identity(spark):
    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    r = {x.k: x for x in attack_robustness(e, ks=(0,)).collect()}[0]
    assert r.n_vertices == 4 and r.giant_size == 2
