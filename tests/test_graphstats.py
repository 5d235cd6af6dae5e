"""graphstats vs independent pure-Python oracles on crafted graphs."""

from __future__ import annotations

import math
from itertools import combinations

import pytest

from ccl_spark.graphstats import adamic_adar, assortativity, reciprocity

# Directed: 1->2, 2->1 (reciprocal pair), 1->3, 3->4, 4->3 (reciprocal),
# 2->3, plus a self-loop (dropped) and a duplicate edge (deduped).
DIRECTED = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (2, 3), (5, 5), (1, 3)]

# Undirected star-plus-path: 0 is a hub over 1..4; 5-6-7 a path.
UNDIRECTED = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7), (1, 2)]


def _py_undirected(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_reciprocity(spark):
    df = spark.createDataFrame(DIRECTED, "src long, dst long")
    got = reciprocity(df).first()["reciprocity"]
    edges = {(s, d) for s, d in DIRECTED if s != d}
    expect = sum((d, s) in edges for s, d in edges) / len(edges)
    assert got == pytest.approx(expect, abs=1e-6)
    assert got == pytest.approx(4 / 6, abs=1e-6)


def test_assortativity(spark):
    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = assortativity(df).first()["assortativity"]
    adj = _py_undirected(UNDIRECTED)
    xs, ys = [], []
    for u, nbrs in adj.items():
        for v in nbrs:
            xs.append(len(adj[u]))
            ys.append(len(adj[v]))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    assert got == pytest.approx(cov / (sx * sy), abs=1e-6)


def _py_adamic_adar(pairs, max_degree=10_000):
    adj = _py_undirected(pairs)
    scores: dict[tuple[int, int], float] = {}
    for w, nbrs in adj.items():
        if not (2 <= len(nbrs) <= max_degree):
            continue
        for u, v in combinations(sorted(nbrs), 2):
            scores[(u, v)] = scores.get((u, v), 0.0) + 1.0 / math.log(len(nbrs))
    return {
        (u, v): s for (u, v), s in scores.items() if v not in adj[u]
    }


def test_adamic_adar(spark):
    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = {(r["u"], r["v"]): r["score"] for r in adamic_adar(df, k=50).collect()}
    expect = _py_adamic_adar(UNDIRECTED)
    assert set(got) == set(expect)
    for pair, s in expect.items():
        assert got[pair] == pytest.approx(s, abs=1e-6)
    # hub witness 0 (deg 4) contributes 1/ln(4) to each of its 6 pairs
    assert (3, 4) in got and got[(3, 4)] == pytest.approx(1 / math.log(4), abs=1e-6)


def test_adamic_adar_max_degree_cap(spark):
    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adamic_adar(df, k=50, max_degree=2).collect()
    }
    expect = _py_adamic_adar(UNDIRECTED, max_degree=2)
    assert set(got) == set(expect)
    # hub 0 (deg 4) excluded as witness: (3, 4) no longer scored
    assert (3, 4) not in got and (5, 7) in got


def test_adamic_adar_topk_determinism(spark):
    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    top2 = [(r["u"], r["v"]) for r in adamic_adar(df, k=2).collect()]
    expect = sorted(
        _py_adamic_adar(UNDIRECTED).items(),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:2]
    assert top2 == [p for p, _ in expect]


def _py_wedge_scores(pairs, wgt, max_degree=10_000):
    """Per-pair witness-weight sums + common-neighbor counts."""
    adj = _py_undirected(pairs)
    scores: dict[tuple[int, int], float] = {}
    for w, nbrs in adj.items():
        if not (2 <= len(nbrs) <= max_degree):
            continue
        for u, v in combinations(sorted(nbrs), 2):
            scores[(u, v)] = scores.get((u, v), 0.0) + wgt(len(nbrs))
    return {(u, v): s for (u, v), s in scores.items() if v not in adj[u]}


def test_resource_allocation(spark):
    from ccl_spark.graphstats import resource_allocation

    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["score"]
        for r in resource_allocation(df, k=50).collect()
    }
    expect = _py_wedge_scores(UNDIRECTED, lambda d: 1.0 / d)
    assert set(got) == set(expect)
    for pair, s in expect.items():
        assert got[pair] == pytest.approx(s, abs=1e-6)
    # hub witness 0 (deg 4) contributes 1/4 per pair (vs 1/ln4 for AA)
    assert got[(3, 4)] == pytest.approx(0.25, abs=1e-6)


def test_jaccard_links(spark):
    from ccl_spark.graphstats import jaccard_links

    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["score"] for r in jaccard_links(df, k=50).collect()
    }
    adj = _py_undirected(UNDIRECTED)
    common = _py_wedge_scores(UNDIRECTED, lambda d: 1.0)
    expect = {
        (u, v): c / (len(adj[u]) + len(adj[v]) - c)
        for (u, v), c in common.items()
    }
    assert set(got) == set(expect)
    for pair, s in expect.items():
        assert got[pair] == pytest.approx(s, abs=1e-6)
    # 3 and 4: N={0} each, union={0}+{0}-> J = 1/(1+1-1) = 1
    assert got[(3, 4)] == pytest.approx(1.0, abs=1e-6)


def test_jaccard_cap_is_numerator_only(spark):
    from ccl_spark.graphstats import jaccard_links

    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    got = {
        (r["u"], r["v"]): r["score"]
        for r in jaccard_links(df, k=50, max_degree=2).collect()
    }
    adj = _py_undirected(UNDIRECTED)
    common = _py_wedge_scores(UNDIRECTED, lambda d: 1.0, max_degree=2)
    expect = {
        (u, v): c / (len(adj[u]) + len(adj[v]) - c)
        for (u, v), c in common.items()
    }
    assert set(got) == set(expect)
    # hub 0 capped out as witness: (3, 4) unscored, path pair survives
    assert (3, 4) not in got and (5, 7) in got


def test_modularity_two_cliques(spark):
    from ccl_spark.graphstats import modularity

    # two triangles joined by one bridge edge; partition = the cliques
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = [(v, 0) for v in (0, 1, 2)] + [(v, 1) for v in (3, 4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(labels, "vertex long, label long")
    got = modularity(e, lab).first()["modularity"]
    # m=7, intra edges 3+3, degree mass 7+7 (2m=14)
    expect = (3 / 7 - (7 / 14) ** 2) + (3 / 7 - (7 / 14) ** 2)
    assert got == pytest.approx(expect, abs=1e-6)
    # the all-in-one partition has modularity 0 by definition
    one = spark.createDataFrame([(v, 9) for v in range(6)], "vertex long, label long")
    assert modularity(e, one).first()["modularity"] == pytest.approx(0.0, abs=1e-6)


def test_modularity_matches_python_random(spark):
    import random

    from ccl_spark.graphstats import modularity

    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    labels = [(v, v % 4) for v in range(30)]
    e = spark.createDataFrame(edges, "src long, dst long")
    lab = spark.createDataFrame(labels, "vertex long, label long")
    got = modularity(e, lab).first()["modularity"]
    adj = _py_undirected(edges)
    und = {(u, v) for u in adj for v in adj[u]}
    e2 = len(und)
    comm = {c: [0, 0] for c in range(4)}  # [d_c, in2]
    for u, v in und:
        comm[u % 4][0] += 1
        if u % 4 == v % 4:
            comm[u % 4][1] += 1
    expect = sum(in2 / e2 - (dc / e2) ** 2 for dc, in2 in comm.values())
    assert got == pytest.approx(expect, abs=1e-6)


def test_degree_distribution_and_powerlaw(spark):
    from ccl_spark.graphstats import degree_distribution, powerlaw_alpha

    df = spark.createDataFrame(UNDIRECTED, "src long, dst long")
    adj = _py_undirected(UNDIRECTED)
    hist = {}
    for v in adj:
        hist[len(adj[v])] = hist.get(len(adj[v]), 0) + 1
    got = {r["deg"]: r["n_vertices"] for r in degree_distribution(df).collect()}
    assert got == hist
    row = powerlaw_alpha(df, d_min=2).first()
    tail = [len(adj[v]) for v in adj if len(adj[v]) >= 2]
    expect = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert row["alpha"] == pytest.approx(expect, abs=1e-6)
    assert row["n_tail"] == len(tail)


def test_cocitation_and_coupling(spark):
    from ccl_spark.graphstats import bibliographic_coupling, cocitation

    # 1 and 2 both cited by 10, 11, 12; both cite 20, 21
    edges = (
        [(w, 1) for w in (10, 11, 12)]
        + [(w, 2) for w in (10, 11, 12)]
        + [(1, 20), (2, 20), (1, 21), (2, 21), (3, 20)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = {(r["u"], r["v"]): r["score"] for r in cocitation(df, k=50).collect()}
    # independent replay
    out: dict[int, set] = {}
    inn: dict[int, set] = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
        inn.setdefault(d, set()).add(s)
    exp_cc = {}
    for w, ns in out.items():
        if len(ns) < 2:
            continue
        for u in ns:
            for v in ns:
                if u < v:
                    exp_cc[(u, v)] = exp_cc.get((u, v), 0) + 1
    assert cc == exp_cc and cc[(1, 2)] == 3
    bc = {
        (r["u"], r["v"]): r["score"]
        for r in bibliographic_coupling(df, k=50).collect()
    }
    exp_bc = {}
    for w, ns in inn.items():
        if len(ns) < 2:
            continue
        for u in ns:
            for v in ns:
                if u < v:
                    exp_bc[(u, v)] = exp_bc.get((u, v), 0) + 1
    assert bc == exp_bc and bc[(1, 2)] == 2 and bc[(1, 3)] == 1


def _py_greedy_modularity(edges, rounds):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    adj: dict[int, list[int]] = {}
    for a, b in sorted(und):
        adj.setdefault(a, []).append(b)
    deg = {v: len(ns) for v, ns in adj.items()}
    e2 = sum(deg.values())
    lab = {v: v for v in deg}
    for _ in range(rounds):
        mass: dict[int, int] = {}
        for v in deg:
            mass[lab[v]] = mass.get(lab[v], 0) + deg[v]
        new = {}
        for v in deg:
            k: dict[int, int] = {lab[v]: 0}
            for u in adj[v]:
                k[lab[u]] = k.get(lab[u], 0) + 1
            best = None
            for c in k:
                adj_mass = mass[c] - (deg[v] if c == lab[v] else 0)
                score = k[c] - deg[v] * adj_mass / e2
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c)
            new[v] = best[1]
        lab = new
    return lab


def test_greedy_modularity_two_cliques(spark):
    from ccl_spark.graphstats import greedy_modularity_labels, modularity

    # two K4s joined by a single bridge: communities = the cliques
    from itertools import combinations

    edges = (
        list(combinations(range(4), 2))
        + list(combinations(range(10, 14), 2))
        + [(0, 10)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    lab = greedy_modularity_labels(df, rounds=3)
    got = {r["vertex"]: r["label"] for r in lab.collect()}
    assert got == _py_greedy_modularity(edges, 3)
    # each clique collapses to one community
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[v] for v in range(10, 14)}) == 1
    assert got[0] != got[10]
    # and the found partition beats the singleton partition's Q = <0
    q = modularity(df, lab).first()["modularity"]
    assert q > 0.3


def test_greedy_modularity_matches_python_random(spark):
    import random

    from ccl_spark.graphstats import greedy_modularity_labels

    rng = random.Random(47)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 3):
        got = {
            r["vertex"]: r["label"]
            for r in greedy_modularity_labels(df, rounds=rounds).collect()
        }
        assert got == _py_greedy_modularity(edges, rounds)


def test_transitivity(spark):
    from ccl_spark.graphstats import transitivity

    # triangle + one pendant: T=1; degrees 2,2,3,1 -> wedges 1+1+3+0=5
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = transitivity(df).first()
    assert row["n_triangles"] == 1 and row["n_wedges"] == 5
    assert row["transitivity"] == pytest.approx(3 / 5, abs=1e-6)


def test_rich_club(spark):
    from ccl_spark.graphstats import rich_club

    # K4 core (degrees >= 3) plus pendant chains lowering nothing
    from itertools import combinations

    edges = list(combinations(range(4), 2)) + [(0, 10), (1, 11), (10, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = rich_club(df, k=3).first()
    # degree>3: vertices 0 and 1 (deg 4 each); 1 edge between them
    assert row["n_rich"] == 2 and row["n_edges_rich"] == 1
    assert row["phi"] == pytest.approx(1.0, abs=1e-6)
    row2 = rich_club(df, k=2).first()
    # degree>2: 0,1,2,3 (K4): 6 edges, phi = 1
    assert row2["n_rich"] == 4 and row2["n_edges_rich"] == 6
    assert row2["phi"] == pytest.approx(1.0, abs=1e-6)


def test_directed_assortativity(spark):
    from ccl_spark.graphstats import directed_assortativity

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["mode"]: r["assortativity"] for r in directed_assortativity(df).collect()}
    # independent replay
    e = {(s, d) for s, d in edges if s != d}
    od: dict[int, int] = {}
    idg: dict[int, int] = {}
    for s, d in e:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    import math

    def corr(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
        sy = math.sqrt(sum((y - my) ** 2 for y in ys))
        return cov / (sx * sy)

    for mode, fs, ft in [
        ("out-out", od, od), ("out-in", od, idg),
        ("in-out", idg, od), ("in-in", idg, idg),
    ]:
        xs = [fs.get(s, 0) for s, d in sorted(e)]
        ys = [ft.get(d, 0) for s, d in sorted(e)]
        assert got[mode] == pytest.approx(corr(xs, ys), abs=1e-6), mode


def test_link_prediction_eval_sanity(spark):
    import random

    from ccl_spark.graphstats import link_prediction_eval

    # two dense communities: AA on train should recover held-out
    # intra-community edges far better than chance
    rng = random.Random(4)
    edges = []
    for base in (0, 50):
        for a in range(base, base + 20):
            for b in range(a + 1, base + 20):
                if rng.random() < 0.5:
                    edges.append((a, b))
    df = spark.createDataFrame(edges, "src long, dst long")
    r = link_prediction_eval(df, k=10, test_mod=4).first()
    assert r.n_queries > 10
    assert 0.0 < r.mean_recall <= 1.0
    assert r.mean_mrr > 0.2  # dense communities: first hit near the top
    assert 0.0 < r.mean_ndcg <= 1.0


def test_link_prediction_eval_deterministic(spark):
    from ccl_spark.graphstats import link_prediction_eval

    edges = [(i, (i * 7 + 1) % 30) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = link_prediction_eval(df, k=5).first()
    b = link_prediction_eval(df, k=5).first()
    assert a == b


def test_partition_nmi_exact(spark):
    from ccl_spark.graphstats import partition_nmi

    def mk(pairs):
        return spark.createDataFrame(pairs, "vertex long, label long")

    # identical up to renaming -> NMI 1
    a = mk([(0, 0), (1, 0), (2, 5), (3, 5)])
    b = mk([(0, 9), (1, 9), (2, 2), (3, 2)])
    r = partition_nmi(a, b).first()
    assert r.nmi == 1.0 and r.n_vertices == 4 and r.mi == r.h_a == r.h_b

    # hand-checked 2x2 contingency vs pure-Python replay
    a = mk([(i, 0 if i < 3 else 1) for i in range(6)])       # 3/3 split
    b = mk([(i, 0 if i in (0, 1, 3) else 1) for i in range(6)])
    got = partition_nmi(a, b).first()
    cells = {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 1): 2}
    n = 6
    C = sum(c * math.log(c) for c in cells.values())
    A = sum(c * math.log(c) for c in [3, 3])
    B = sum(c * math.log(c) for c in [3, 3])
    mi = (C - A - B) / n + math.log(n)
    ha = math.log(n) - A / n
    assert got.mi == round(mi, 6)
    assert got.nmi == round(2 * mi / (2 * ha), 6)

    # both trivial (single cluster) -> defined as 1.0
    t = partition_nmi(mk([(0, 1), (1, 1)]), mk([(0, 7), (1, 7)])).first()
    assert t.nmi == 1.0 and t.h_a == 0.0


def test_degree_rank_correlation_exact(spark):
    from ccl_spark.graphstats import degree_rank_correlation

    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 1), (1, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = degree_rank_correlation(e).first()
    # pure-Python replay
    vs = sorted({u for uv in edges for u in uv})
    dout = {v: sum(1 for s, _ in edges if s == v) for v in vs}
    din = {v: sum(1 for _, d in edges if d == v) for v in vs}
    C = D = 0
    for i, u in enumerate(vs):
        for w in vs[i + 1:]:
            p = (dout[u] - dout[w]) * (din[u] - din[w])
            C += p > 0
            D += p < 0
    n = len(vs)
    from collections import Counter

    tx2 = sum(c * (c - 1) for c in Counter(dout.values()).values())
    ty2 = sum(c * (c - 1) for c in Counter(din.values()).values())
    n2 = n * (n - 1)
    tau = (C - D) / math.sqrt((n2 - tx2) / 2 * ((n2 - ty2) / 2))
    assert (got.n_vertices, got.concordant, got.discordant) == (n, C, D)
    assert got.tau_b == round(tau, 6)

    # all-tied degrees -> guarded 0.0 (2-cycle: every deg is 1)
    cyc = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    assert degree_rank_correlation(cyc).first().tau_b == 0.0


def test_edge_percolation_matches_python_replay(spark):
    import hashlib

    from ccl_spark.graphstats import edge_percolation

    raw = [(i, (i * 3 + 1) % 17) for i in range(40)] + [(100, 101), (101, 102)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r.p: (r.n_edges, r.n_vertices, r.giant_size)
           for r in edge_percolation(edges, ps=(30, 70, 100)).collect()}

    # python replay with the same md5 coin
    und = set()
    for s, d in raw:
        if s != d:
            und.add((min(s, d), max(s, d)))

    def coin(u, v):
        h = hashlib.md5(f"{u},{v},perc".encode()).hexdigest()[:15]
        return int(h, 16) % 100

    def cc_stats(kept):
        adj = {}
        for u, v in kept:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        seen, giant = set(), 0
        for s in adj:
            if s in seen:
                continue
            stack, comp = [s], 0
            seen.add(s)
            while stack:
                x = stack.pop()
                comp += 1
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            giant = max(giant, comp)
        return len(adj), giant

    prev_kept = set()
    for p in (30, 70, 100):
        kept = {e for e in und if coin(*e) < p}
        nv, giant = cc_stats(kept)
        assert got[p] == (len(kept), nv, giant)
        # nested slices: monotone by construction
        assert prev_kept <= kept
        prev_kept = kept
    # p=100 keeps everything
    assert got[100][0] == len(und)
