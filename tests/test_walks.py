"""random_walks vs an independent pure-Python (hashlib.md5) replay."""

from __future__ import annotations

import hashlib
import random

from ccl_spark.walks import random_walks


def _draw(v0, rep, step, seed):
    key = f"{v0},{rep},{step},{seed}".encode()
    return int(hashlib.md5(key).hexdigest()[:15], 16)


def _py_walks(edges, walk_len, n_walks, seed):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    adj: dict[int, list[int]] = {}
    for s, d in sorted(und):
        adj.setdefault(s, []).append(d)
    out = {}
    for v0 in adj:
        for rep in range(n_walks):
            cur, path = v0, [v0]
            for step in range(walk_len):
                nbrs = adj[cur]
                cur = nbrs[_draw(v0, rep, step, seed) % len(nbrs)]
                path.append(cur)
            out[(v0, rep)] = " ".join(str(v) for v in path)
    return out


def test_walks_match_python_replay(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["start"], r["rep"]): r["walk"]
        for r in random_walks(df, walk_len=4, n_walks=2, seed=9).collect()
    }
    assert got == _py_walks(edges, 4, 2, 9)


def test_walks_shape_and_reproducibility(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = random_walks(df, walk_len=3, n_walks=1, seed=1).collect()
    b = random_walks(df, walk_len=3, n_walks=1, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # one walk per vertex, walk_len+1 ids each, starting at the vertex
    assert len(a) == 4
    for r in a:
        ids = r["walk"].split(" ")
        assert len(ids) == 4 and int(ids[0]) == r["start"]
    # a different seed changes at least one walk on this graph
    c = random_walks(df, walk_len=3, n_walks=1, seed=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def _py_node2vec(edges, walk_len, n_walks, p, q, seed):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    adj: dict[int, list[int]] = {}
    for s, d in sorted(und):
        adj.setdefault(s, []).append(d)
    nbr = {v: set(ns) for v, ns in adj.items()}
    out = {}
    for v0 in adj:
        for rep in range(n_walks):
            cur = adj[v0][_draw(v0, rep, 0, seed) % len(adj[v0])]
            prev, path = v0, [v0, cur]
            for step in range(1, walk_len):
                cands = adj[cur]
                wts = [
                    (1.0 / p) if x == prev
                    else 1.0 if x in nbr[prev]
                    else (1.0 / q)
                    for x in cands
                ]
                cws = []
                running = 0.0
                for wt in wts:
                    running = running + wt
                    cws.append(running)
                key = f"{v0},{rep},{step},{seed}".encode()
                u = int(hashlib.md5(key).hexdigest()[:13], 16) / float(1 << 52)
                r = u * cws[-1]
                pcw = 0.0
                for i, cw in enumerate(cws):
                    if pcw <= r < cw:
                        nxt = cands[i]
                        break
                    pcw = cw
                prev, cur = cur, nxt
                path.append(cur)
            out[(v0, rep)] = " ".join(str(v) for v in path)
    return out


def test_node2vec_matches_python_replay(spark):
    from ccl_spark.walks import node2vec_walks

    rng = random.Random(31)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["start"], r["rep"]): r["walk"]
        for r in node2vec_walks(
            df, walk_len=4, n_walks=2, p=2.0, q=0.5, seed=3
        ).collect()
    }
    assert got == _py_node2vec(edges, 4, 2, 2.0, 0.5, 3)


def test_node2vec_bias_extremes(spark):
    from ccl_spark.walks import node2vec_walks

    # path graph 0-1-2-3-4-5: from the second step on, a huge p and
    # tiny q make returning impossible whenever going onward is an
    # option, so every interior-start walk marches monotonically
    edges = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = node2vec_walks(df, walk_len=3, p=1024.0, q=1.0 / 1024, seed=1).collect()
    got = {r["start"]: [int(x) for x in r["walk"].split(" ")] for r in rows}
    assert len(got) == 6
    for start, path in got.items():
        assert len(path) == 4 and path[0] == start
        for a, b in zip(path, path[1:]):
            assert abs(a - b) == 1
        # after step 1 the walk never backtracks unless at an endpoint
        for i in range(2, len(path)):
            if path[i - 1] not in (0, 5):
                assert path[i] != path[i - 2]


def test_neighbor_sample_matches_python_replay(spark):
    import hashlib

    from ccl_spark.walks import neighbor_sample

    raw = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    seeds, fanouts = [0, 5], (2, 2)
    got = {
        (r.seed, r.hop, r.src, r.dst)
        for r in neighbor_sample(edges, seeds=seeds, fanouts=fanouts).collect()
    }

    und = {}
    for s, d in raw:
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)

    def sample(hop, node, fan):
        ranked = sorted(
            und.get(node, ()),
            key=lambda d: (
                hashlib.md5(f"{hop}|{node}|{d}".encode()).hexdigest(),
                d,
            ),
        )
        return ranked[:fan]

    want = set()
    frontier = {(s, s) for s in seeds}
    for hop, fan in enumerate(fanouts, 1):
        nxt = set()
        for seed, node in frontier:
            for d in sample(hop, node, fan):
                want.add((seed, hop, node, d))
                nxt.add((seed, d))
        frontier = nxt
    assert got == want

    # fanout bound holds per (hop, vertex)
    per = {}
    for seed, hop, s, d in got:
        per.setdefault((hop, s), set()).add(d)
    for (hop, _), ds in per.items():
        assert len(ds) <= fanouts[hop - 1]


def test_edge_negatives_properties_and_replay(spark):
    import hashlib

    from ccl_spark.walks import edge_negatives

    raw = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {(r.u, r.v, r.draw) for r in edge_negatives(edges, k=4, seed=7).collect()}

    verts = sorted({x for e in raw for x in e})
    und = set()
    for s, d in raw:
        und.add((s, d)); und.add((d, s))
    want = set()
    for u in verts:
        for j in range(4):
            h = hashlib.md5(f"{u},{j},7".encode()).hexdigest()[:15]
            v = verts[int(h, 16) % len(verts)]
            if v != u and (u, v) not in und:
                want.add((u, v, j))
    assert got == want
    # no sampled pair is a real edge or a self-loop
    assert all((u, v) not in und and u != v for u, v, _ in got)
