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
