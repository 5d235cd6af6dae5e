"""Independent in-test oracles (pure Python/NumPy, no Spark)."""

from __future__ import annotations

import numpy as np


def union_find_components(edges, vertices=()):
    parent = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    for v in vertices:
        find(v)
    return {v: find(v) for v in parent}


def numpy_pagerank(edges, vertices=(), damping=0.85, tol=1e-12, max_iter=5000):
    verts = sorted({u for u, _ in edges} | {v for _, v in edges} | set(vertices))
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_deg = np.zeros(n)
    for u, _ in edges:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    targets = {}
    for u, v in edges:
        targets.setdefault(idx[u], []).append(idx[v])
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for u, vs in targets.items():
            share = r[u] / out_deg[u]
            for v in vs:
                contrib[v] += share
        dangling = r[out_deg == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in verts}


def numpy_pagerank_weighted(edges, damping=0.85, tol=1e-12, max_iter=5000):
    """Dense weighted PageRank: contrib = r * w / sum-of-out-weights.
    ``edges`` is a list of (u, v, w) with positive w."""
    verts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_w = np.zeros(n)
    for u, _, w in edges:
        out_w[idx[u]] += w
    r = np.full(n, 1.0 / n)
    targets = {}
    for u, v, w in edges:
        targets.setdefault(idx[u], []).append((idx[v], w))
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for u, vws in targets.items():
            for v, w in vws:
                contrib[v] += r[u] * w / out_w[u]
        dangling = r[out_w == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.max(np.abs(new - r)) < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in verts}


def bfs_neighborhood(edges, sources=None, undirected=False):
    """Exact neighborhood function [(t, n_pairs)] by per-source BFS."""
    from collections import deque

    adj = {}
    es = list(edges)
    if undirected:
        es = es + [(v, u) for u, v in es]
    verts = sorted({u for u, _ in es} | {v for _, v in es})
    for u, v in es:
        if u != v:
            adj.setdefault(u, set()).add(v)
    srcs = verts if sources is None else sorted(sources)
    counts = {}
    for s in srcs:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for d in dist.values():
            counts[d] = counts.get(d, 0) + 1
    out, cum = [], 0
    for t in range(max(counts) + 1):
        cum += counts.get(t, 0)
        out.append((t, cum))
    return out
