from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ccl_spark.dedup import cdc_chunks
from ccl_spark.graphstats import wl_refinement


def test_wl_distinguishes_structure(spark):
    # path 1-2-3-4-5 plus a disjoint 3-cycle: after 3 rounds the path
    # ends, the path middles, the path center, and the cycle vertices
    # are all in distinct classes (the center separates from the cycle
    # only at round 3, when its neighbors' end-adjacency arrives);
    # cycle vertices stay one class
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.color for r in wl_refinement(e, n_iter=3).collect()}
    assert got[1] == got[5] and got[2] == got[4]
    assert got[10] == got[11] == got[12]
    assert len({got[1], got[2], got[3], got[10]}) == 4


def test_wl_regular_graphs_confound(spark):
    # 1-WL cannot distinguish two triangles from a 6-cycle (both
    # 2-regular): all vertices share one color at any depth
    tri2 = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
    c6 = [(11, 12), (12, 13), (13, 14), (14, 15), (15, 16), (16, 11)]
    e = spark.createDataFrame(tri2 + c6, "src long, dst long")
    got = {r.vertex: r.color for r in wl_refinement(e, n_iter=3).collect()}
    assert len(set(got.values())) == 1


def _cdc_oracle(text: str, n: int, mod: int):
    toks = text.split(" ")
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    bounds = {
        i + n - 1
        for i, g in enumerate(grams)
        if int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % mod == 0
    }
    chunks, cur = [], []
    for p, t in enumerate(toks):
        cur.append(t)
        if p in bounds:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (ci, hashlib.md5(" ".join(c).encode()).hexdigest(), len(c))
        for ci, c in enumerate(chunks)
    ]


def test_cdc_matches_python(spark):
    text = " ".join(f"w{(i * 7) % 23}" for i in range(60))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_idx, r.chunk_hash, r.n_tokens)
        for r in cdc_chunks(docs, n=4, boundary_mod=4).collect()
    )
    assert rows == sorted(_cdc_oracle(text, 4, 4))
    assert len(rows) > 1  # the coin actually split this doc


def test_cdc_insertion_locality(spark):
    # content-defined boundaries: an insertion near the front changes
    # only a prefix of chunks; the suffix chunk hashes are shared
    base = " ".join(f"w{(i * 7) % 23}" for i in range(60))
    edited = "xx yy " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(docs, n=4, boundary_mod=4)
    h1 = {r.chunk_hash for r in out.filter(F.col("doc_id") == 1).collect()}
    h2 = {r.chunk_hash for r in out.filter(F.col("doc_id") == 2).collect()}
    assert h1 & h2  # shared suffix chunks survive the edit
    assert h1 != h2


def test_cdc_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = cdc_chunks(docs, n=4, boundary_mod=2).collect()
    assert len(rows) == 1 and rows[0].chunk_idx == 0 and rows[0].n_tokens == 2
