from __future__ import annotations

import math

from pyspark.sql import functions as F

from ccl_spark.graphstats import community_conductance
from ccl_spark.similarity import knn_graph, mutual_knn_components
from ccl_spark.textops import EN_STOP, gopher_quality_flags


# ----------------------------------------------------------- kNN graph


def _knn_oracle(vecs: dict[int, list[float]], k: int):
    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}
    out = {}
    for a in q:
        scored = []
        for b in q:
            if a == b:
                continue
            dot = sum(x * y for x, y in zip(q[a], q[b]))
            scored.append(
                (round(dot / math.sqrt(n2[a] * n2[b]), 6), b)
            )
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[a] = [(b, c) for c, b in scored[:k]]
    return out


VECS = {
    0: [1.0, 0.0, 0.1],
    1: [0.9, 0.1, 0.0],
    2: [0.0, 1.0, 0.1],
    3: [0.1, 0.9, 0.0],
    4: [-1.0, -0.9, 0.2],
    5: [-0.9, -1.0, 0.1],
}


def test_knn_graph_matches_python(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    rows = knn_graph(emb, k=2).collect()
    got: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(rows, key=lambda r: (r.src, -r.cosine, r.dst)):
        got.setdefault(r.src, []).append((r.dst, r.cosine))
    assert got == _knn_oracle(VECS, 2)


def test_knn_graph_candidates_restrict(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (4, 5)], "id_a long, id_b long"
    )
    rows = knn_graph(emb, k=2, candidates=cand).collect()
    got = {(r.src, r.dst) for r in rows}
    # only candidate pairs may appear; 0 keeps its 2 candidates
    assert got == {(0, 1), (0, 2), (4, 5)}


def test_mutual_knn_components_clusters(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    comp = {r.vertex: r.component for r in mutual_knn_components(emb, k=1).collect()}
    # k=1 mutual pairs: (0,1), (2,3), (4,5) -> three two-vertex clusters
    assert comp == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


# -------------------------------------------------------- conductance


def test_conductance_matches_hand_computation(spark):
    # two triangles joined by one bridge edge
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    lab = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "vertex long, label long",
    )
    rows = {r.label: r for r in community_conductance(e, lab).collect()}
    # vol(10) = 2*3 + 1 = 7 endpoints, cut = 1, 2m = 14
    assert rows[10].vol == 7 and rows[10].cut == 1
    assert rows[10].conductance == round(1 / 7, 6)
    assert rows[20].conductance == round(1 / 7, 6)


def test_conductance_whole_graph_zero(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    lab = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "vertex long, label long"
    )
    r = community_conductance(e, lab).collect()
    assert len(r) == 1 and r[0].conductance == 0.0 and r[0].cut == 0


# ------------------------------------------------------ gopher filter


def test_gopher_flags_and_keep(spark):
    long_good = " ".join(["alpha", "beta", "gamma", "the", "of"] * 8)  # 40 toks
    short = "alpha beta gamma"
    low_stop = " ".join(["alpha", "beta", "gamma", "delta"] * 10)  # no stopwords
    docs = spark.createDataFrame(
        [(1, long_good), (2, short), (3, low_stop)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert rows[1].keep is True
    assert rows[2].keep is False  # 3 tokens < 30
    assert rows[3].keep is False  # stop_ratio 0 < 0.05
    # exact feature arithmetic
    toks = long_good.split(" ")
    assert rows[1].n_tokens == len(toks)
    assert rows[1].mean_word_len == round(
        sum(len(t) for t in toks) / len(toks), 6
    )
    assert rows[1].stop_ratio == round(
        sum(t in EN_STOP for t in toks) / len(toks), 6
    )


def test_gopher_threshold_overrides(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd the")], "doc_id long, text string"
    )
    strict = gopher_quality_flags(docs, min_tokens=10).collect()[0]
    loose = gopher_quality_flags(docs, min_tokens=2).collect()[0]
    assert strict.keep is False and loose.keep is True


def test_host_quality_buckets_invariants(spark):
    from ccl_spark.textops import host_quality_buckets

    # 9 hosts x 3 docs with host-dependent fluency: hosts with low h
    # get natural-ish english, high h get symbol-heavy gibberish, so
    # the tercile split must be monotone in the gibberish level
    rows = []
    for h in range(9):
        for d in range(3):
            base = "the cat sat on the mat and the dog ran " * 4
            noise = "".join(chr(33 + ((h * 7 + d + i) % 14)) for i in range(h * 12))
            rows.append((f"doc{h}_{d}", f"h{h}", base + noise))
    docs = spark.createDataFrame(rows, "doc_id string, host string, text string")
    out = host_quality_buckets(docs, id_col="doc_id").collect()
    assert len(out) == 9
    assert all(r["n_docs"] == 3 for r in out)
    assert {r["bucket"] for r in out} == {1, 2, 3}
    for r in out:
        assert r["keep"] == (r["bucket"] <= 2)
    # bucket boundaries respect the score ordering: every head host
    # mean >= every middle mean >= every tail mean
    by_bucket = {b: [r["mean_logprob"] for r in out if r["bucket"] == b] for b in (1, 2, 3)}
    assert min(by_bucket[1]) >= max(by_bucket[2]) >= min(by_bucket[2]) >= max(by_bucket[3])
