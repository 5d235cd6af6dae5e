from __future__ import annotations

import math

from pyspark.sql import functions as F

from ccl_spark.cooc import textrank_keywords
from ccl_spark.retrieval import bm25_topk
from ccl_spark.simrank import simrank, simrank_topk
from ccl_spark.triangles import sampled_triangle_estimate, triangle_count


# ---------------------------------------------------------------- BM25


def _bm25_oracle(
    texts: dict[int, str], queries: dict[int, list[str]], k1: float, b: float
) -> dict[tuple[int, int], float]:
    toks = {d: [t for t in s.split(" ") if t] for d, s in texts.items()}
    n = float(len(texts))
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out: dict[tuple[int, int], float] = {}
    for qid, terms in queries.items():
        for d, ts in toks.items():
            s = 0.0
            for t in set(terms):
                tf = ts.count(t)
                if tf == 0 or t not in df:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * dl[d] / avgdl)
                )
            if s > 0.0:
                out[(qid, d)] = round(s, 6)
    return out


def test_bm25_matches_python(spark):
    texts = {
        1: "spark shuffle join hash join",
        2: "hash table scan scan scan",
        3: "join the window sort window",
        4: "sort merge join hash",
    }
    queries = {1: ["join", "hash"], 2: ["window"]}
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(qid, t) for qid, ts in queries.items() for t in ts],
        "query_id long, term string",
    )
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, q, k=10).collect()
    }
    assert got == _bm25_oracle(texts, queries, k1=1.2, b=0.75)


def test_bm25_topk_cut_and_ties(spark):
    # identical docs tie on score; doc_id ASC breaks the tie at k=1
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(7, "a")], "query_id long, term string")
    rows = bm25_topk(docs, q, k=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1 and rows[0].query_id == 7


# ------------------------------------------------------------ TextRank


def _textrank_oracle(
    texts: dict[int, str], window: int, n_iter: int, damping: float
) -> dict[str, float]:
    pairs: dict[tuple[str, str], int] = {}
    for s in texts.values():
        ts = s.split(" ")
        for i, c in enumerate(ts):
            for j in range(max(0, i - window), min(len(ts), i + window + 1)):
                if j != i:
                    pairs[(c, ts[j])] = pairs.get((c, ts[j]), 0) + 1
    verts = sorted({a for a, _ in pairs})
    outw = {v: 0.0 for v in verts}
    for (a, _), w in pairs.items():
        outw[a] += float(w)
    r = {v: 1.0 / len(verts) for v in verts}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in verts}
        for (a, b), w in pairs.items():
            contrib[b] += r[a] * w / outw[a]
        r = {
            v: (1.0 - damping) / len(verts) + damping * contrib[v] for v in verts
        }
    return {v: round(s, 6) for v, s in r.items()}


def test_textrank_matches_python(spark):
    texts = {
        1: "graph rank walk graph node walk",
        2: "rank node rank edge",
        3: "walk edge graph",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.keyword: r.rank
        for r in textrank_keywords(docs, window=2, n_iter=4, k=100).collect()
    }
    exp = _textrank_oracle(texts, window=2, n_iter=4, damping=0.85)
    assert set(got) == set(exp)
    for kw, v in exp.items():
        assert abs(got[kw] - v) < 2e-6, (kw, got[kw], v)
    # ranks form a distribution (sum to 1 up to rounding)
    assert abs(sum(got.values()) - 1.0) < 1e-4


# ------------------------------------------------------------- DOULION


def test_doulion_mod1_is_exact(spark):
    # p = 1 keeps every edge: the estimate IS the exact count
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 1)],
        "src long, dst long",
    )
    row = sampled_triangle_estimate(e, sample_mod=1).first()
    exact = triangle_count(e)
    # triangles: {1,2,3}, {3,4,5}, {1,3,5}
    assert row.est_triangles == row.n_triangles_sampled == exact == 3
    assert row.n_edges_sampled == 7


def test_doulion_deterministic_and_scaled(spark):
    e = spark.range(0, 300).select(
        (F.col("id") % 40).alias("src"), ((F.col("id") * 7 + 3) % 40).alias("dst")
    )
    r1 = sampled_triangle_estimate(e, sample_mod=2).first()
    r2 = sampled_triangle_estimate(e, sample_mod=2).first()
    assert r1 == r2  # md5 coin: replays identically
    assert r1.est_triangles == r1.n_triangles_sampled * 8


# ------------------------------------------------------------- SimRank


def _simrank_oracle(
    edges: list[tuple[int, int]], n_iter: int, c: float
) -> dict[tuple[int, int], float]:
    verts = sorted({v for e in edges for v in e})
    inn = {v: [s for s, d in edges if d == v] for v in verts}
    s = {(a, b): 1.0 if a == b else 0.0 for a in verts for b in verts}
    for _ in range(n_iter):
        ns = {}
        for a in verts:
            for b in verts:
                if a == b:
                    ns[(a, b)] = 1.0
                elif inn[a] and inn[b]:
                    tot = sum(s[(i, j)] for i in inn[a] for j in inn[b])
                    ns[(a, b)] = c * tot / (len(inn[a]) * len(inn[b]))
                else:
                    ns[(a, b)] = 0.0
        s = ns
    return s


def test_simrank_matches_python(spark):
    # the Jeh & Widom univ example shape: two "professors" citing
    # shared "students" plus a tail
    edges = [(1, 3), (1, 4), (2, 3), (2, 5), (4, 6), (5, 6), (3, 7), (6, 7)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.a, r.b): r.score for r in simrank(e, max_iter=3, c=0.5).collect()
    }
    exp = _simrank_oracle(edges, n_iter=3, c=0.5)
    # sparse state: absent pairs are exact zeros
    for (a, b), v in exp.items():
        assert abs(got.get((a, b), 0.0) - v) < 1e-9, ((a, b), got.get((a, b)), v)
    # symmetry + unit diagonal
    for (a, b), v in got.items():
        assert abs(got[(b, a)] - v) < 1e-12
        if a == b:
            assert v == 1.0


def test_simrank_topk_orientation(spark):
    edges = [(1, 3), (2, 3), (1, 4), (2, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = simrank_topk(e, max_iter=2, k=5).collect()
    # every returned pair is u < v and scores are 6dp-rounded
    assert all(r.u < r.v for r in rows)
    got = {(r.u, r.v): r.score for r in rows}
    exp = _simrank_oracle(edges, n_iter=2, c=0.5)
    assert got[(3, 4)] == round(exp[(3, 4)], 6)


def test_simrank_prune_drops_small_pairs(spark):
    edges = [(1, 3), (1, 4), (2, 3), (2, 5), (4, 6), (5, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    full = simrank(e, max_iter=3, c=0.5)
    pruned = simrank(e, max_iter=3, c=0.5, prune_below=0.3)
    kept = {(r.a, r.b) for r in pruned.filter(F.col("a") != F.col("b")).collect()}
    full_hi = {
        (r.a, r.b)
        for r in full.filter((F.col("a") != F.col("b")) & (F.col("score") >= 0.3)).collect()
    }
    # pruning is a sieve: everything it keeps scores >= the threshold
    # under the exact recurrence's kept-mass (subset check)
    assert kept <= full_hi


def test_ranking_metrics_hand_case(spark):
    from ccl_spark.retrieval import ranking_metrics

    truth = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
         ("q2", 20, 1), ("q2", 21, 2)],
        "query_id string, item_id long, rank long",
    )
    # q1: pred finds 10 at rank 2 and 12 at rank 3 (miss 11);
    # q2: no overlap at all
    pred = spark.createDataFrame(
        [("q1", 99, 1), ("q1", 10, 2), ("q1", 12, 3),
         ("q2", 77, 1), ("q2", 78, 2)],
        "query_id string, item_id long, rank long",
    )
    got = {r.query_id: r for r in ranking_metrics(pred, truth, 3).collect()}
    import math

    r1 = got["q1"]
    assert (r1.n_truth, r1.n_hits) == (3, 2)
    assert r1.recall == round(2 / 3, 6)
    assert r1.mrr == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(r1.ndcg - round(dcg / idcg, 6)) <= 1e-9
    r2 = got["q2"]
    assert (r2.n_hits, r2.recall, r2.mrr, r2.ndcg) == (0, 0.0, 0.0, 0.0)


def test_ranking_metrics_perfect(spark):
    from ccl_spark.retrieval import ranking_metrics

    rows = [("q", i, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "query_id string, item_id long, rank long")
    r = ranking_metrics(df, df, 5).first()
    assert (r.recall, r.mrr, r.ndcg) == (1.0, 1.0, 1.0)


def test_classification_report_matches_hand_counts(spark):
    from ccl_spark.retrieval import classification_report

    truth = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "doc_id long, lang string",
    )
    pred = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "a"), (5, "c")],
        "doc_id long, label string",
    )
    got = {r.label: r for r in classification_report(pred, truth).collect()}
    # a: tp=2 fp=1 fn=1 -> p=2/3 r=2/3 f1=2/3
    assert (got["a"].tp, got["a"].fp, got["a"].fn) == (2, 1, 1)
    assert got["a"].precision == round(2 / 3, 6)
    assert got["a"].f1 == round(2 / 3, 6)
    # b: tp=1 fp=1 fn=1
    assert (got["b"].tp, got["b"].fp, got["b"].fn) == (1, 1, 1)
    assert got["b"].recall == 0.5
    # c: perfect
    assert (got["c"].precision, got["c"].recall, got["c"].f1) == (1.0, 1.0, 1.0)

    # class never predicted and never correct: all-zero guard path
    truth2 = spark.createDataFrame([(0, "x"), (1, "y")], "doc_id long, lang string")
    pred2 = spark.createDataFrame([(0, "y"), (1, "y")], "doc_id long, label string")
    g2 = {r.label: r for r in classification_report(pred2, truth2).collect()}
    assert (g2["x"].tp, g2["x"].fp, g2["x"].fn) == (0, 0, 1)
    assert g2["x"].precision == 0.0 and g2["x"].recall == 0.0 and g2["x"].f1 == 0.0


def test_auc_rank_matches_pairwise_definition(spark):
    from ccl_spark.retrieval import auc_rank

    # scores with ties across classes
    rows = [
        (1.0, 0), (2.0, 0), (2.0, 1), (3.0, 0), (3.0, 1), (3.0, 1),
        (4.0, 1), (5.0, 0), (5.0, 1), (6.0, 1),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    r = auc_rank(df).first()

    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    want = round(wins / (len(pos) * len(neg)), 6)
    assert r.auc == want
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))

    # perfect separation -> 1.0; inverted -> 0.0
    perf = spark.createDataFrame([(1.0, 0), (2.0, 0), (3.0, 1)], "score double, label int")
    assert auc_rank(perf).first().auc == 1.0
    inv = spark.createDataFrame([(3.0, 0), (1.0, 1)], "score double, label int")
    assert auc_rank(inv).first().auc == 0.0


def test_rrf_fuse_hand_computed(spark):
    from ccl_spark.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank long"
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k_const=60, topk=10).collect()}
    assert got[11] == round(1 / 62 + 1 / 61, 6)  # in both lists
    assert got[10] == round(1 / 61, 6)
    assert got[12] == round(1 / 63, 6)
    assert got[13] == round(1 / 62, 6)
    # doc 11 wins: appears in both rankers
    assert max(got, key=got.get) == 11


def test_tf_topk_counts_and_ties(spark):
    from ccl_spark.retrieval import tf_topk

    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x y y"), (2, "z z z")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "x"), (1, "y")], "query_id long, term string")
    got = [(r.doc_id, r.tf_sum) for r in tf_topk(docs, q, k=10)
           .orderBy("doc_id").collect()]
    assert got == [(0, 3), (1, 3)]  # doc 2 has no query terms


def test_ltr_features_join_consistency(spark):
    from ccl_spark.retrieval import bm25_topk, ltr_features
    from ccl_spark.textops import readability_scores

    docs = spark.createDataFrame(
        [(0, "spark joins data. fast data joins!"),
         (1, "data data data"),
         (2, "nothing relevant here at all"),
         (3, "joins of data and data")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "data"), (1, "joins")], "query_id long, term string")
    feats = {r.doc_id: r for r in ltr_features(docs, q, k=4).collect()}

    # candidate set == bm25 top-k; ranks are 1..n by (score desc, doc_id)
    bm = {r.doc_id: r.score for r in bm25_topk(docs, q, k=4).collect()}
    assert set(feats) == set(bm)
    for d, r in feats.items():
        assert r.bm25 == bm[d]
    ranks = sorted((r.rank, r.doc_id) for r in feats.values())
    assert [x[0] for x in ranks] == list(range(1, len(feats) + 1))

    # tf_sum is the raw query-term count; n_chars/flesch match the doc tables
    assert feats[1].tf_sum == 3 and feats[3].tf_sum == 3  # 2x data + joins
    rd = {r.doc_id: r.flesch for r in readability_scores(docs).collect()}
    for d, r in feats.items():
        assert r.flesch == rd[d]
        assert r.n_chars > 0 and r.n_words > 0
