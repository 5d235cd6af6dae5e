"""Pure-Python oracles for the Naive Bayes classifier and the fused
link-prediction feature table."""

from __future__ import annotations

import math

import pytest


def test_naive_bayes_matches_python(spark):
    from ccl_spark.textops import naive_bayes_classify, naive_bayes_train

    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog ate the bone", "en"),
        (2, "le chat dort sur le lit", "fr"),
        (3, "le chien mange le os", "fr"),
        (4, "the cat and the dog", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cs, tc, vocab = naive_bayes_train(docs)
    got = {
        (r.doc_id, r.label): (r.score, r.best)
        for r in naive_bayes_classify(docs, cs, tc, vocab, len(rows)).collect()
    }

    # python replay
    counts, totals, ndocs = {}, {}, {}
    for _, text, lang in rows:
        ndocs[lang] = ndocs.get(lang, 0) + 1
        for t in text.lower().split(" "):
            if t:
                counts[(t, lang)] = counts.get((t, lang), 0) + 1
                totals[lang] = totals.get(lang, 0) + 1
    V = len({t for t, _ in counts})
    for doc_id, text, _ in rows:
        toks = [t for t in text.lower().split(" ") if t]
        scores = {}
        for y in ndocs:
            s = math.log(ndocs[y]) - math.log(len(rows))
            for t in toks:
                s += math.log(counts.get((t, y), 0) + 1.0) - math.log(totals[y] + V)
            scores[y] = round(s, 6)
        best = min(scores, key=lambda y: (-scores[y], y))
        for y in ndocs:
            g_score, g_best = got[(doc_id, y)]
            assert g_score == pytest.approx(scores[y], abs=2e-6)
            assert g_best == (y == best)

    # sanity: english docs classify english with the separable vocab
    assert got[(0, "en")][1] and got[(2, "fr")][1]


def test_lp_features_matches_python(spark):
    from ccl_spark.graphstats import link_prediction_features

    raw = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {
        (r.u, r.v): (r.common, r.aa, r.ra, r.jaccard, r.pa)
        for r in link_prediction_features(edges, k=100).collect()
    }

    adj = {}
    for s, d in raw:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    existing = {tuple(sorted(p)) for p in raw}
    verts = sorted(adj)
    want = {}
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in existing:
                continue
            commons = adj[u] & adj[v]
            if not commons:
                continue
            aa = sum(1.0 / math.log(len(adj[w])) for w in commons)
            ra = sum(1.0 / len(adj[w]) for w in commons)
            jac = len(commons) / (len(adj[u]) + len(adj[v]) - len(commons))
            want[(u, v)] = (
                len(commons),
                round(aa, 6),
                round(ra, 6),
                round(jac, 6),
                len(adj[u]) * len(adj[v]),
            )
    assert set(got) == set(want)
    for p, (cn, aa, ra, jac, pa) in want.items():
        g = got[p]
        assert g[0] == cn and g[4] == pa
        assert g[1] == pytest.approx(aa, abs=2e-6)
        assert g[2] == pytest.approx(ra, abs=2e-6)
        assert g[3] == pytest.approx(jac, abs=2e-6)


def test_readability_hand_computed(spark):
    from ccl_spark.textops import readability_scores

    docs = spark.createDataFrame(
        [(0, "The cat sat. The dog ran!"), (1, "aaa"), (2, "xyz qrs")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability_scores(docs).collect()}
    # doc 0: 6 words, 2 sentences, syllable runs: e,a,a,e,o,a = 6
    r0 = got[0]
    assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (6, 2, 6)
    want = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert r0.flesch == want
    # doc 1: one word, no sentence punct (floor 1), one vowel run
    assert (got[1].n_words, got[1].n_sentences, got[1].n_syllables) == (1, 1, 1)
    # doc 2: zero vowels -> syllables floored at 1
    assert got[2].n_syllables == 1


def test_ann_two_stage_contains_exact_top_when_coarse_recalls(spark):
    import random

    from ccl_spark.similarity import ann_two_stage

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # coarse_k = corpus size -> stage 2 IS the exact brute force
    got = [r.vec_id for r in ann_two_stage(emb, coarse_dims=4, coarse_k=59, k=5).collect()]

    import numpy as np

    q = np.round(np.array(rows[0][1], dtype=np.float64) * 1000)
    def dot(v):
        return int((np.round(np.array(v, dtype=np.float64) * 1000) * q).sum())
    # replicate float32 storage: cast through float32 before quantizing
    def dot32(v):
        a = np.round(np.array(v, dtype=np.float32).astype(np.float64) * 1000)
        b = np.round(np.array(rows[0][1], dtype=np.float32).astype(np.float64) * 1000)
        return int((a * b).sum())
    want = sorted(((dot32(v), -i) for i, v in rows if i != 0), reverse=True)[:5]
    assert got == [-i for _, i in want]

    # with a small coarse_k the output is still k rows from the candidate set
    small = ann_two_stage(emb, coarse_dims=4, coarse_k=10, k=5).collect()
    assert len(small) == 5
    assert all(r.dot >= small[-1].dot for r in small)


def test_hashed_features_replay_and_counts(spark):
    import hashlib

    from ccl_spark.textops import hashed_features

    docs = spark.createDataFrame(
        [(0, "A b a  b"), (1, "xyz")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.bucket): r.cnt for r in hashed_features(docs, n_buckets=8).collect()}

    def b(tok):
        return int(hashlib.md5(f"{tok},feat".encode()).hexdigest()[:15], 16) % 8

    # lowercased: doc 0 = a,b,a,b (empty from double space dropped)
    from collections import Counter
    want = Counter()
    want[(0, b("a"))] += 2
    want[(0, b("b"))] += 2
    want[(1, b("xyz"))] += 1
    assert got == dict(want)
    # total token mass is conserved through the hash
    assert sum(got.values()) == 5
