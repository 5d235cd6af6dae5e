from __future__ import annotations

import hashlib
import math

from ccl_spark.similarity import centroid_classify
from ccl_spark.textops import (
    tfidf_doc_similarity,
    winnow_fingerprints,
    winnow_pairs,
)


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _winnow_oracle(text: str, n: int, w: int) -> set[tuple[int, int]]:
    toks = text.split(" ")
    grams = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ] if len(toks) >= n else []
    hs = [_h(g) for g in grams]
    ng = len(hs)
    out: set[tuple[int, int]] = set()
    for s in range(max(ng - w, 0) + 1) if ng else []:
        window = hs[s : s + w]
        m = min(window)
        # rightmost minimal
        pos = max(i for i in range(s, min(s + w, ng)) if hs[i] == m)
        out.add((pos, hs[pos]))
    return out


def test_winnow_matches_python(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog again today",
        2: "alpha beta gamma delta",
        3: "a b",  # fewer than n words -> no fingerprints
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    rows = winnow_fingerprints(docs, n=3, w=4).collect()
    got: dict[int, set[tuple[int, int]]] = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    assert got.get(1) == _winnow_oracle(texts[1], 3, 4)
    assert got.get(2) == _winnow_oracle(texts[2], 3, 4)
    assert 3 not in got


def test_winnow_shared_substring_guarantee(spark):
    # the MOSS guarantee: a shared run of >= n + w - 1 words yields at
    # least one shared fingerprint
    shared = "one two three four five six seven"  # 7 >= 3 + 4 - 1 + 1
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " zz"),
            (2, shared + " aa bb cc dd"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_pairs(docs, n=3, w=4, min_shared=1, max_df=None).collect()
    assert any(r.id_a == 1 and r.id_b == 2 for r in pairs)


def test_winnow_pairs_threshold_and_cap(spark):
    base = "p q r s t u v w x y"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "k l m n o")],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(docs, n=3, w=4, min_shared=2, max_df=None).collect()
    }
    # identical docs share every fingerprint; doc 3 shares none
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == len(_winnow_oracle(base, 3, 4))
    # max_df=1 drops every shared fingerprint -> no pairs
    assert (
        winnow_pairs(docs, n=3, w=4, min_shared=1, max_df=1).count() == 0
    )


# ----------------------------------------------------- centroid classify


def test_centroid_classify_separable(spark):
    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<double>, label long",
    )
    test = spark.createDataFrame(
        [(10, [0.8, 0.2]), (11, [0.2, 0.8])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.pred_label for r in centroid_classify(train, test).collect()}
    assert got == {10: 0, 11: 1}


def test_centroid_classify_matches_python(spark):
    rng_vecs = {
        i: [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(6)] for i in range(12)
    }
    labels = {i: i % 3 for i in range(12)}
    train_ids = [i for i in rng_vecs if i % 4 != 0]
    test_ids = [i for i in rng_vecs if i % 4 == 0]
    train = spark.createDataFrame(
        [(i, rng_vecs[i], labels[i]) for i in train_ids],
        "vec_id long, embedding array<double>, label long",
    )
    test = spark.createDataFrame(
        [(i, rng_vecs[i]) for i in test_ids],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.pred_label, r.cosine)
        for r in centroid_classify(train, test).collect()
    }
    # pure-python replay with the same integer quantization
    q = {i: [round(x * 1000) for x in v] for i, v in rng_vecs.items()}
    cents: dict[int, list[int]] = {}
    for i in train_ids:
        c = cents.setdefault(labels[i], [0] * 6)
        for j, x in enumerate(q[i]):
            c[j] += x
    for i in test_ids:
        best = None
        for lab in sorted(cents):
            s = cents[lab]
            dot = sum(x * y for x, y in zip(q[i], s))
            cos = dot / math.sqrt(
                sum(x * x for x in q[i]) * sum(y * y for y in s)
            )
            if best is None or cos > best[1] + 1e-15:
                best = (lab, cos)
        assert got[i][0] == best[0], (i, got[i], best)
        assert abs(got[i][1] - round(best[1], 6)) <= 1e-6


# ------------------------------------------------------------ doc sim


def test_tfidf_doc_similarity_matches_python(spark):
    texts = {
        1: "x y x z",
        2: "x y q",
        3: "z z q",
        4: "w w w",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.score
        for r in tfidf_doc_similarity(docs, k=100).collect()
    }
    tf: dict[tuple[int, str], int] = {}
    for d, t in texts.items():
        for tok in t.split(" "):
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df: dict[str, int] = {}
    for (d, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    n = float(len(texts))
    exp: dict[tuple[int, int], float] = {}
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            s = 0.0
            for tok in df:
                if (a, tok) in tf and (b, tok) in tf:
                    idf = math.log(n / df[tok])
                    s += tf[(a, tok)] * tf[(b, tok)] * idf * idf
            if s != 0.0:
                exp[(a, b)] = round(s, 6)
    assert set(got) == set(exp)
    for k_, v in exp.items():
        assert abs(got[k_] - v) < 2e-6
