from __future__ import annotations

import math

from ccl_spark.cooc import pmi_topk, skipgram_pairs


def _pairs_oracle(texts: dict[int, str], window: int) -> dict[tuple[str, str], int]:
    cnt: dict[tuple[str, str], int] = {}
    for _, text in texts.items():
        toks = text.split(" ")
        for i, c in enumerate(toks):
            for j in range(max(0, i - window), min(len(toks), i + window + 1)):
                if j == i:
                    continue
                cnt[(c, toks[j])] = cnt.get((c, toks[j]), 0) + 1
    return cnt


def test_skipgram_pairs_vs_python(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.center, r.context): r.cnt
        for r in skipgram_pairs(docs, window=2).collect()
    }
    assert got == _pairs_oracle(texts, 2)


def test_skipgram_window_bounds(spark):
    # window=1 on a 3-token doc: only adjacent pairs, both directions
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = {
        (r.center, r.context): r.cnt
        for r in skipgram_pairs(docs, window=1).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1, ("c", "b"): 1}


def test_pmi_matches_python(spark):
    texts = {
        1: "x y x y x y",
        2: "x y z z z x y",
        3: "q r q r",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    pairs = _pairs_oracle(texts, 2)
    t = sum(pairs.values())
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for (a, b), c in pairs.items():
        ca[a] = ca.get(a, 0) + c
        cb[b] = cb.get(b, 0) + c
    exp = {
        (a, b): round(math.log(c * t / (ca[a] * cb[b])), 6)
        for (a, b), c in pairs.items()
        if c >= 2
    }
    got = {
        (r.center, r.context): r.pmi
        for r in pmi_topk(docs, window=2, min_count=2, k=100).collect()
    }
    assert got == exp


def test_negative_samples_replay(spark):
    import hashlib

    from ccl_spark.cooc import negative_samples

    texts = {1: "a a a b b c", 2: "a b c d"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "center string, context string"
    )
    got = {
        (r.center, r.context, r.i): r.neg
        for r in negative_samples(pairs, docs, k=3).collect()
    }
    # pure-Python replay of the md5-mod draw over the cumulative table
    cnt: dict[str, int] = {}
    for t in texts.values():
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
    order = sorted(cnt, key=lambda w: (-cnt[w], w))
    total = sum(cnt.values())
    cum = []
    lo = 0
    for w in order:
        cum.append((w, lo, lo + cnt[w]))
        lo += cnt[w]
    exp = {}
    for c, x in [("a", "b"), ("c", "d")]:
        for i in range(3):
            r = (
                int(hashlib.md5(f"{c}|{x}|{i}|neg".encode()).hexdigest()[:13], 16)
                % total
            )
            exp[(c, x, i)] = next(w for w, a, b in cum if a <= r < b)
    assert got == exp
