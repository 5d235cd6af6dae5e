"""Count-min sketch vs an independent hashlib.md5 replay + the CMS
never-undercount guarantee."""

from __future__ import annotations

import hashlib
from collections import Counter

from ccl_spark.sketch import cms_build, cms_estimate


def _bucket(token, row, width):
    h = hashlib.md5(f"{token},{row},cms".encode()).hexdigest()[:13]
    return int(h, 16) % width


def _py_cms(texts, depth, width):
    sk = Counter()
    for t in texts:
        for tok in t.split(" "):
            if tok:
                for r in range(depth):
                    sk[(r, _bucket(tok, r, width))] += 1
    return sk


def test_cms_matches_python_and_bounds(spark):
    texts = [
        "a a a b c d e f",
        "a b b g h i j k",
        "x y z a b c q r s t u v w",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    depth, width = 4, 16  # narrow width forces real collisions
    sk = cms_build(docs, depth=depth, width=width)
    got_sk = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert got_sk == dict(_py_cms(texts, depth, width))

    true = Counter(tok for t in texts for tok in t.split(" ") if tok)
    terms = spark.createDataFrame([(t,) for t in true], "token string")
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(sk, terms, depth=depth, width=width).collect()
    }
    # estimates equal the replay's min-over-rows, and never undercount
    pysk = _py_cms(texts, depth, width)
    for tok, c in true.items():
        exp = min(pysk[(r, _bucket(tok, r, width))] for r in range(depth))
        assert est[tok] == exp >= c
    assert est["a"] >= 5


def test_cms_size_bounded(spark):
    docs = spark.createDataFrame(
        [(f"tok{i} tok{i + 1} tok{i + 2}",) for i in range(200)], "text string"
    )
    sk = cms_build(docs, depth=3, width=32)
    assert sk.count() <= 3 * 32


def _bloom_pos(key, i, m):
    h = hashlib.md5(f"{key},{i},bloom".encode()).hexdigest()[:13]
    return int(h, 16) % m


def test_bloom_no_false_negatives_and_replay(spark):
    from ccl_spark.sketch import bloom_build, bloom_might_contain

    members = [f"url{i}" for i in range(50)]
    others = [f"miss{i}" for i in range(50)]
    m, k = 512, 3
    keys = spark.createDataFrame([(x,) for x in members], "key string")
    bloom = bloom_build(keys, m=m, k=k)
    got_pos = {r["pos"] for r in bloom.collect()}
    exp_pos = {_bloom_pos(x, i, m) for x in members for i in range(k)}
    assert got_pos == exp_pos

    cands = spark.createDataFrame(
        [(x,) for x in members + others], "key string"
    )
    got = {
        r["key"]: r["might_contain"]
        for r in bloom_might_contain(bloom, cands, m=m, k=k).collect()
    }
    # no false negatives
    assert all(got[x] for x in members)
    # python replay of the positive set (false positives included)
    for x in others:
        exp = all(_bloom_pos(x, i, m) in exp_pos for i in range(k))
        assert got[x] == exp
    # with m=512, k=3, n=50 most misses are rejected
    assert sum(got[x] for x in others) < 15


def test_cms_merge_equals_union_build(spark):
    from ccl_spark.sketch import cms_build, cms_estimate, cms_merge

    t1 = ["a a b c", "d e f a"]
    t2 = ["a b b g", "h a c c"]
    d1 = spark.createDataFrame([(t,) for t in t1], "text string")
    d2 = spark.createDataFrame([(t,) for t in t2], "text string")
    both = spark.createDataFrame([(t,) for t in t1 + t2], "text string")
    depth, width = 3, 32
    merged = cms_merge(
        cms_build(d1, depth=depth, width=width),
        cms_build(d2, depth=depth, width=width),
    )
    direct = cms_build(both, depth=depth, width=width)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }
    # estimates from the merged sketch match the direct build
    terms = spark.createDataFrame([("a",), ("c",), ("zz",)], "token string")
    em = {r["token"]: r["est"] for r in cms_estimate(merged, terms, depth, width).collect()}
    ed = {r["token"]: r["est"] for r in cms_estimate(direct, terms, depth, width).collect()}
    assert em == ed and em["a"] >= 5


def test_hll_merge_equals_union_build(spark):
    from ccl_spark.sketch import hll_build, hll_estimate, hll_merge

    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(2000, 6000).selectExpr("id AS v")
    whole = a.unionByName(b)
    merged = hll_merge(hll_build(a, "v"), hll_build(b, "v"))
    direct = hll_build(whole, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the folded estimate equals the whole-corpus estimate exactly
    assert hll_estimate(merged).first() == hll_estimate(direct).first()


def test_hll_estimate_accuracy(spark):
    from ccl_spark.sketch import hll_build, hll_estimate

    # m=64 -> typical relative error 1.04/sqrt(64) = 13%; assert a
    # generous 3-sigma band so the test pins sanity, not luck
    n = 10_000
    df = spark.range(0, n).selectExpr("id AS v")
    est = hll_estimate(hll_build(df, "v")).first()["estimate"]
    assert abs(est - n) / n < 0.4
    # duplicates must not move the estimate: cardinality, not count
    dup = df.unionByName(df).unionByName(df)
    est_dup = hll_estimate(hll_build(dup, "v")).first()["estimate"]
    assert est_dup == est


def test_hll_small_range_linear_counting(spark):
    from ccl_spark.sketch import hll_build, hll_estimate

    # 5 distinct values in 64 registers: the linear-counting branch
    # m*ln(m/V) with V >= 59 empty registers
    import math

    df = spark.createDataFrame([(i,) for i in range(5)], "v long")
    row = hll_estimate(hll_build(df, "v")).first()
    assert row["n_zero"] >= 59
    exp = 64.0 * math.log(64.0 / row["n_zero"])
    assert abs(row["estimate"] - round(exp, 6)) < 1e-9


def _py_kmv_hash(key: str) -> int:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def test_kmv_build_matches_python_replay(spark):
    from ccl_spark.sketch import kmv_build_grouped

    rows = [(f"g{i % 3}", f"key{j}") for i in range(3) for j in range(i * 7, i * 7 + 30)]
    df = spark.createDataFrame(rows, "group string, key string")
    got = {r.group: list(r.hashes) for r in kmv_build_grouped(df, k=8).collect()}

    keys = {}
    for g, k in rows:
        keys.setdefault(g, set()).add(k)
    expect = {
        g: sorted({_py_kmv_hash(k) for k in ks})[:8] for g, ks in keys.items()
    }
    assert got == expect
    # deterministic under repartition
    again = {
        r.group: list(r.hashes)
        for r in kmv_build_grouped(df.repartition(5), k=8).collect()
    }
    assert again == got

    import pytest

    with pytest.raises(ValueError):
        kmv_build_grouped(df, k=1)


def test_kmv_merge_equals_union_build(spark):
    from ccl_spark.sketch import kmv_build_grouped, kmv_merge_all

    rows = [("a", f"k{j}") for j in range(40)] + [("b", f"k{j}") for j in range(20, 70)]
    df = spark.createDataFrame(rows, "group string, key string")
    merged = kmv_merge_all(kmv_build_grouped(df, k=16), k=16).first().hashes
    union = (
        kmv_build_grouped(
            df.selectExpr("'all' as group", "key"), k=16
        ).first().hashes
    )
    assert list(merged) == list(union)


def test_kmv_jaccard_pairs_exact_and_estimated(spark):
    from ccl_spark.sketch import kmv_build_grouped, kmv_jaccard_pairs

    # small sets, k larger than the union -> everything exact
    rows = [("a", f"k{j}") for j in range(10)] + [("b", f"k{j}") for j in range(5, 15)]
    df = spark.createDataFrame(rows, "group string, key string")
    r = kmv_jaccard_pairs(kmv_build_grouped(df, k=64), k=64).first()
    assert (r.group_a, r.group_b) == ("a", "b")
    assert r.n_merged == 15 and r.n_shared == 5
    assert abs(r.jaccard_est - 5 / 15) < 1e-6
    assert r.union_est == 15.0

    # k smaller than the union -> python replay of the estimator
    rows = [("a", f"k{j}") for j in range(200)] + [
        ("b", f"k{j}") for j in range(100, 300)
    ]
    df = spark.createDataFrame(rows, "group string, key string")
    k = 32
    r = kmv_jaccard_pairs(kmv_build_grouped(df, k=k), k=k).first()
    ha = sorted({_py_kmv_hash(f"k{j}") for j in range(200)})[:k]
    hb = sorted({_py_kmv_hash(f"k{j}") for j in range(100, 300)})[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    shared = len(set(merged) & set(ha) & set(hb))
    assert r.n_merged == k and r.n_shared == shared
    assert abs(r.jaccard_est - round(shared / k, 6)) < 1e-9
    assert abs(r.union_est - round((k - 1) * 16**15 / merged[-1], 6)) < 1e-6
    # the estimates are in the right neighborhood of the truth
    assert abs(r.jaccard_est - 100 / 300) < 0.15
    assert abs(r.union_est - 300) < 120


def test_ddsketch_merge_equals_build_and_error_bound(spark):
    from ccl_spark.sketch import ddsketch_build, ddsketch_merge, ddsketch_quantiles

    rows = [("g", float(v)) for v in range(1, 401)] + [
        ("h", float(v * v) / 7.0) for v in range(1, 200)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    whole = ddsketch_build(df, "grp", "value")

    # shard-fold == union-build (exact mergeability)
    s1 = ddsketch_build(df.filter("value < 100"), "grp", "value")
    s2 = ddsketch_build(df.filter("value >= 100"), "grp", "value")
    folded = ddsketch_merge(s1, s2)
    a = {(r.group, r.bucket): r.cnt for r in whole.collect()}
    b = {(r.group, r.bucket): r.cnt for r in folded.collect()}
    assert a == b

    # dyadic guarantee: estimate is >= true quantile and < 2x (plus
    # quantization slack)
    est = {
        (r.group, r.p): r.est for r in ddsketch_quantiles(whole).collect()
    }
    import math

    for grp in ("g", "h"):
        vals = sorted(v for g, v in rows if g == grp)
        for p in (0.5, 0.9, 0.99):
            true = vals[math.ceil(p * len(vals)) - 1]
            e = est[(grp, p)]
            assert e >= true - 0.01
            assert e <= 2.0 * true + 0.01

    # zero/negative values land in bucket 0 with estimate 0
    z = ddsketch_build(
        spark.createDataFrame([("z", 0.0), ("z", -3.0)], "grp string, value double"),
        "grp",
        "value",
    )
    qz = ddsketch_quantiles(z, ps=(0.5,)).first()
    assert qz.est == 0.0 and qz.n == 2


def test_hll_overlap_tracks_true_intersections(spark):
    from ccl_spark.sketch import hll_build_grouped, hll_overlap_pairs

    # A = 0..599, B = 300..899 (300 shared), C = 2000..2099 (disjoint)
    rows = (
        [("A", i) for i in range(600)]
        + [("B", i) for i in range(300, 900)]
        + [("C", i) for i in range(2000, 2100)]
    )
    df = spark.createDataFrame(rows, "grp string, uid long")
    regs = hll_build_grouped(df, "grp", "uid", b=6)
    got = {(r.g1, r.g2): r for r in hll_overlap_pairs(regs, b=6).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    # b=6 HLL: ~13% relative error; the shared-300 pair must read far
    # above the disjoint pairs
    assert ab.overlap > 100
    assert abs(ab.est_a - 600) < 200 and abs(ab.est_b - 600) < 200
    assert got[("A", "C")].overlap < ab.overlap
    assert got[("B", "C")].overlap < ab.overlap
    # inclusion-exclusion identity holds on the rounded outputs
    for r in got.values():
        assert r.overlap == round(r.est_a + r.est_b - r.est_union, 6)
