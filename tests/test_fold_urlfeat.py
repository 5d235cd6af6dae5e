from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.edges import url_features
from ccl_spark.textops import winnow_fingerprints, winnow_pairs, winnow_pairs_fold


def _fold_inputs(spark):
    base = "one two three four five six seven eight nine ten"
    texts = {
        1: "aa bb " + base,           # old
        2: base + " cc dd",           # old — near-dup of 1
        4: "xx yy " + base + " zz",   # new — near-dup of 1 and 2
        8: "p q r s t u v w",         # new — unrelated
    }
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


def test_fold_equals_from_scratch_restriction(spark):
    docs = _fold_inputs(spark)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    index = winnow_fingerprints(old).select("doc_id", "fp").distinct()
    pairs, new_index = winnow_pairs_fold(index, new, min_shared=1, max_df=None)
    got = {(r.id_a, r.id_b): r.n_shared for r in pairs.collect()}
    full = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(docs, min_shared=1, max_df=None).collect()
        if r.id_a % 4 == 0 or r.id_b % 4 == 0
    }
    assert got == full and got  # non-trivial: batch doc 4 matches 1 and 2
    # updated index covers old + new fingerprints exactly
    all_fps = winnow_fingerprints(docs).select("doc_id", "fp").distinct()
    assert new_index.count() == all_fps.count()
    assert new_index.exceptAll(all_fps).count() == 0


def test_fold_new_new_pairs_counted_once(spark):
    base = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [(4, base), (8, base)], "doc_id long, text string"
    )
    empty_index = docs.sparkSession.createDataFrame([], "doc_id long, fp long")
    pairs, _ = winnow_pairs_fold(empty_index, docs, min_shared=1, max_df=None)
    rows = pairs.collect()
    assert len(rows) == 1 and rows[0].id_a == 4 and rows[0].id_b == 8
    # shared count equals the fingerprint-set size, not twice it
    n_fp = winnow_fingerprints(docs).filter(F.col("doc_id") == 4).count()
    assert rows[0].n_shared == n_fp


def test_url_features_parsing(spark):
    urls = spark.createDataFrame(
        [
            (1, "HTTPS://Sub.Example.COM:8080/a/b/c?x=1&y=2&z=3#frag"),
            (2, "http://example.org"),
            (3, "https://Example.net:443/"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in url_features(urls, id_col="doc_id").collect()}
    r1 = rows[1]
    assert r1.host == "sub.example.com" and r1.is_https
    assert r1.path_depth == 3 and r1.n_params == 3 and r1.tld == "com"
    r2 = rows[2]
    assert r2.host == "example.org" and not r2.is_https
    assert r2.path_depth == 0 and r2.n_params == 0 and r2.tld == "org"
    r3 = rows[3]
    assert r3.host == "example.net" and r3.is_https and r3.path_depth == 0
