"""Extraction invariants (BASELINE.json input_hint): byte-identical
text per url, lossless link recovery, identical results from the JVM
and Arrow extraction tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.datagen import generate_pages, ground_truth_edges
from ccl_spark.extract import extract_link_pairs, extract_pages_pandas, extract_text


def test_text_byte_identity(spark):
    pages = generate_pages(spark, 120, seed=3).cache()
    re_ex = extract_text(pages).withColumnRenamed("text", "text2")
    joined = pages.join(re_ex, "url")
    assert joined.count() == 120
    assert joined.filter(F.col("text") != F.col("text2")).count() == 0


def test_links_match_ground_truth(spark):
    pages = generate_pages(spark, 120, seed=3)
    got = {
        (r.src_url, r.dst_url) for r in extract_link_pairs(pages).collect()
    }
    assert got == set(ground_truth_edges(120, seed=3))


def test_pandas_tier_agrees_with_jvm_tier(spark):
    pages = generate_pages(spark, 60, seed=5).cache()
    jvm_text = {r.url: r.text for r in extract_text(pages).collect()}
    jvm_links = {}
    for r in extract_link_pairs(pages).collect():
        jvm_links.setdefault(r.src_url, set()).add(r.dst_url)
    for r in extract_pages_pandas(pages).collect():
        assert r.text == jvm_text[r.url]
        assert set(r.links) == jvm_links.get(r.url, set())
