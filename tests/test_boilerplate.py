"""Line-level boilerplate removal: hand-built cases + datagen replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.boilerplate import remove_boilerplate
from ccl_spark.datagen import (
    generate_pages,
    host_footer,
    page_main_text,
)
from ccl_spark.extract import extract_text


def _collect(df):
    return {(r["url"], r["host"], r["text"]) for r in df.collect()}


def test_hand_case(spark):
    rows = [
        ("a1", "A", "unique one\nFOOTER"),
        ("a2", "A", "unique two\nFOOTER"),
        ("a3", "A", "FOOTER"),
        ("b1", "B", "FOOTER"),  # different group: df=1, kept
        ("b2", "B", "other text"),
    ]
    docs = spark.createDataFrame(rows, "url string, host string, text string")
    got = _collect(remove_boilerplate(docs, max_ratio=0.5))
    assert got == {
        ("a1", "A", "unique one"),
        ("a2", "A", "unique two"),
        ("a3", "A", ""),  # fully-boilerplate doc survives as empty
        ("b1", "B", "FOOTER"),
        ("b2", "B", "other text"),
    }


def test_order_preserved(spark):
    rows = [
        ("a1", "A", "first\nFOOTER\nlast"),
        ("a2", "A", "uno\nFOOTER\ndos"),
    ]
    docs = spark.createDataFrame(rows, "url string, host string, text string")
    got = _collect(remove_boilerplate(docs))
    assert ("a1", "A", "first\nlast") in got
    assert ("a2", "A", "uno\ndos") in got


def test_datagen_footers_stripped(spark):
    n, seed = 300, 42
    n_hosts = n // 50
    pages = generate_pages(spark, n, seed=seed)
    docs = extract_text(pages).select(
        "url",
        F.regexp_extract("url", r"https://(h\d+)\.", 1).alias("host"),
        "text",
    )
    got = {r["url"]: r["text"] for r in remove_boilerplate(docs).collect()}
    assert len(got) == n
    for i in range(n):
        url = f"https://h{i % n_hosts}.example.com/p/{i}"
        # footer gone (where present), unique main text intact
        assert got[url] == page_main_text(i, seed)
    # sanity: the corpus really contained footer mass to strip
    assert any(host_footer(h, seed) for h in range(n_hosts))
