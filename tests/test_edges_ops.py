from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.datagen import generate_pages
from ccl_spark.edges import degrees, hub_vertices, page_edges, salted_in_degrees


def test_salted_degrees_equal_plain(spark):
    e = page_edges(generate_pages(spark, 300, seed=4))
    plain = {r.vertex: r.in_deg for r in degrees(e).filter("in_deg > 0").collect()}
    salted = {r.vertex: r.in_deg for r in salted_in_degrees(e).collect()}
    assert salted == plain


def test_hub_vertices(spark):
    star = spark.createDataFrame(
        [(i, 1000) for i in range(1, 30)] + [(1, 2)], "src long, dst long"
    )
    hubs = {r.vertex: r.in_deg for r in hub_vertices(star, threshold=10).collect()}
    assert hubs == {1000: 29}
