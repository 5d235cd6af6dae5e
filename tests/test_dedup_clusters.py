"""dup_clusters / dedup_corpus: transitive closure of verified
near-dup pairs into keep-sets (round-3 verdict ask #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccl_spark.dedup import dedup_corpus, dup_clusters


def test_dup_clusters_transitive(spark):
    """A~B and B~C but A≁C must still land in ONE cluster {A, B, C}
    with keep = min id — plus an independent 2-cluster to show
    clusters don't bleed into each other."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.keep) for r in dup_clusters(pairs).collect()
    }
    assert got == {
        1: (1, 1),
        2: (1, 0),
        3: (1, 0),
        10: (10, 1),
        11: (10, 0),
    }


def test_dup_clusters_chain_order_free(spark):
    """Pair orientation/order must not matter (canonical min labels)."""
    fwd = spark.createDataFrame([(5, 4), (3, 4), (2, 3)], "id_a long, id_b long")
    got = sorted(
        (r.cluster_id, r.doc_id, r.keep) for r in dup_clusters(fwd).collect()
    )
    assert got == [(2, 2, 1), (2, 3, 0), (2, 4, 0), (2, 5, 0)]


def test_dedup_corpus_end_to_end(spark):
    """Exact dups + a transitive near-dup chain: survivors are the
    min-id representative of each cluster plus every unpaired doc."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1 -> dropped
            (3, base + " tonight"),  # near-dup of 1 -> same cluster
            (4, "completely different text about spark engines and big data"),
            (5, "another unrelated document with its own words entirely"),
        ],
        "doc_id long, text string",
    )
    out = dedup_corpus(docs, threshold=0.5)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 4, 5]
    # schema passes through untouched
    assert out.columns == ["doc_id", "text"]


def test_dup_clusters_keep_count_matches_cluster_count(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "id_a long, id_b long"
    )
    cl = dup_clusters(pairs)
    n_clusters = cl.select("cluster_id").distinct().count()
    n_keep = cl.filter(F.col("keep") == 1).count()
    assert n_clusters == n_keep == 10
