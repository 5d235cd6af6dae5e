"""Anchor-text aggregation: the search-engine-style inverted summary
of what *other* pages call a target page.

For every link target, aggregate the anchor text of its incoming
links into (a) an in-link count and (b) the top-k anchor terms with
deterministic tie-breaks — the classic web-graph signal (anchor text
describes the *target*, not the source; see Brin & Page 1998 §2.2)
and a standard feature in LLM-corpus quality filtering.

Scale shape (100 TB story):
- term counting is a single ``groupBy(dst_url, term)`` — map-side
  partial aggregation absorbs the Zipf skew of common terms;
- per-target top-k is a ``row_number`` window partitioned by
  ``dst_url`` — one hash exchange on the target key, no global sort;
- the optional "top-N targets" restriction joins the (tiny) top-N
  table back with a broadcast, so the full term table is never
  collected or globally sorted.

Nothing here is quadratic: every operator is keyed by dst_url (or
(dst_url, term)), so the work is proportional to the number of link
occurrences, exactly like the in-degree computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def anchor_term_counts(anchors: DataFrame) -> DataFrame:
    """(dst_url, term, n): whitespace-tokenized anchor-term counts per
    link target. One shuffle, map-side combined."""
    return (
        anchors.select(
            "dst_url", F.explode(F.split(F.col("anchor"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("dst_url", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def anchor_term_index(anchors: DataFrame, k_terms: int = 3) -> DataFrame:
    """Per-target anchor summary: (dst_url, n_inlinks, rank, term, n).

    ``rank`` is the 1-based position of ``term`` among the target's
    anchor terms ordered by (count DESC, term ASC) — fully
    deterministic, reproducible across engines.
    """
    counts = anchor_term_counts(anchors)
    w = Window.partitionBy("dst_url").orderBy(F.desc("n"), F.asc("term"))
    topk = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_terms
    )
    inlinks = anchors.groupBy("dst_url").agg(
        F.count(F.lit(1)).alias("n_inlinks")
    )
    return topk.join(inlinks, "dst_url").select(
        "dst_url", "n_inlinks", "rank", "term", "n"
    )


def top_anchored_targets(
    anchors: DataFrame, n_targets: int = 20, k_terms: int = 3
) -> DataFrame:
    """anchor_term_index restricted to the ``n_targets`` most-linked
    targets (ties broken on dst_url ASC). The top-N table is tiny and
    broadcast back onto the term index."""
    top = (
        anchors.groupBy("dst_url")
        .agg(F.count(F.lit(1)).alias("n_inlinks"))
        .orderBy(F.desc("n_inlinks"), F.asc("dst_url"))
        .limit(n_targets)
        .select("dst_url")
    )
    idx = anchor_term_index(anchors, k_terms=k_terms)
    return idx.join(F.broadcast(top), "dst_url").orderBy(
        F.desc("n_inlinks"), F.asc("dst_url"), F.asc("rank")
    )
