"""The end-to-end training-corpus preparation funnel — the product
composition every LLM data pipeline ships: quality gate → exact-dup
collapse → near-dup cluster dedup → token accounting.

Each stage is an existing audited operator (gopher_quality_flags,
collapse_exact, near_duplicates + dup_clusters via dedup_corpus); this
module owns only the composition and the funnel accounting, so the
100-TB properties are inherited: the quality gate is a zero-shuffle
projection, exact collapse is one text-hash groupBy, and the near-dup
stage is the banded-LSH path that never goes all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    **gopher_kwargs,
) -> DataFrame:
    """The surviving training documents: Gopher-rule keep → exact +
    near-dup dedup (min-id representatives).  Same schema as
    ``docs``."""
    from .dedup import dedup_corpus
    from .textops import gopher_quality_flags

    kept_ids = (
        gopher_quality_flags(docs, id_col=id_col, text_col=text_col, **gopher_kwargs)
        .filter(F.col("keep"))
        .select(F.col("doc_id").alias(id_col))
    )
    kept = docs.join(kept_ids, id_col, "left_semi")
    return dedup_corpus(kept, id_col, text_col, threshold=near_dup_threshold)


def corpus_funnel_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    **gopher_kwargs,
) -> DataFrame:
    """One row of per-stage survivor counts for the funnel —
    ``(n_raw, n_quality, n_exact, n_final, total_tokens)``:
    raw documents, Gopher-keep survivors, distinct-text
    representatives among them, post-near-dup survivors, and the
    whitespace token count of the final corpus.  The monitoring row a
    production pipeline logs per crawl batch."""
    from .dedup import collapse_exact
    from .textops import gopher_quality_flags

    from .dedup import dup_clusters, near_duplicates

    n_raw = docs.agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    kept_ids = (
        gopher_quality_flags(docs, id_col=id_col, text_col=text_col, **gopher_kwargs)
        .filter(F.col("keep"))
        .select(F.col("doc_id").alias(id_col))
    )
    kept = docs.join(kept_ids, id_col, "left_semi").localCheckpoint(eager=True)
    n_quality = kept.agg(F.count(F.lit(1)).cast("long").alias("n_quality"))
    reps = collapse_exact(kept, id_col, text_col).localCheckpoint(eager=True)
    n_exact = reps.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    # inline dedup_corpus over the stage outputs already in hand — the
    # funnel runs every stage exactly once
    pairs = near_duplicates(
        kept, id_col, text_col, threshold=near_dup_threshold
    )
    drop = dup_clusters(pairs).filter(F.col("keep") == 0).select(
        F.col("doc_id").alias("id")
    )
    final = (
        kept.join(
            reps.join(drop, "id", "left_anti").select(F.col("id").alias(id_col)),
            id_col,
            "left_semi",
        )
        .localCheckpoint(eager=True)
    )
    n_final = final.agg(F.count(F.lit(1)).cast("long").alias("n_final"))
    toks = final.agg(
        F.sum(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
        .alias("total_tokens")
    )
    return (
        n_raw.crossJoin(n_quality)
        .crossJoin(n_exact)
        .crossJoin(n_final)
        .crossJoin(toks)
    )


def curation_funnel(
    docs: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """URL/host-level curation funnel — the stages upstream of the
    document funnel (:func:`corpus_funnel_stats`): domain blocklist →
    per-host LM-quality terciles (computed on the SURVIVORS, the real
    pipeline order) → keep head+middle hosts.  One row
    ``(n_raw, n_unblocked, n_quality_hosts, n_docs_kept,
    total_tokens)``.

    Each stage runs once over the previous stage's checkpointed
    output; counts are 1-row aggregates cross-joined into the
    monitoring row (the same no-recompute discipline as
    corpus_funnel_stats)."""
    from .edges import blocklist_filter
    from .textops import host_quality_buckets

    n_raw = docs.agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    unblocked = (
        blocklist_filter(docs, blocklist, host_col=host_col)
        .filter(~F.col("blocked"))
        .drop("blocked")
        .localCheckpoint(eager=True)
    )
    n_unblocked = unblocked.agg(
        F.count(F.lit(1)).cast("long").alias("n_unblocked")
    )
    buckets = host_quality_buckets(
        unblocked, host_col=host_col, id_col=id_col, text_col=text_col
    )
    keep_hosts = buckets.filter(F.col("keep")).select(
        F.col("host").alias(host_col)
    )
    n_quality_hosts = keep_hosts.agg(
        F.count(F.lit(1)).cast("long").alias("n_quality_hosts")
    )
    kept = unblocked.join(F.broadcast(keep_hosts), host_col, "left_semi")
    finals = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.coalesce(
            F.sum(F.size(F.split(F.col(text_col), " "))), F.lit(0)
        )
        .cast("long")
        .alias("total_tokens"),
    )
    return (
        n_raw.crossJoin(n_unblocked).crossJoin(n_quality_hosts).crossJoin(finals)
    )
