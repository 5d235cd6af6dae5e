"""BM25 ranked retrieval over a document corpus — the classic
probabilistic relevance scoring (Robertson & Spärck Jones; the
Okapi/Lucene ``k1``/``b`` form) that turns the inverted-index stage
into an actual search path.

Reference scope: the reference engine's text path stops at per-page
extraction (ccl/extract + tests); ranked retrieval over the extracted
text is the natural query-serving stage for a web-corpus engine and
sits in SURVEY §2's pipeline extensions next to tfidf/inverted_index.

Execution shape (100-TB story):
- the corpus side is three narrow aggregates off ONE tokenization
  pass: (doc, term) tf counts (map-side partials absorb Zipf skew),
  per-term document frequency derived from the tf table (never a
  second corpus scan), and per-doc length as a sum over the same tf
  rows;
- corpus-level scalars (N, avgdl) ride in as a broadcast one-row
  frame — no ``collect``;
- the query set is tiny by definition, so it broadcast-joins against
  the tf table on ``term``: the only exchange bigger than the query
  set is the final per-query top-k, keyed by ``query_id`` — no
  partition ever exceeds one query's candidate list. A 100-TB corpus
  scores a query batch with exactly one pass over the posting rows of
  the queried terms (Catalyst pushes the semi-join on ``term`` into
  the tf aggregation's probe side).

Determinism: tf/df/dl are exact integers; the score is a short double
expression rounded to 6dp with a (score DESC, doc_id ASC) tie-break,
so Spark and the SQL oracle select identical top-k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is a ``(query_id long, term string)`` frame — one row
    per query term (duplicate terms in a query count once; the scoring
    is over the distinct term set, the standard bag-of-terms form).

    Returns ``(query_id, doc_id, score)`` with
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene
    always-positive variant) and the usual saturated-tf length
    normalization.  Score is rounded to 6dp; ties break on doc_id.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    ).crossJoin(tf.agg(F.sum("tf").cast("double").alias("total_len")))

    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("term").alias("term"),
    ).distinct()

    scored = (
        tf.join(F.broadcast(q), "term")
        .join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("total_len") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "tscore",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("tscore"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )
