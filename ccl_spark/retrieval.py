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


def ranking_metrics(
    pred: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Standard retrieval-evaluation metrics per query — recall@k,
    MRR@k, and binary-relevance NDCG@k of a predicted ranking against
    a ground-truth ranking (both tables ``(query, item, rank)``, rank
    1-based).  The evaluation harness of an ANN/BM25 stack: truth is
    usually the exact brute-force top-k, pred the index under test.

    One equi-join of the two rank-filtered tables on (query, item) +
    one groupBy — both sides are k-bounded per query, so the shuffle
    carries O(k·|queries|) rows regardless of corpus size.  Queries
    with no overlap still appear (left join from truth-side query
    list, zeros filled).  Floats are single log2/divisions rounded to
    6dp.  Returns ``(query, n_truth, n_hits, recall, mrr, ndcg)``.
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    p = pred.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("prank"),
    ).filter(F.col("prank") <= k)
    t = truth.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("trank"),
    ).filter(F.col("trank") <= k)
    tstats = t.groupBy("q").agg(F.count(F.lit(1)).alias("n_truth"))
    hits = t.join(p, ["q", "item"]).groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("prank").alias("best_rank"),
        F.sum(1.0 / F.log2(F.col("prank") + 1.0)).alias("dcg"),
    )
    # ideal DCG for n_truth binary-relevant items: sum_{i=1..n} 1/log2(i+1)
    idcg = F.expr(
        "aggregate(sequence(1, cast(n_truth as int)), cast(0.0 as double),"
        " (acc, i) -> acc + 1.0 / log2(cast(i as double) + 1.0))"
    )
    return (
        tstats.join(hits, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_truth"), 6
            ).alias("recall"),
            F.round(
                F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
    )


def classification_report(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "label",
    truth_col: str = "lang",
) -> DataFrame:
    """Per-class precision/recall/F1 from a prediction table and a
    truth table — the evaluation tail of any corpus classifier
    (language ID, quality, topic).  One equi-join on the id and one
    aggregate per class; counts are exact integers, the three float
    divisions happen once per class at the end (guarded to 0 on empty
    denominators).

    Returns ``(label, tp, fp, fn, precision, recall, f1)``, floats
    rounded to 6dp, one row per truth class.
    """
    j = truth.select(
        F.col(id_col).alias("id"), F.col(truth_col).alias("truth")
    ).join(
        pred.select(F.col(id_col).alias("id"), F.col(pred_col).alias("pred")),
        "id",
    )
    classes = truth.select(F.col(truth_col).alias("label")).distinct()
    tp = j.filter(F.col("truth") == F.col("pred")).groupBy(
        F.col("truth").alias("label")
    ).agg(F.count(F.lit(1)).alias("tp"))
    fp = j.filter(F.col("truth") != F.col("pred")).groupBy(
        F.col("pred").alias("label")
    ).agg(F.count(F.lit(1)).alias("fp"))
    fn = j.filter(F.col("truth") != F.col("pred")).groupBy(
        F.col("truth").alias("label")
    ).agg(F.count(F.lit(1)).alias("fn"))
    out = (
        classes.join(tp, "label", "left")
        .join(fp, "label", "left")
        .join(fn, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("fp"), F.lit(0)).alias("fp"),
            F.coalesce(F.col("fn"), F.lit(0)).alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return out.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("f1"),
    )


def auc_rank(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """ROC AUC by the rank-sum (Mann-Whitney) identity with exact tie
    handling: ``AUC = (R+ - n+(n+ + 1)/2) / (n+ n-)`` where R+ is the
    sum of average ranks of the positives.

    Scale shape: NO global row_number over the corpus — scores reduce
    to per-distinct-score (count, positives) first (one shuffle), and
    ranks come from a cumulative sum over the DISTINCT score table
    (orders of magnitude smaller; tie groups share the average rank
    ``cum_before + (cnt + 1)/2`` exactly, halves being binary-exact).

    Returns a single row ``(auc, n_pos, n_neg)``, auc rounded to 6dp.
    """
    per = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn(
        "avg_rank",
        F.col("cum_before") + (F.col("cnt") + F.lit(1)) / F.lit(2.0),
    )
    agg = ranked.agg(
        F.sum(F.col("pos") * F.col("avg_rank")).alias("r_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    return agg.select(
        F.round(
            (
                F.col("r_pos")
                - F.col("n_pos").cast("double")
                * (F.col("n_pos") + F.lit(1)).cast("double")
                / F.lit(2.0)
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            6,
        ).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    score-free combiner for hybrid retrieval (BM25 + embedding + ...):
    each ranker contributes ``1/(k + rank)`` for the documents it
    returns, fused by sum; k=60 is the canonical damping.

    Each input frame is ``(query_id, doc_id, rank)`` (rank 1-based;
    absent docs simply contribute nothing).  Per (query, doc) the sum
    has at most len(rankings) terms of integer-denominator reciprocals,
    so the fused score is engine-exact.  Union + one aggregate — the
    candidate lists are top-k-bounded per ranker, never corpus-sized.

    Returns ``(query_id, doc_id, rrf)`` top-``topk`` per query, rrf
    rounded to 6dp, (rrf DESC, doc_id) tie-break.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.lit(1.0) / (F.lit(k_const) + F.col("rank"))).alias("c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "doc_id", "rrf")
    )


def tf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw term-frequency ranker (the cheap first-stage retriever RRF
    typically fuses with a scored one): top-``k`` docs per query by
    summed query-term count, (count DESC, doc_id) tie-break.  Returns
    ``(query_id, doc_id, tf_sum)``."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"), "term"
    ).distinct()
    scored = (
        toks.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf_sum"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("tf_sum"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "tf_sum")
    )


def ltr_features(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learning-to-rank training-table prep: BM25 candidate generation
    (top-``k`` per query) joined ONCE with the per-candidate lexical
    and quality features a ranker trains on — BM25 score and rank,
    summed query-term frequency, and the document's length and Flesch
    readability.

    This is the feature-extraction shape of a web-scale ranking
    pipeline: the corpus is tokenized once (BM25's own pass), the
    candidate set is k-bounded per query, and every feature join is
    against either that candidate set or a per-doc table — nothing
    re-scans the corpus per feature.

    Returns ``(query_id, doc_id, rank, bm25, tf_sum, n_chars,
    n_words, flesch)``.
    """
    from ccl_spark.textops import readability_scores

    bm = bm25_topk(docs, queries, k=k, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cand = bm.withColumn("rank", F.row_number().over(w))

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"), "term"
    ).distinct()
    tfs = (
        toks.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf_sum"))
    )
    rd = readability_scores(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "n_words", "flesch"
    )
    lens = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    return (
        cand.join(tfs, ["query_id", "doc_id"], "left")
        .join(lens, "doc_id")
        .join(rd, "doc_id", "left")
        .select(
            "query_id",
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("score").alias("bm25"),
            F.coalesce(F.col("tf_sum"), F.lit(0)).cast("long").alias("tf_sum"),
            "n_chars",
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("flesch"), F.lit(0.0)).alias("flesch"),
        )
    )
