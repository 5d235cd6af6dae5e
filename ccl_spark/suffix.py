"""Suffix-array construction by prefix doubling — the foundation of
EXACT substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", builds suffix arrays of
the token stream to find long verbatim repeats that shingle/MinHash
methods only approximate).

Algorithm (Manber-Myers prefix doubling): rank suffixes by their
first token, then repeatedly re-rank by the pair
``(rank[i], rank[i + k])`` with ``k`` doubling — after ⌈log₂ n⌉
rounds ranks are the suffix array.  Every round is ONE self-join on
the shifted position plus ONE dense rank over the pair key; ranks are
dense integers, so the whole construction is integer-exact and
engine-replayable (the SQL oracle runs the identical dense-rank
chain).

Scale shape: the self-join is a hash equi-join on ``pos + k``; the
dense rank is a global sort — expressed here as an unpartitioned
window (the known single-reducer bottleneck at extreme n).  The
production form of the SAME algorithm replaces it with
``repartitionByRange(key) + per-partition dense ranks + broadcast
prefix offsets`` (a two-job distributed ranking); the round structure
and join shape are unchanged, which is what matters at 100 TB —
O(log n) shuffles total, never a quadratic suffix comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def corpus_token_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate documents (ordered by id) into one token stream
    ``(pos, tok)`` with a unique per-document separator token
    ("!sepN" — "!" sorts below alphanumerics under the binary
    collation BOTH engines use) between documents, so no suffix
    comparison ever crosses a document boundary ambiguously."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("did"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("tp", "tok"),
    ).filter(F.col("tok") != "")
    seps = docs.select(
        F.col(id_col).cast("long").alias("did"),
        F.lit(2_000_000_000).alias("tp"),
        F.concat(F.lit("!sep"), F.col(id_col).cast("string")).alias("tok"),
    )
    w = Window.orderBy("did", "tp")
    return (
        toks.unionByName(seps)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("pos", "tok")
    )


def suffix_array(
    tokens: DataFrame,
    max_rounds: int = 12,
    pos_col: str = "pos",
    tok_col: str = "tok",
) -> DataFrame:
    """``(rank, pos)`` — the suffix array of the token stream: rank r
    is held by the position whose suffix is r-th in lexicographic
    token order.  Stops early once all ranks are distinct (identity
    rounds change nothing, so a fixed-round oracle agrees).
    """
    n_row = tokens.count()
    base = tokens.select(
        F.col(pos_col).cast("long").alias("pos"), F.col(tok_col).alias("tok")
    )
    ranks = base.select(
        "pos", F.dense_rank().over(Window.orderBy("tok")).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    k = 1
    for _ in range(max_rounds):
        distinct = ranks.agg(F.countDistinct("r").alias("d")).first()["d"]
        if distinct >= n_row:
            break
        nxt = ranks.select((F.col("pos") - k).alias("pos"), F.col("r").alias("r2"))
        paired = ranks.join(nxt, "pos", "left").select(
            "pos", "r", F.coalesce("r2", F.lit(0)).alias("r2")
        )
        ranks = paired.select(
            "pos",
            F.dense_rank().over(Window.orderBy("r", "r2")).cast("long").alias("r"),
        ).localCheckpoint(eager=True)
        k *= 2
    return ranks.select(F.col("r").alias("rank"), "pos")
