"""Count-min sketch over token streams (Cormode & Muthukrishnan 2005).

The sublinear-memory frequency summary for heavy-hitter detection on
unbounded streams: ``depth`` hash rows × ``width`` counters.  Both the
build and the point query are deterministic md5 bucket assignments, so
the sketch (and every estimate) is reproducible bit-for-bit across
partitionings and engines — the sketch table is just a
``(row, bucket, cnt)`` DataFrame of at most depth·width rows.

Build: one token explode × ``depth`` hash rows, then a (row, bucket)
count — map-side partials absorb the token Zipf skew, and the result
is bounded by the sketch dimensions, not the corpus.  Query: the
classic min-over-rows upper-bound estimate, one equi-join against the
sketch per term.  Estimates never undercount; overcounts are bounded
by e·N/width with probability 1−(1/e)^depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(token_col: str, row_col: str, width: int) -> F.Column:
    return F.expr(
        f"pmod(cast(conv(substring(md5(concat({token_col}, ',',"
        f" cast({row_col} as string), ',cms')), 1, 13), 16, 10) as bigint),"
        f" {width})"
    )


def cms_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — at most depth·width
    rows regardless of corpus size."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    rows = toks.select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select("row", _bucket("token", "row", width).alias("bucket"))
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def bloom_build(
    keys: DataFrame,
    m: int = 4096,
    k: int = 3,
    key_col: str = "key",
) -> DataFrame:
    """Bloom filter as a DataFrame: the distinct set positions
    ``(pos)`` of ``k`` md5 hashes per key over ``m`` bits — at most m
    rows regardless of key count.  The deterministic relational
    encoding of the classic join-pruning filter: broadcast it and
    semi-join candidates before an expensive shuffle."""
    pos = keys.select(F.col(key_col).cast("string").alias("key")).select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    )
    return pos.select(_bloom_pos("key", "i", m).alias("pos")).distinct()


def _bloom_pos(key_col: str, i_col: str, m: int) -> F.Column:
    return F.expr(
        f"pmod(cast(conv(substring(md5(concat({key_col}, ',',"
        f" cast({i_col} as string), ',bloom')), 1, 13), 16, 10) as bigint), {m})"
    )


def bloom_might_contain(
    bloom: DataFrame,
    candidates: DataFrame,
    m: int = 4096,
    k: int = 3,
    key_col: str = "key",
) -> DataFrame:
    """``(key, might_contain)`` — true iff all k positions are set.
    No false negatives; false positives at the standard
    (1 − e^{−kn/m})^k rate."""
    probes = (
        candidates.select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .select(
            "key", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
        )
        .select("key", _bloom_pos("key", "i", m).alias("pos"))
        .distinct()  # two of a key's k hashes may collide — compare
        # hits against the key's own distinct position count
    )
    need = probes.groupBy("key").agg(F.count(F.lit(1)).alias("n_need"))
    hits = (
        probes.join(bloom, "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return need.join(hits, "key", "left").select(
        "key",
        (F.coalesce("n_hit", F.lit(0)) == F.col("n_need")).alias("might_contain"),
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters
    add cell-wise.  Mergeability is THE distributed property — shard
    sketches build independently (per partition, per day, per stream
    microbatch) and fold without touching raw data; the merged sketch
    is identical to one built over the union."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    depth: int = 4,
    width: int = 256,
    term_col: str = "token",
) -> DataFrame:
    """Point-query every term: ``(token, est)`` with
    est = min over rows of the term's counter."""
    probes = terms.select(F.col(term_col).alias("token")).distinct().select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select("token", "row", _bucket("token", "row", width).alias("bucket"))
    return (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )
