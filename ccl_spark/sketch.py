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
