"""As-of join: each left row picks the latest right row with
``right.on <= left.on`` per key (backward, inclusive) — the temporal
join training-data and event pipelines use to attach "state as of this
event" (price as of trade, model version as of sample, crawl snapshot
as of page fetch).

Spark has no native ASOF join; the naive encoding (range-condition
join + per-pair max) explodes to |left| x |right| rows per key before
filtering. This implementation is the union trick: tag both sides,
union on aligned schemas, ONE shuffle on the key, then a per-key
ordered window where the right-side row is carried forward with
``last(ignorenulls)`` — linear scan per key, no pair materialization,
which is the plan that survives 100 TB. DuckDB HAS a native ASOF JOIN,
which the driver-gate oracle uses as an independent implementation.

All right columns travel as ONE struct, so the carried value is always
an atomic right ROW: a legitimate NULL inside the latest matching right
row stays NULL (the struct itself is non-null, so ``last(ignorenulls)``
still picks it), and multiple right value columns can never mix values
from different right rows (ADVICE r3 — per-column carry had both
defects). This matches DuckDB's ASOF semantics, which returns the
matched row's fields verbatim.

The right table must be unique per (by, on) — duplicate right
timestamps make "the latest row at that instant" ambiguous in any
engine (DuckDB picks one arbitrarily); pre-aggregate to enforce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "key",
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join. Output = every left row with one
    ``<col>{suffix}`` column per non-key right column, holding the
    value from the latest right row at or before the left row's ``on``
    (null when no such row exists)."""
    from pyspark.sql import types as T

    rcols = [c for c in right.columns if c not in (on, by)]
    lcols = [c for c in left.columns if c not in (on, by)]
    rstruct = T.StructType([T.StructField(c, right.schema[c].dataType) for c in rcols])
    lt = left.select(
        by,
        on,
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct).alias("_r"),
    )
    rt = right.select(
        by,
        on,
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    # right rows sort before left rows at equal `on` (tag 0 < 1), which
    # is exactly the inclusive <= semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        by,
        on,
        "_is_left",
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        by,
        on,
        *lcols,
        *[F.col("_r").getField(c).alias(f"{c}{suffix}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "key",
    lower: int | float = 0,
    upper: int | float = 0,
    suffix: str = "_r",
) -> DataFrame:
    """Banded range join: all (left, right) pairs with the same ``by``
    key and ``left.on + lower <= right.on <= left.on + upper`` (``on``
    must be numeric — epoch-cast timestamps first).

    Spark turns a raw inequality join into a per-key nested loop
    (|L| x |R| pairs per key — a hub key explodes). This is the
    standard bucketization: right rows land in one bucket of width
    (upper - lower), left rows probe their two covering buckets, the
    join is an EQUI-join on (by, bucket) — each candidate pair is
    within 2 buckets of the band, so the post-filter discards at most
    half the candidates instead of almost all of them. DuckDB executes
    the naive inequality join correctly at oracle scale, which is what
    the driver gate compares against."""
    width = float(upper) - float(lower)
    if width <= 0:
        raise ValueError("range_join: upper must exceed lower")
    rcols = [c for c in right.columns if c not in (on, by)]

    def bucket(col: Column) -> Column:
        return F.floor(col / F.lit(width)).cast("long")

    rt = right.select(
        F.col(by),
        bucket(F.col(on)).alias("_b"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    probes = F.array(
        bucket(F.col(on) + F.lit(float(lower))),
        bucket(F.col(on) + F.lit(float(upper))),
    )
    lt = left.withColumn("_b", F.explode(F.array_distinct(probes)))
    out = lt.join(rt, [by, "_b"]).filter(
        (F.col(f"{on}{suffix}") >= F.col(on) + F.lit(float(lower)))
        & (F.col(f"{on}{suffix}") <= F.col(on) + F.lit(float(upper)))
    )
    return out.drop("_b")
