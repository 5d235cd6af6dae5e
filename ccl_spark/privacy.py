"""Privacy-preserving release operators for event/corpus analytics.

Two standard gates a data-release pipeline runs before shipping
aggregates off a 100-TB store:

- ``k_anonymity``: audit a quasi-identifier combination — every
  released group must cover at least ``k`` distinct users, else the
  combination re-identifies (Sweeney 2002).  One distinct-user
  aggregate per combination; the violation list is what a release
  review blocks on.
- ``dp_counts``: per-group counts with Laplace(1/eps) noise — the
  epsilon-DP release primitive (Dwork et al. 2006).  The noise draw
  here is DETERMINISTICALLY pseudo-random (inverse-CDF transform of
  an md5 uniform on the group key + salt), which keeps the operator
  reproducible across engines, partitionings and retries — the same
  release re-run produces the same table, and the SQL oracle replays
  it bit-for-bit.  (A production deployment would swap the salt per
  release; determinism per salt is the testability property, not a
  privacy weakening — the adversary never sees the salt.)

Both are single-aggregate plans: the shuffle is keyed on the
quasi-id/group columns, partial aggregation absorbs skew map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    user_col: str = "user_id",
) -> DataFrame:
    """Per-quasi-identifier-combination distinct-user counts with the
    k-anonymity violation flag.  Returns ``(*quasi_cols, n_users,
    n_rows, violates)`` — ``filter(violates == 1)`` is the block
    list."""
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.countDistinct(F.col(user_col)).cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("violates", (F.col("n_users") < k).cast("long"))
    )


def dp_counts(
    df: DataFrame,
    group_col: str,
    eps: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Per-group event counts with deterministic Laplace(1/eps) noise:
    ``u = md5(group, salt)`` uniform in (0,1), noise =
    ``-(1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|)`` (the inverse
    CDF).  Returns ``(group, n, noisy_n)`` with noisy_n rounded to
    6dp and clamped at 0."""
    u = (
        F.expr(
            "cast(conv(substring(md5(concat(cast(group as string), "
            f"',{salt}')), 1, 15), 16, 10) as bigint)"
        ).cast("double")
        / F.lit(float(16 ** 15))
    )
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / eps)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "group",
            "n",
            F.round(
                F.greatest(F.lit(0.0), F.col("n") + noise), 6
            ).alias("noisy_n"),
        )
    )
