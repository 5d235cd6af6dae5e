"""Privacy-preserving release operators for event/corpus analytics.

Two standard gates a data-release pipeline runs before shipping
aggregates off a 100-TB store:

- ``k_anonymity``: audit a quasi-identifier combination — every
  released group must cover at least ``k`` distinct users, else the
  combination re-identifies (Sweeney 2002).  One distinct-user
  aggregate per combination; the violation list is what a release
  review blocks on.
- ``dp_counts``: per-group counts with Laplace(1/eps)-SHAPED noise in
  the mechanism of Dwork et al. 2006 — but the draw here is a pure
  function of (group, salt), so this is a deterministic DP
  **simulation** for oracle testing, NOT an epsilon-DP release: noise
  independent of the data and constant across releases carries no
  differential-privacy guarantee (anyone knowing the salt recovers
  the exact count, and two releases over changed data reveal the
  exact delta even with a secret salt — ADVICE r5).  The determinism
  is what lets the SQL oracle replay the table bit-for-bit.  A real
  deployment MUST draw fresh secret randomness per release (e.g. a
  caller-supplied per-release salt kept secret and never reused);
  reusing a salt across releases voids the epsilon guarantee
  entirely.

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
    """Per-group event counts with deterministic Laplace(1/eps)-shaped
    noise: ``u = md5(group, salt)`` uniform in (0,1), noise =
    ``-(1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|)`` (the inverse
    CDF).  Deterministic DP SIMULATION for reproducible testing — not
    a differential-privacy guarantee (see the module docstring; a real
    release needs fresh secret randomness per release).  Returns
    ``(group, n, noisy_n)`` with noisy_n rounded to 6dp and clamped
    at 0."""
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
