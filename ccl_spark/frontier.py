"""Crawl-frontier politeness planning.

A crawler must bound concurrent fetches per host (politeness) while
fetching high-value pages first.  ``frontier_plan`` turns a scored URL
frontier into per-host fetch rounds: within each host, URLs are ranked
by (priority DESC, url) and assigned round ``rank // per_host_cap`` —
round r of the whole crawl then touches every host at most
``per_host_cap`` times, and the best-scored pages of every host land
in the earliest rounds.

Execution shape: one window keyed on the host — per-host state only,
no global sort, no driver involvement; a host's partition is its own
frontier slice, so the plan scales with the largest single host, not
the frontier size.  Deterministic (priority DESC, url ASC) ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def frontier_plan(
    urls: DataFrame,
    per_host_cap: int = 2,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str | None = None,
) -> DataFrame:
    """``(host, url, rank_in_host, fetch_round)`` politeness schedule.

    ``priority_col`` orders within a host (higher first; ties and the
    no-priority case fall back to url order).  ``fetch_round`` is
    0-based; round r contains at most ``per_host_cap`` URLs per host.
    """
    if per_host_cap < 1:
        raise ValueError("per_host_cap must be >= 1")
    order = (
        [F.desc(priority_col)] if priority_col else []
    ) + [F.asc(url_col)]
    w = Window.partitionBy(host_col).orderBy(*order)
    return urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.row_number().over(w).cast("long").alias("rank_in_host"),
    ).withColumn(
        "fetch_round",
        F.floor((F.col("rank_in_host") - 1) / per_host_cap).cast("long"),
    )
