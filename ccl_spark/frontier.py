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


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse per-host robots.txt bodies into (host, path_prefix)
    disallow rules — the wildcard-agent subset (``User-agent: *``
    groups' ``Disallow:`` lines), which is what a bulk crawler
    actually honors at fleet scale.

    Pure JVM string ops: split lines, track the active agent group
    with a running flag derived per line (a group ends at the next
    User-agent line), keep non-empty Disallow paths.  One explode +
    filter over the (tiny) robots corpus — robots bodies are per-host,
    orders of magnitude smaller than the URL table they gate.

    Returns ``(host, path_prefix)`` distinct rules.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    ).select("host", "pos", F.trim(F.lower("line")).alias("line"))
    agents = lines.filter(F.col("line").startswith("user-agent:")).select(
        "host",
        F.col("pos").alias("apos"),
        (F.trim(F.regexp_replace("line", "^user-agent:", "")) == "*").alias("is_star"),
    )
    # each line belongs to the closest preceding user-agent line
    dis = lines.filter(F.col("line").startswith("disallow:")).select(
        "host", "pos",
        F.trim(F.regexp_replace("line", "^disallow:", "")).alias("path_prefix"),
    ).filter(F.col("path_prefix") != "")
    joined = (
        dis.join(agents, "host")
        .filter(F.col("apos") < F.col("pos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("host", "pos").orderBy(F.desc("apos"))
            ),
        )
        .filter((F.col("rn") == 1) & F.col("is_star"))
    )
    return joined.select("host", "path_prefix").distinct()


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Filter a URL table against robots disallow rules: a URL is
    dropped when any of its host's path prefixes prefix-matches its
    path.  One host-keyed equi-join (fan-out bounded by rules per
    host — small by construction) + one anti-join back; the URL table
    is never compared against other hosts' rules.

    Returns the allowed subset of ``urls`` (original columns).
    """
    from ccl_spark.edges import host_of

    parts = urls.select(
        F.col(url_col).alias("_u"),
        host_of(url_col).alias("_host"),
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$", 1)
        .alias("_path"),
    ).withColumn("_path", F.when(F.col("_path") == "", "/").otherwise(F.col("_path")))
    blocked = (
        parts.join(
            rules.select(F.col("host").alias("_host"), "path_prefix"), "_host"
        )
        .filter(F.col("_path").startswith(F.col("path_prefix")))
        .select("_u")
        .distinct()
    )
    return urls.join(blocked, urls[url_col] == blocked._u, "left_anti")
