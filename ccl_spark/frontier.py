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

    Pure JVM string ops: split lines, attribute each Disallow to its
    RFC 9309 group — the contiguous run of User-agent lines preceding
    its nearest agent line (several ``User-agent:`` lines may stack on
    one group), keeping groups that contain ``*``.  Only the KEYWORD
    match is case-insensitive; the path value keeps its original case
    (robots paths are case-sensitive — lowercasing them silently
    under-blocks, ADVICE r5).  One explode + small joins over the
    (tiny) robots corpus — robots bodies are per-host, orders of
    magnitude smaller than the URL table they gate.

    Returns ``(host, path_prefix)`` distinct rules, host lowercased
    (hosts are case-insensitive; robots_filter joins on the
    lowercased URL host).
    """
    lines = robots.select(
        F.lower(F.col(host_col)).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    ).select(
        "host", "pos", F.trim("raw").alias("raw"),
        F.trim(F.lower("raw")).alias("lc"),
    )
    agents = lines.filter(F.col("lc").startswith("user-agent:")).select(
        "host",
        F.col("pos").alias("apos"),
        (F.trim(F.regexp_replace("lc", "^user-agent:", "")) == "*").alias("is_star"),
    )
    dis = lines.filter(F.col("lc").startswith("disallow:")).select(
        "host", "pos",
        F.trim(F.regexp_replace("raw", "(?i)^disallow:", "")).alias("path_prefix"),
    ).filter(F.col("path_prefix") != "")
    # nearest preceding agent line q of each Disallow
    dis_q = (
        dis.join(agents.select("host", "apos"), "host")
        .filter(F.col("apos") < F.col("pos"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("host", "pos").orderBy(F.desc("apos"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("host", "pos", "path_prefix", F.col("apos").alias("q"))
    )
    # an agent line's run extends back to the last Disallow before it:
    # agent a is in q's group iff last_dis(q) < a <= q
    last_dis = (
        agents.join(dis.select("host", F.col("pos").alias("dpos")), "host", "left")
        .groupBy("host", "apos", "is_star")
        .agg(
            F.max(
                F.when(F.col("dpos") < F.col("apos"), F.col("dpos")).otherwise(
                    F.lit(-1)
                )
            ).alias("pd")
        )
    )
    # keep Disallows whose group run contains a wildcard agent; run
    # membership: ga <= q and ga > pd(q)
    pd_of_q = last_dis.select(
        "host", F.col("apos").alias("q"), F.col("pd").alias("qpd")
    )
    star_groups = (
        dis_q.join(pd_of_q, ["host", "q"])
        .join(
            last_dis.select("host", F.col("apos").alias("ga"), "is_star"), "host"
        )
        .filter((F.col("ga") <= F.col("q")) & (F.col("ga") > F.col("qpd")))
        .groupBy("host", "pos", "path_prefix")
        .agg(F.max(F.col("is_star").cast("int")).alias("has_star"))
        .filter(F.col("has_star") == 1)
    )
    return star_groups.select("host", "path_prefix").distinct()


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
