"""Event-stream product analytics: funnels and retention cohorts.

The events table (user_id, ts, event_type) supports the two classic
behavioral queries:

- ``funnel_conversion``: how many users complete an ordered step
  sequence, each step strictly after the previous one's earliest
  completion.  One filtered aggregate per step plus a user-keyed join
  — never a self-join of the full event table; state per step is one
  row per surviving user (monotonically shrinking).
- ``retention_cohorts``: users grouped by first-activity week, counted
  per later activity week.  Week indices are integer day arithmetic
  from a fixed epoch (no timezone/week-start conventions to disagree
  on), so both engines bin identically.

Both are single-pass over the event table per step/aggregate, keyed on
the user — the Zipf guard is per-user event counts, which product
streams bound naturally.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(step_idx, step, n_users)`` — users whose events contain the
    step sequence in strict timestamp order (earliest-completion
    semantics: each step matches the user's first occurrence after the
    previous step's match; earliest-first matching maximizes
    downstream conversion and is the standard funnel definition)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    state = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    stages = [state]
    for s in steps[1:]:
        nxt = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts2")
        )
        state = (
            stages[-1]
            .join(nxt, "u")
            .filter(F.col("ts2") > F.col("t"))
            .groupBy("u")
            .agg(F.min("ts2").alias("t"))
        )
        stages.append(state)
    counts = [
        st.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, st in enumerate(stages)
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)


def value_quantiles(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_col: str = "event_type",
    value_col: str = "value",
    approx: bool = False,
) -> DataFrame:
    """Per-group value percentiles ``(group, p50, p90, p99, n)``.

    ``approx=False`` uses exact sort-based ``percentile`` (linear
    interpolation at rank (n−1)·p — the ANSI ``percentile_cont``
    convention, so a SQL engine reproduces it bit-for-bit).  At 100-TB
    scale exact percentiles shuffle every value to its group; pass
    ``approx=True`` for ``approx_percentile`` (t-digest-style sketch,
    map-side mergeable, bounded memory) once the oracle-exactness
    requirement is dropped — same output shape."""
    fn = "approx_percentile" if approx else "percentile"
    cols = [
        F.round(
            F.expr(f"{fn}({value_col}, {p!r})"), 6
        ).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return events.groupBy(F.col(group_col).alias("grp")).agg(
        *cols, F.count(F.lit(1)).alias("n")
    )


def props_histogram(
    events: DataFrame,
    path: str = "$.k",
    bin_width: int = 10,
    props_col: str = "props",
) -> DataFrame:
    """``(bin, n_events, sum_k)`` — histogram of a numeric field
    extracted from the semi-structured JSON ``props`` column
    (``get_json_object``, JVM-side JSON path; no schema inference
    pass, so malformed rows become NULL and are dropped, never
    poison the aggregate)."""
    k = F.get_json_object(F.col(props_col), path).cast("long")
    return (
        events.select(k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(F.floor(F.col("k") / bin_width).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    epoch: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(cohort_week, week_offset, n_users)`` — distinct active users
    per (first-activity week, weeks-since-cohort).  Weeks are
    ``floor(days-since-epoch / 7)`` — pure integer binning."""
    wk = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.lit(epoch).cast("date")) / 7
    ).cast("long")
    act = events.select(F.col(user_col).alias("u"), wk.alias("wk"))
    first = act.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    return (
        act.join(first, "u")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("u").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    for each (current, next) event-type pair, the observed count and
    conditional probability P(next | current) over per-user event
    sequences ordered by ``(ts, event_id)`` (the id tiebreak makes
    the sequence — and therefore every count — deterministic under
    timestamp collisions).

    One user-keyed window (LEAD) + one (cur, next) aggregate — the
    window partitions by user, so no key outgrows a user's own
    history; the transition matrix itself is |types|^2-bounded.
    The classic clickstream/session model; feed the matrix to the
    weighted-PageRank stack for stationary behavior analysis.
    Returns ``(cur, nxt, n, p)`` with p rounded to 6dp.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("cur"),
            F.lead(type_col).over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("tot"))
    return pairs.join(tot, "cur").select(
        "cur", "nxt", "n", F.round(F.col("n") / F.col("tot"), 6).alias("p")
    )


def user_activity_features(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user behavioral features — the bot/abuse-detection signals
    of a clickstream pipeline: event count, active span, events per
    minute, distinct event types, and the Shannon entropy of the
    user's type distribution (bots are high-rate and low-entropy;
    crawl-loop artifacts are single-type).

    One per-user aggregate plus one (user, type) pre-aggregate for the
    entropy — both partial-aggregating, no windows.  Returns
    ``(user, n_events, span_s, events_per_min, n_types,
    type_entropy)`` with floats rounded to 6dp.
    """
    per_type = events.groupBy(
        F.col(user_col).alias("user"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).alias("c"))
    ent = (
        per_type.groupBy("user")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("c") * F.log("c")).alias("clogc"),
        )
        .select(
            "user",
            "n_types",
            # H = ln n - (1/n) sum c ln c  (exact rearrangement; keeps
            # the per-type float sum to one term per type)
            F.round(
                F.log("n") - F.col("clogc") / F.col("n"), 6
            ).alias("type_entropy"),
        )
    )
    base = events.groupBy(F.col(user_col).alias("user")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("span_s"),
    )
    return base.join(ent, "user").select(
        "user",
        "n_events",
        "span_s",
        F.round(
            F.col("n_events") * 60.0 / F.greatest(F.col("span_s"), F.lit(1)), 6
        ).alias("events_per_min"),
        "n_types",
        "type_entropy",
    )


def transition_stationary(
    events: DataFrame,
    n_iter: int = 4,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Approximate stationary distribution of the event-type Markov
    chain: ``n_iter`` power iterations pi <- pi P from the uniform
    vector over observed types, renormalized once at the end (types
    with no outgoing transitions leak mass; the renormalize keeps pi
    a distribution and is replayed identically by the oracle).  The
    long-run behavioral mix — where users spend their events.

    The chain's state space is |types|-bounded, so every iteration is
    a tiny broadcast join; the heavy lifting is the one LEAD window
    in :func:`event_transitions`.  Returns ``(event_type, pi)``
    rounded to 6dp, descending.
    """
    trans = event_transitions(
        events, user_col=user_col, type_col=type_col, ts_col=ts_col, id_col=id_col
    ).select("cur", "nxt", "p").localCheckpoint(eager=True)
    types = (
        trans.select(F.col("cur").alias("t"))
        .unionByName(trans.select(F.col("nxt").alias("t")))
        .distinct()
    )
    n_types = types.count()
    pi = types.select("t", (F.lit(1.0) / n_types).alias("pi"))
    for _ in range(n_iter):
        pi = (
            trans.join(pi.withColumnRenamed("t", "cur"), "cur")
            .groupBy(F.col("nxt").alias("t"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
    tot = pi.agg(F.sum("pi").alias("tot"))
    return (
        pi.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("event_type"),
            F.round(F.col("pi") / F.col("tot"), 6).alias("pi"),
        )
        .orderBy(F.desc("pi"), F.asc("event_type"))
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Assign every row an exact-quantile bucket of ``col`` (1 =
    lowest) — score normalization for mixing heterogeneous quality
    signals.  NO global NTILE window: the n_buckets-1 cut points come
    from one exact-percentile aggregate (array percentile, a single
    pass) and the bucket is a map-side comparison against the
    broadcast cuts, so the op costs one aggregate + one projection at
    any scale.  Rows tied exactly at a cut share the lower bucket
    (pure function of the value — deterministic, engine-independent).
    ``keys`` selects the output columns (default: all input columns).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.percentile(col, F.array(*[F.lit(f) for f in fracs])).alias("cuts")
    )
    out_cols = keys if keys is not None else df.columns
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col(col) > F.col("cuts")[i]).cast("int")
    return df.crossJoin(F.broadcast(cuts)).select(
        *out_cols, bucket.alias("bucket")
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    z_cut: float = 3.5,
) -> DataFrame:
    """Robust outlier flags by the modified z-score (Iglewicz-Hoaglin):
    z = 0.6745 (x - median) / MAD — median/MAD instead of mean/stddev
    so heavy-tailed web distributions don't mask their own outliers
    (the data-quality sweep behind 'which hosts/users are anomalous').

    Two exact-percentile aggregates (median, then median absolute
    deviation), broadcast back; the flag is a map-side comparison —
    no window, no sort.  A zero MAD (over half the values identical)
    flags exactly the values different from the median.  Returns
    ``keys + (value, z, outlier)`` with z rounded to 6dp.
    """
    med = df.agg(F.percentile(value_col, F.lit(0.5)).alias("med"))
    with_med = df.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)).alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        0.6745 * (F.col(value_col) - F.col("med")) / F.col("mad"),
    ).otherwise(
        F.when(F.col(value_col) == F.col("med"), F.lit(0.0)).otherwise(
            F.lit(float("inf")) * F.signum(F.col(value_col) - F.col("med"))
        )
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            *keys,
            F.col(value_col).alias("value"),
            F.round(z, 6).alias("z"),
            (F.abs(z) > z_cut).alias("outlier"),
        )
    )


def burst_windows(
    events: DataFrame,
    window_s: int = 3600,
    z_cut: int = 3,
) -> DataFrame:
    """Burst detection per event type: fixed windows whose count sits
    more than ``z_cut`` population standard deviations above that
    type's own mean rate (the 'did this error type spike this hour'
    sweep over a crawl/event log).

    The flag is INTEGER-EXACT — no floats decide membership.  With W
    total windows in the observed span, S = total events of the type
    and S2 = sum of squared per-window counts, the z>z_cut test
    ``(c - S/W) / sigma > z`` cross-multiplies to

        (c*W - S)^2 > z^2 * (W*S2 - S^2)   and   c*W > S

    (sigma^2 = (W*S2 - S^2)/W^2), all in int64.  Zero-count windows
    contribute nothing to S2 and can never be bursts, so the window
    grid is never materialized: one (type, window) count, one per-type
    rollup, a broadcast scalar for W.  Two shuffles on bounded keys —
    scale-safe at any event volume.  The reported ``z`` is the one
    float, derived AFTER the exact flag, rounded to 6dp.
    """
    if window_s <= 0 or z_cut <= 0:
        raise ValueError("window_s and z_cut must be positive")
    unix = F.unix_timestamp("ts")
    span = events.agg(
        F.min(unix).alias("t0"),
        (F.floor((F.max(unix) - F.min(unix)) / window_s) + 1).alias("n_win"),
    )
    per_win = (
        events.crossJoin(F.broadcast(span))
        .groupBy(
            "event_type",
            F.floor((unix - F.col("t0")) / window_s).cast("long").alias("win"),
            "n_win",
        )
        .agg(F.count("*").alias("n"))
    )
    per_type = per_win.groupBy("event_type").agg(
        F.sum("n").alias("s"), F.sum(F.col("n") * F.col("n")).alias("s2")
    )
    j = per_win.join(F.broadcast(per_type), "event_type")
    dev = F.col("n") * F.col("n_win") - F.col("s")
    var_num = F.col("n_win") * F.col("s2") - F.col("s") * F.col("s")
    return (
        j.where((dev > 0) & (dev * dev > z_cut * z_cut * var_num) & (var_num > 0))
        .select(
            "event_type",
            F.col("win").alias("win"),
            F.col("n").cast("long").alias("n"),
            F.round(
                dev.cast("double") / F.sqrt(var_num.cast("double")), 6
            ).alias("z"),
        )
    )


def association_rules(
    events: DataFrame,
    min_pair_users: int = 1,
) -> DataFrame:
    """Pairwise association rules over per-user event-type baskets:
    for every ordered type pair (a -> b) co-occurring in at least
    ``min_pair_users`` baskets, support / confidence / lift — the
    market-basket sweep behind 'users who hit X also hit Y'.

    Baskets are DISTINCT (user, type) — one shuffle; pair counts come
    from a user-keyed self-join of the basket table, which is bounded
    by (basket size)^2 per user, and basket size is bounded by the
    item domain (event types), not by the user's event volume.  For
    large item domains, pre-prune items below min support before the
    self-join (the classic Apriori first pass) — noted, not needed for
    bounded type domains.  All three metrics are ratios of exact
    int64 counts, rounded to 6dp after identical double operation
    order on both engines.
    """
    baskets = events.select("user_id", "event_type").distinct()
    n_users = baskets.agg(
        F.countDistinct("user_id").alias("n_users")
    )
    item = baskets.groupBy("event_type").agg(F.count("*").alias("n_item"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("x"), F.col("b.event_type").alias("y")
        )
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_users)
    )
    # both rule directions from the one unordered pair count
    both = pairs.unionByName(
        pairs.select(
            F.col("y").alias("x"), F.col("x").alias("y"), "n_pair"
        )
    )
    ix = item.select(F.col("event_type").alias("x"), F.col("n_item").alias("n_x"))
    iy = item.select(F.col("event_type").alias("y"), F.col("n_item").alias("n_y"))
    return (
        both.join(F.broadcast(ix), "x")
        .join(F.broadcast(iy), "y")
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(F.col("n_pair").cast("double") / F.col("n_users"), 6).alias(
                "support"
            ),
            F.round(F.col("n_pair").cast("double") / F.col("n_x"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_users")
                / F.col("n_x")
                / F.col("n_y"),
                6,
            ).alias("lift"),
        )
    )


def interevent_burstiness(
    events: DataFrame,
    min_gaps: int = 2,
) -> DataFrame:
    """Per-user burstiness of inter-event gaps (Goh & Barabasi 2008):
    B = (sigma - mu) / (sigma + mu) over the integer-second gaps
    between consecutive events — B near 1 is bursty (machine-gun then
    silence, the bot/crawler signature), near -1 is metronomic, 0 is
    Poisson.

    With S = sum of gaps, S2 = sum of squares, n gaps, population
    sigma = sqrt(n*S2 - S^2)/n and mu = S/n — the n cancels:
    B = (sqrt(D) - S) / (sqrt(D) + S) with D = n*S2 - S^2 held in
    int64, so the single sqrt is the only float and both engines see
    identical arguments.  Gaps come from unix_timestamp (which FLOORS
    fractional seconds) LEADed over (ts, event_id); floor preserves
    the sort order so gaps are never negative.  One window pass + one
    groupBy — two shuffles on user_id.
    """
    if min_gaps < 2:
        raise ValueError("interevent_burstiness: min_gaps must be >= 2")
    from pyspark.sql import Window

    u = F.unix_timestamp("ts")
    nxt = F.lead(u).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    gaps = (
        events.select("user_id", (nxt - u).alias("g"))
        .where(F.col("g").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("s2"),
    )
    rt = F.sqrt((F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double"))
    return agg.where(F.col("n") >= min_gaps).select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_gap_s"),
        F.when(rt + F.col("s") == 0, F.lit(0.0))
        .otherwise(F.round((rt - F.col("s")) / (rt + F.col("s")), 6))
        .alias("burstiness"),
    )


def cusum_changepoint(
    events: DataFrame,
    t_col: str = "ts",
    bucket_seconds: int = 21600,
) -> DataFrame:
    """Single level-shift localization by CUSUM over event-rate
    buckets (Page 1954): bucket the stream into fixed windows from the
    first event (EMPTY buckets included — a rate collapse is a shift
    too), then find the bucket k maximizing |Σ_{i<=k}(c_i − S/n)|,
    the classic cumulative drift from the global mean rate.  Scaling
    by n keeps everything integer: cusum_k = n·(Σ_{i<=k} c_i) −
    (k+1)·S, so the argmax (ties → smallest bucket) is exact and
    engine-independent; the last bucket's cusum is 0 by construction.

    Where burst_windows flags locally-hot windows, this finds the one
    point where the BEFORE/AFTER mean rates differ most — the monitor
    primitive for "when did the crawler slow down / the feed switch".

    Scale shape: one bucket aggregation, a sequence-explode for the
    empty buckets (bounded by the time range, not the event count),
    one ordered cumulative window over n buckets (n is small — this
    is a summary, shard by stream key for per-key monitoring), and an
    ordered limit 1.

    Returns ONE row ``(cp_bucket, cusum, n_buckets, total,
    rate_before, rate_after)`` — rates are exact-integer divisions
    rounded to 6dp; ``rate_after`` covers (cp_bucket, n).  The last
    bucket is excluded from the argmax (its cusum is identically 0
    and its after-range is empty), so a single-bucket stream returns
    an empty frame.
    """
    t = F.unix_timestamp(F.col(t_col))
    base = events.select(t.alias("t"))
    lo = base.agg(
        F.min("t").alias("tmin"), F.max("t").alias("tmax")
    )
    bucketed = (
        base.crossJoin(F.broadcast(lo))
        .select(
            F.expr(f"(t - tmin) div {bucket_seconds}").alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = lo.select(
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.expr(f"(tmax - tmin) div {bucket_seconds}"),
            )
        ).alias("b")
    )
    counts = spine.join(bucketed, "b", "left").select(
        "b", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "b",
            "s",
            "n",
            F.sum("c").over(w).cast("long").alias("cumc"),
        )
        .select(
            "b",
            "s",
            "n",
            "cumc",
            (F.col("n") * F.col("cumc") - (F.col("b") + 1) * F.col("s")).alias(
                "cusum"
            ),
        )
    )
    return (
        cum.filter(F.col("b") < F.col("n") - 1)
        .orderBy(F.abs("cusum").desc(), "b")
        .limit(1)
        .select(
            F.col("b").alias("cp_bucket"),
            "cusum",
            F.col("n").alias("n_buckets"),
            F.col("s").alias("total"),
            F.round(F.col("cumc") / (F.col("b") + 1), 6).alias("rate_before"),
            F.round(
                (F.col("s") - F.col("cumc")) / (F.col("n") - F.col("b") - 1), 6
            ).alias("rate_after"),
        )
    )


def bradley_terry(
    comparisons: DataFrame,
    iters: int = 8,
    winner: str = "winner",
    loser: str = "loser",
) -> DataFrame:
    """Bradley-Terry preference ratings from pairwise comparisons via
    the MM algorithm (Hunter 2004) — the standard aggregation for
    preference data (RLHF reward prep, search-result interleaving,
    A/B duels): rating w_i such that P(i beats j) = w_i/(w_i+w_j).

    Each MM step sets ``w_i' = W_i / sum_j n_ij/(w_i+w_j)`` (W_i =
    wins of i, n_ij = comparisons between i and j), then rescales so
    ratings sum to the item count.  A one-win/one-loss virtual duel
    against a fixed rating-1 ghost regularizes items with zero wins
    or zero losses (W_i += 1, denominator += 2/(w_i+1)), keeping every
    rating finite and positive — the standard add-one smoothing.

    Execution shape (100-TB story): the raw comparison log is reduced
    ONCE to the (i, j, n) duel-count table and the per-item win table
    (two shuffles over the log); every MM iteration then runs on the
    duel table — two equi-joins against the current rating table and
    one aggregate, all JVM-side, state = one row per item.  Iteration
    count is fixed (MM converges geometrically), so both engines run
    the identical float expression tree and agree to well under the
    6dp the output is rounded to.

    Returns ``(item, rating)``, rating rounded to 6dp.
    """
    comps = comparisons.select(
        F.col(winner).cast("string").alias("win"),
        F.col(loser).cast("string").alias("lose"),
    ).filter(F.col("win") != F.col("lose"))
    pairs = (
        comps.groupBy(
            F.least("win", "lose").alias("i"), F.greatest("win", "lose").alias("j")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    opp = pairs.select("i", "j", "n").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "n")
    )
    wins = comps.groupBy(F.col("win").alias("item")).agg(
        F.count(F.lit(1)).cast("double").alias("wins")
    )
    items = (
        comps.select(F.col("win").alias("item"))
        .unionByName(comps.select(F.col("lose").alias("item")))
        .distinct()
    )
    n_items = items.count()
    # the MM loop's state is one row per item — tiny relative to the
    # comparison log the two reduces above already collapsed — so the
    # iteration joins run broadcast with the duel table reduced to a
    # handful of partitions (no 32-way exchanges for a ratings table)
    opp = opp.coalesce(4).localCheckpoint(eager=True)
    wins = wins.coalesce(1).localCheckpoint(eager=True)
    w = items.coalesce(1).select("item", F.lit(1.0).alias("w"))
    for _ in range(iters):
        den = (
            opp.join(
                F.broadcast(w.select(F.col("item").alias("i"), F.col("w").alias("wi"))),
                "i",
            )
            .join(
                F.broadcast(w.select(F.col("item").alias("j"), F.col("w").alias("wj"))),
                "j",
            )
            .groupBy(F.col("i").alias("item"))
            .agg(F.sum(F.col("n") / (F.col("wi") + F.col("wj"))).alias("den"))
        )
        raw = (
            w.join(F.broadcast(wins), "item", "left")
            .join(F.broadcast(den), "item", "left")
            .select(
                "item",
                (
                    (F.coalesce(F.col("wins"), F.lit(0.0)) + F.lit(1.0))
                    / (
                        F.coalesce(F.col("den"), F.lit(0.0))
                        + F.lit(2.0) / (F.col("w") + F.lit(1.0))
                    )
                ).alias("raw"),
            )
        )
        # raw feeds both the rescale total and the next rating table —
        # materialize it, or the doubly-referenced lineage doubles the
        # plan every iteration (2^iters blowup)
        raw = raw.localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("tot"))
        w = raw.crossJoin(F.broadcast(total)).select(
            "item", (F.col("raw") * F.lit(float(n_items)) / F.col("tot")).alias("w")
        )
    return w.select("item", F.round("w", 6).alias("rating"))


def seasonal_naive_eval(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    season_hours: int = 24,
) -> DataFrame:
    """Forecast-quality baseline over event-rate series: hourly counts
    per group, seasonal-naive prediction (count one season earlier),
    and exact error metrics — the sanity floor every real forecaster
    must beat, and the standard drift probe for event pipelines.

    Missing hours COUNT AS ZERO: the per-group hour spine is generated
    from min..max (a calendar join, not a data join), so quiet hours
    aren't silently dropped from the evaluation.  Errors are integer
    count differences; the only float ops are the three final
    divisions (and one sqrt), so both engines agree to 6dp.

    Execution shape (100-TB story): one shuffle reduces events to
    (group, hour) counts — everything after runs on the series table
    (hours x groups), orders of magnitude smaller; the spine explodes
    from one row per group.

    Returns ``(group, n_eval, mae, rmse, bias)``.
    """
    c = (
        events.select(
            F.col(group_col).alias("g"),
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    span = c.groupBy("g").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        "g", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    filled = spine.join(c, ["g", "h"], "left").select(
        "g", "h", F.coalesce(F.col("n"), F.lit(0)).alias("actual")
    )
    lagged = filled.select(
        "g",
        (F.col("h") + F.expr(f"interval {season_hours} hours")).alias("h"),
        F.col("actual").alias("pred"),
    )
    j = filled.join(lagged, ["g", "h"])
    err = F.col("actual") - F.col("pred")
    return j.groupBy(F.col("g").alias("group")).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.round(F.sum(F.abs(err)) / F.count(F.lit(1)).cast("double"), 6).alias("mae"),
        F.round(
            F.sqrt(F.sum(err * err) / F.count(F.lit(1)).cast("double")), 6
        ).alias("rmse"),
        F.round(F.sum(err) / F.count(F.lit(1)).cast("double"), 6).alias("bias"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch conversion attribution — the classic
    marketing-analytics query over an event stream: for every
    conversion, find the qualifying touch events of the same user in
    the preceding ``window_days``, credit the earliest (first-touch)
    and latest (last-touch) one, and count credits per touch type.

    Deterministic under timestamp collisions via the (ts, event_id)
    tie-break.  One user-keyed equi-join bounded by the attribution
    window plus two per-conversion window ranks — per-user event
    density bounds the join fan-out, the conversion table is the
    small side.  Conversions with no qualifying touch are reported in
    the ``(touch_type = '(none)')`` row so credit totals always sum
    to the conversion count.

    Returns ``(touch_type, first_touch, last_touch)``.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("cts"),
        F.col(id_col).alias("cid"),
    )
    touches = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("tts"),
        F.col(id_col).alias("tid"),
    )
    j = conv.join(touches, "u", "left").filter(
        F.col("tts").isNull()
        | (
            (F.col("tts") <= F.col("cts"))
            & (F.col("tts") >= F.col("cts") - F.expr(f"interval {window_days} days"))
        )
    )
    # conversions whose join found no in-window touch keep one NULL row
    # only if the user had no touches at all; re-add the fully filtered
    # ones via anti-join for the '(none)' bucket
    matched = j.filter(F.col("tts").isNotNull())
    none_cnt = conv.join(
        matched.select("cid").distinct(), "cid", "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("cid")
    first = (
        matched.withColumn(
            "rn", F.row_number().over(w.orderBy(F.asc("tts"), F.asc("tid")))
        )
        .filter(F.col("rn") == 1)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("first_touch"))
    )
    last = (
        matched.withColumn(
            "rn", F.row_number().over(w.orderBy(F.desc("tts"), F.desc("tid")))
        )
        .filter(F.col("rn") == 1)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("last_touch"))
    )
    types = matched.sparkSession.createDataFrame(
        [(t,) for t in touch_types], "touch_type string"
    )
    credited = (
        types.join(first, "touch_type", "left")
        .join(last, "touch_type", "left")
        .select(
            "touch_type",
            F.coalesce("first_touch", F.lit(0)).cast("long").alias("first_touch"),
            F.coalesce("last_touch", F.lit(0)).cast("long").alias("last_touch"),
        )
    )
    none_row = none_cnt.select(
        F.lit("(none)").alias("touch_type"),
        F.col("n").cast("long").alias("first_touch"),
        F.col("n").cast("long").alias("last_touch"),
    )
    return credited.unionByName(none_row)


def top_session_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` session-opening paths: the first ``n`` event types of
    every gap-delimited session, concatenated in (ts, event_id) order
    — the clickstream path-mining query behind "how do sessions
    start".  Sessions are the same inclusive-gap islands as
    ``sessionize`` (break when the gap EXCEEDS ``gap_minutes``).

    Two user-keyed windows (break flag -> running session id, then
    in-session rank) and one path aggregate; sessions shorter than
    ``n`` events contribute their full (shorter) path.  Deterministic
    (count DESC, path) tie-break.  Returns ``(path, n_sessions)``.
    """
    wu = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # full-precision timestamp comparison (casting to long FLOORS
    # seconds in Spark while epoch() keeps fractions in SQL engines —
    # the interval form sidesteps the mismatch, like sessionize)
    brk = F.when(
        F.col(ts_col)
        > F.lag(F.col(ts_col)).over(wu) + F.expr(f"interval {gap_minutes} minutes"),
        1,
    ).otherwise(0)
    sess = events.withColumn("brk", brk).withColumn(
        "sid", F.sum("brk").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy(user_col, "sid").orderBy(ts_col, id_col)
    paths = (
        sess.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= n)
        .groupBy(user_col, "sid")
        .agg(
            F.concat_ws(
                ">", F.array_sort(
                    F.collect_list(F.struct("rn", F.col(type_col).alias("t")))
                ).getField("t")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def cohort_ltv(
    events: DataFrame,
    epoch: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cumulative lifetime value per acquisition cohort: users bucketed
    by first-activity week, their event values summed per
    weeks-since-cohort offset, and accumulated across offsets — the
    LTV curve next to :func:`retention_cohorts` (same integer week
    bins).  Values are quantized to exact cents before summing so the
    running totals are integer-exact in any engine.

    Returns ``(cohort_week, week_offset, n_users, week_value,
    cum_value)`` with the two value columns in float dollars rounded
    to 2dp.
    """
    wk = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.lit(epoch).cast("date")) / 7
    ).cast("long")
    cents = F.round(F.col(value_col) * 100).cast("long")
    act = events.select(
        F.col(user_col).alias("u"), wk.alias("wk"), cents.alias("cents")
    )
    first = act.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    per = (
        act.join(first, "u")
        .groupBy(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(
            F.countDistinct("u").cast("long").alias("n_users"),
            F.sum("cents").alias("wc"),
        )
    )
    wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
    return per.withColumn(
        "cum", F.sum("wc").over(wcum.rowsBetween(Window.unboundedPreceding, 0))
    ).select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(F.col("wc") / 100.0, 2).alias("week_value"),
        F.round(F.col("cum") / 100.0, 2).alias("cum_value"),
    )


def churn_labels(
    events: DataFrame,
    cutoff: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Churn-prediction training table — the canonical supervised
    label builder over an event stream: features from the OBSERVATION
    window (events strictly before ``cutoff``), label from the
    OUTCOME window (1 = the user never appears on/after cutoff).
    Building both from one table with a time split is what prevents
    label leakage; the feature aggregate never sees outcome-window
    rows.

    Features: event count, distinct types, days since last activity
    at the cutoff (integer day arithmetic — engine-exact), and active
    days.  Two filtered per-user aggregates + one left anti-ish join;
    users born in the outcome window are excluded (no observation
    features to train on).

    Returns ``(user_id, n_events, n_types, n_days, recency_days,
    churned)``.
    """
    cut = F.lit(cutoff).cast("timestamp")
    obs = events.filter(F.col(ts_col) < cut)
    out = events.filter(F.col(ts_col) >= cut)
    feats = obs.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.col(type_col)).cast("long").alias("n_types"),
        F.countDistinct(F.to_date(F.col(ts_col))).cast("long").alias("n_days"),
        F.datediff(
            F.lit(cutoff).cast("date"), F.max(F.to_date(F.col(ts_col)))
        )
        .cast("long")
        .alias("recency_days"),
    )
    active = out.select(F.col(user_col).alias("user_id")).distinct().withColumn(
        "ret", F.lit(1)
    )
    return feats.join(active, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_types",
        "n_days",
        "recency_days",
        F.when(F.col("ret").isNull(), 1).otherwise(0).cast("long").alias("churned"),
    )


def ab_test(
    events: DataFrame,
    metric_type: str = "purchase",
    n_arms: int = 2,
    salt: str = "ab",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Deterministic A/B analysis scaffold: users hash into arms
    (md5(user, salt) mod n_arms — the growth-stable assignment every
    experiment platform uses), and per arm the table reports the
    per-user mean metric with its Welch components — n, mean, and
    (exact-integer-derived) variance of per-user summed metric value.

    Values quantize to cents before summing, so per-arm sum and
    sum-of-squares are EXACT integers and both engines derive the
    identical variance; the only floats are the final divisions.
    The Welch t statistic between any two arms is then one line of
    driver-side arithmetic from this table — the table, not the
    scalar, is the operator (n_arms can be >2 for multi-armed tests).

    Returns ``(arm, n_users, mean_value, var_value)`` rounded to 6dp.
    """
    arm = F.expr(
        f"pmod(cast(conv(substring(md5(concat(cast(u as string), "
        f"',{salt}')), 1, 15), 16, 10) as bigint), {n_arms})"
    )
    per_user = (
        events.filter(F.col(type_col) == metric_type)
        .select(
            F.col(user_col).alias("u"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("u")
        .agg(F.sum("cents").alias("s"))
        .withColumn("arm", arm.cast("long"))
    )
    agg = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("s").alias("sum_c"),
        F.sum(F.col("s") * F.col("s")).alias("sumsq_c"),
    )
    mean = F.col("sum_c").cast("double") / F.col("n_users") / F.lit(100.0)
    # sample variance in dollars^2 from exact integer moments
    var = (
        (
            F.col("sumsq_c").cast("double")
            - F.col("sum_c").cast("double")
            * F.col("sum_c").cast("double")
            / F.col("n_users")
        )
        / (F.col("n_users") - F.lit(1))
        / F.lit(10000.0)
    )
    return agg.select(
        "arm",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(mean, 6).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
    )


def gini_coefficient(
    values: DataFrame,
    value_col: str = "v",
) -> DataFrame:
    """Exact Gini concentration coefficient of a non-negative value
    column — the standard inequality summary for traffic/link/revenue
    concentration ("do 1% of hosts take 90% of links?").

    Uses the rank-sum identity ``G = 2*S/(n*T) - (n+1)/n`` with
    ``S = sum_i rank_i * x_i`` (ascending ranks), computed WITHOUT a
    global per-row sort: rows reduce to (distinct value, count) first
    and each tie run contributes ``v * (cum_before*cnt +
    cnt*(cnt+1)/2)`` — the same distinct-value cumulative trick as
    the AUC operator, exact because permuting equal values among
    their ranks changes nothing.  Values quantize to cents so S and T
    are exact integers; the two divisions happen once.

    Returns one row ``(n, total, gini)``, gini rounded to 6dp.
    """
    per = (
        values.select(F.round(F.col(value_col) * 100).cast("long").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    s_term = F.col("c") * (
        F.col("cum_before") * F.col("cnt")
        + F.col("cnt") * (F.col("cnt") + 1) / F.lit(2)
    )
    agg = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("c") * F.col("cnt")).alias("t"),
        F.sum(s_term).alias("s"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("t") / F.lit(100.0), 2).alias("total"),
        F.round(
            F.lit(2.0) * F.col("s").cast("double")
            / (F.col("n").cast("double") * F.col("t").cast("double"))
            - (F.col("n") + F.lit(1)).cast("double") / F.col("n").cast("double"),
            6,
        ).alias("gini"),
    )
