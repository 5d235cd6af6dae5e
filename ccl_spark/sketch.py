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

from pyspark.sql import DataFrame, Window, functions as F


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


# ---------------------------------------------------------------- HLL

HLL_HASH_BITS = 52  # md5 prefix, 13 hex chars — same budget as cms/bloom


def _hll_rho_case(v: str, w: int) -> str:
    """SQL CASE computing rho(v) = position of the leftmost 1-bit of
    the w-bit value ``v`` (all-zeros -> w+1), by exact integer
    comparisons — no float log2, whose boundary rounding differs
    between engines."""
    branches = " ".join(
        f"WHEN {v} >= {1 << (w - i)} THEN {i}" for i in range(1, w + 1)
    )
    return f"CASE {branches} ELSE {w + 1} END"


def hll_build(
    values: DataFrame, value_col: str, b: int = 6, salt: str = "hll"
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007): ``(bucket long,
    rho long)`` — at most m = 2**b rows regardless of input size.  The
    low b hash bits pick the register, the remaining bits' leading-
    zero rank is max-aggregated — one groupBy over a projection, the
    100-TB distinct-count primitive.  md5 hashing makes the registers
    (not just the estimate) reproducible bit-for-bit across
    partitionings and engines; registers merge by per-bucket MAX
    (see :func:`hll_merge`), which is why the sketch distributes."""
    m = 1 << b
    w = HLL_HASH_BITS - b
    h = (
        f"cast(conv(substring(md5(concat(cast({value_col} as string),"
        f" ',{salt}')), 1, 13), 16, 10) as bigint)"
    )
    return (
        values.select(
            F.expr(f"pmod({h}, {m})").alias("bucket"),
            F.expr(_hll_rho_case(f"({h} div {m})", w)).cast("long").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register tables built with the same (b, salt):
    per-bucket MAX — the mergeability that makes HLL a one-pass
    distributed sketch (shard-fold == whole-corpus build, tested)."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 6) -> DataFrame:
    """``(estimate double, n_zero long)`` — the HLL cardinality
    estimate with the standard small-range (linear counting)
    correction.  Σ 2^-rho over ≤ m dyadic terms is exact in doubles,
    so the raw estimate is engine-identical; the linear-counting
    branch adds one ln, absorbed by 6dp rounding."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)).alias(
            "s_present"
        ),
    )
    return agg.select(
        F.round(
            F.when(
                (
                    F.lit(alpha * m * m)
                    / (F.col("s_present") + (F.lit(m) - F.col("n_present")))
                    <= F.lit(2.5 * m)
                )
                & (F.col("n_present") < F.lit(m)),
                F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_present"))),
            ).otherwise(
                F.lit(alpha * m * m)
                / (F.col("s_present") + (F.lit(m) - F.col("n_present")))
            ),
            6,
        ).alias("estimate"),
        (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
    )


def hll_build_grouped(
    values: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL registers: ``(group, bucket, rho)`` — at most
    m rows PER GROUP, the sketch-as-aggregation-primitive shape
    (distinct users per segment/host/day at 100 TB without a
    count-distinct shuffle of the raw keys).  Groups merge exactly
    like whole sketches: per-(group, bucket) MAX."""
    m = 1 << b
    w = HLL_HASH_BITS - b
    h = (
        f"cast(conv(substring(md5(concat(cast({value_col} as string),"
        f" ',{salt}')), 1, 13), 16, 10) as bigint)"
    )
    return (
        values.select(
            F.col(group_col).alias("group"),
            F.expr(f"pmod({h}, {m})").alias("bucket"),
            F.expr(_hll_rho_case(f"({h} div {m})", w)).cast("long").alias("rho"),
        )
        .groupBy("group", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_grouped(registers: DataFrame, b: int = 6) -> DataFrame:
    """``(group, estimate, n_zero)`` — the per-group estimates from
    :func:`hll_build_grouped` registers (same dyadic-exact raw branch
    and linear-counting correction as :func:`hll_estimate`)."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("s_present") + (F.lit(m) - F.col("n_present"))
    )
    return agg.select(
        "group",
        F.round(
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("n_present") < F.lit(m)),
                F.lit(float(m))
                * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_present"))),
            ).otherwise(raw),
            6,
        ).alias("estimate"),
        (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
    )


# --------------------------------------------------------------------------
# KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002; Beyer
# et al. 2007 "On Synopses for Distinct-Value Estimation")
# --------------------------------------------------------------------------

_KMV_SPACE = 16 ** 15  # md5 15-hex-digit prefix -> uniform in [0, 16^15)


def _kmv_hash(key_col: str) -> F.Column:
    """Uniform 60-bit hash of a key: md5 15-hex prefix as BIGINT —
    the same integer is reproducible in ANSI SQL (DuckDB:
    ('0x' || substring(md5(k), 1, 15))::BIGINT), so KMV estimates
    replay bit-for-bit across engines."""
    return F.expr(
        f"cast(conv(substring(md5({key_col}), 1, 15), 16, 10) as bigint)"
    )


def kmv_build_grouped(
    df: DataFrame,
    group_col: str = "group",
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct key hashes,
    as ``(group, hashes array<bigint> ascending)``.  Scale shape: one
    distinct on (group, hash) then one window top-k — Spark's
    WindowGroupLimit pushes the rank filter into the sort, so each
    group streams instead of materializing its full hash set; the
    sketch is at most k rows per group regardless of corpus size and
    merges by union + re-truncate (kmv_merge_all)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("kmv_build_grouped: k must be >= 2")
    hashed = (
        df.select(
            F.col(group_col).alias("group"), _kmv_hash(key_col).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("group").orderBy("h")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return topk.groupBy("group").agg(
        F.array_sort(F.collect_list("h")).alias("hashes")
    )


def kmv_merge_all(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Fold every group's sketch into ONE corpus-level sketch: the k
    smallest of the union of all retained hashes (exactly the sketch
    of the union of the underlying key sets — KMV's mergeability).
    Returns a single-row ``(hashes)`` frame."""
    return (
        sketches.select(F.explode("hashes").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.array_sort(F.collect_list("h")).alias("hashes"))
    )


def kmv_jaccard_pairs(sketches: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs Jaccard / union-cardinality estimates from per-group
    KMV sketches: for groups a < b the merged sketch X is the k
    smallest of hashes_a ∪ hashes_b; then

      n_merged    = |X|            (< k means the union was seen whole)
      n_shared    = |X ∩ A ∩ B|
      jaccard_est = n_shared / n_merged          (exact when |X| < k)
      union_est   = (|X|-1) * SPACE / max(X)     (|X| = k; else |X|)

    Integer parts are exact; the two estimates are IEEE doubles
    rounded to 6 decimals, so they replay identically in SQL.  Only
    sketches join — the corpus is never re-read."""
    a = sketches.select(
        F.col("group").alias("group_a"), F.col("hashes").alias("ha")
    )
    b = sketches.select(
        F.col("group").alias("group_b"), F.col("hashes").alias("hb")
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("ha", "hb"))), 1, k
    )
    pairs = (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .withColumn("merged", merged)
        .withColumn("n_merged", F.size("merged").cast("long"))
        .withColumn(
            "n_shared",
            F.size(
                F.array_intersect(
                    "merged", F.array_intersect("ha", "hb")
                )
            ).cast("long"),
        )
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_merged",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_merged"), 6).alias("jaccard_est"),
        F.round(
            F.when(
                F.col("n_merged") < k, F.col("n_merged").cast("double")
            ).otherwise(
                (F.col("n_merged") - 1)
                * F.lit(float(_KMV_SPACE))
                / F.element_at("merged", k)
            ),
            6,
        ).alias("union_est"),
    )


# --------------------------------------------------------------------------
# Dyadic (power-of-two-bucket) mergeable quantile sketch — a DDSketch
# (Masson et al. 2019) with gamma = 2 and integer bucket indexing, so
# every step is integer-exact and the sketch replays identically in
# any SQL engine.
# --------------------------------------------------------------------------


def ddsketch_build(
    values: DataFrame,
    group_col: str,
    value_col: str,
    quantize: int = 100,
) -> DataFrame:
    """Per-group dyadic quantile sketch: values are quantized to
    integers (``round(value * quantize)``), and each integer q > 0
    lands in bucket = its bit length (q in [2^(b-1), 2^b)); q <= 0
    lands in bucket 0.  The sketch is ``(group, bucket, cnt)`` — at
    most ~64 rows per group regardless of data size, and sketches
    merge EXACTLY by per-(group, bucket) count addition (the
    property histograms/DDSketch are built for: shard-parallel
    build + tree merge at 100 TB, no global sort).

    Quantile estimates carry the dyadic guarantee: the true quantile
    lies in the reported bucket, so the upper-bound estimate is at
    most 2x the true value (relative error bounded by gamma = 2).
    Bucket indexing is ``length(bin(q))`` — pure integer bit length,
    bit-identical in Spark and ANSI SQL, no float log2 boundary
    rounding (the HLL rho lesson).
    """
    q = F.round(F.col(value_col) * quantize).cast("long")
    return (
        values.select(F.col(group_col).alias("group"), q.alias("q"))
        .select(
            "group",
            F.when(F.col("q") <= 0, F.lit(0))
            .otherwise(F.expr("length(bin(q))"))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two dyadic sketches: per-(group, bucket) count sum —
    associative and commutative, so shard sketches fold in any order
    to exactly the sketch of the union."""
    return (
        a.unionByName(b)
        .groupBy("group", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    quantize: int = 100,
) -> DataFrame:
    """Quantile estimates from a dyadic sketch: for each p, the
    smallest bucket whose cumulative count reaches ``ceil(p * n)``,
    reported as the bucket's upper bound ``(2^bucket - 1)/quantize``
    — deterministic integer selection, one float division at the end.

    Returns ``(group, p, est, n)``.
    """
    tot = sketch.groupBy("group").agg(F.sum("cnt").alias("n"))
    w = Window.partitionBy("group").orderBy("bucket")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w))
    pdf = tot.select(
        "group",
        "n",
        F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p"),
    )
    picked = (
        cum.join(pdf, "group")
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("group", "p", "n")
        .agg(F.min("bucket").alias("b"))
    )
    return picked.select(
        "group",
        "p",
        F.expr(f"(shiftleft(1L, cast(b as int)) - 1) / cast({quantize} as double)").alias(
            "est"
        ),
        "n",
    )


def hll_overlap_pairs(registers: DataFrame, b: int = 6) -> DataFrame:
    """Pairwise set-overlap estimates between groups from their HLL
    registers by inclusion-exclusion: ``|A ∩ B| ≈ est(A) + est(B) -
    est(A ∪ B)``, where the union sketch is the per-bucket register
    MAX — the audience-overlap primitive (shared users between two
    hosts/segments) computed entirely from per-group sketches, never
    touching the raw key sets again.

    Returns ``(g1, g2, est_a, est_b, est_union, overlap)`` for every
    unordered group pair, all estimates rounded to 6dp.  Group count
    is assumed aggregation-sized (pairs are quadratic in groups, not
    in data).
    """
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    est = hll_estimate_grouped(registers, b).select("group", "estimate")
    groups = registers.select("group").distinct()
    pairs = (
        groups.select(F.col("group").alias("g1"))
        .crossJoin(groups.select(F.col("group").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    r1 = pairs.join(
        registers.select(F.col("group").alias("g1"), "bucket", "rho"), "g1"
    ).select("g1", "g2", "bucket", "rho")
    r2 = pairs.join(
        registers.select(F.col("group").alias("g2"), "bucket", "rho"), "g2"
    ).select("g1", "g2", "bucket", "rho")
    un = (
        r1.unionByName(r2)
        .groupBy("g1", "g2", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    agg = un.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("s_present") + (F.lit(m) - F.col("n_present"))
    )
    eu = agg.select(
        "g1",
        "g2",
        F.round(
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("n_present") < F.lit(m)),
                F.lit(float(m))
                * F.log(F.lit(float(m)) / (F.lit(m) - F.col("n_present"))),
            ).otherwise(raw),
            6,
        ).alias("est_union"),
    )
    return (
        eu.join(est.select(F.col("group").alias("g1"), F.col("estimate").alias("est_a")), "g1")
        .join(est.select(F.col("group").alias("g2"), F.col("estimate").alias("est_b")), "g2")
        .select(
            "g1",
            "g2",
            "est_a",
            "est_b",
            "est_union",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6).alias(
                "overlap"
            ),
        )
    )
