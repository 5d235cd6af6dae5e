"""Deterministic corpus sampling, splitting and packing — the
training-mixture stages of an LLM data pipeline.

Everything here is *hash-deterministic*: membership depends only on
the document key and a salt (first 15 hex digits of md5, the same
dyadic construction as ccl_spark.walks), never on partitioning,
sample order or a seed stream — so a 100-TB run, a retried stage and
a laptop repro all select byte-identical subsets, and an ANSI-SQL
engine can replay the selection exactly.

- ``hash_sample``: per-stratum Bernoulli sampling at a fixed rate
  (e.g. downweight a dominant language) — one filter, no shuffle.
- ``hash_split``: train/valid/test assignment from consecutive hash
  intervals — one projection, no shuffle, stable under corpus growth
  (a document's split never changes when other documents arrive).
- ``pack_documents``: greedy token-budget bin packing within buckets
  (context-window shard assembly).  The running-total window is keyed
  on the bucket, so no global sort exists; a bucket is one partition's
  work and buckets are independent — the scale contract is
  "bounded bucket mass", same as every other windowed operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DENOM = float(1 << 52)


def _unit_hash(key: str, salt: str) -> F.Column:
    """Deterministic uniform draw in [0, 1): 13 hex md5 digits over
    2^52 — exactly representable, identical in Spark and DuckDB.
    ``key`` is a column name (or SQL expression)."""
    return (
        F.expr(
            f"cast(conv(substring(md5(concat(cast({key} as string),"
            f" ',', '{salt}')), 1, 13), 16, 10) as double)"
        )
        / F.lit(_DENOM)
    )


def hash_sample(
    docs: DataFrame,
    rate: float,
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff its unit hash < ``rate`` — deterministic
    Bernoulli sampling.  Apply per stratum by salting differently or
    filtering beforehand; composition is safe because different salts
    give independent draws."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return docs.filter(_unit_hash(id_col, salt) < rate)


def hash_split(
    docs: DataFrame,
    valid: float = 0.05,
    test: float = 0.05,
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a ``split`` column: 'test' for hash < test, 'valid' for the
    next ``valid`` interval, else 'train'.  Interval assignment means
    a document's split is a pure function of its id — stable across
    corpus versions, no leakage when the corpus grows."""
    if valid < 0 or test < 0 or valid + test >= 1.0:
        raise ValueError("need valid, test >= 0 and valid + test < 1")
    u = _unit_hash(id_col, salt)
    return docs.withColumn(
        "split",
        F.when(u < test, F.lit("test"))
        .when(u < test + valid, F.lit("valid"))
        .otherwise(F.lit("train")),
    )


def pack_documents(
    docs: DataFrame,
    budget: int,
    bucket_col: str,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to token-budget bins within each bucket:
    documents are taken in ascending ``id_col`` order and the running
    token total maps each to bin ``ceil(cum/budget) - 1`` (a document
    straddling a boundary closes the earlier bin — simple, streaming,
    deterministic; bins can overflow by at most one document, which is
    the standard greedy packing trade).

    Returns the input columns plus ``bin`` (0-based, per bucket).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return docs.withColumn(
        "bin", (F.ceil(cum / F.lit(budget)) - 1).cast("long")
    )


def bottomk_sample(
    docs: DataFrame,
    k: int,
    salt: str = "bottomk",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-size uniform sample without replacement: the ``k`` rows
    with the smallest unit hashes (ties broken by id).  Unlike
    rate-based Bernoulli sampling the output size is exact, and the
    selection is MERGEABLE — the bottom-k of a union equals the
    bottom-k of the per-shard bottom-ks, so shards/epochs/machines
    can pre-trim locally and a tiny merge finishes the job (this is
    the bottom-k sketch of Cohen & Kaplan).  Spark executes the
    orderBy+limit as TakeOrderedAndProject: per-partition partial
    top-k then one k-row merge at the driver — no global sort ever
    materializes.  Adds a ``draw`` column (the dyadic md5 unit hash,
    exactly replayable in ANSI SQL)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    u = _unit_hash(id_col, salt)
    return docs.withColumn("draw", u).orderBy("draw", id_col).limit(k)


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    k: int,
    salt: str = "stratified",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``k`` rows per stratum (fewer when the stratum is
    smaller): per-stratum bottom-k by unit hash — the deterministic
    construction of a balanced eval set / per-language cap.  One
    window keyed by the stratum (partition-bounded; no global sort),
    rank ties broken by id so the selection is a pure function of
    (stratum, id, salt)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    u = _unit_hash(id_col, salt)
    w = Window.partitionBy(strata_col).orderBy("draw", id_col)
    return (
        docs.withColumn("draw", u)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def priority_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    salt: str = "priority",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-proportional sampling without replacement by PRIORITY
    sampling (Duffield-Lund-Thorup 2007): priority = w / u with u a
    uniform draw, keep the k largest priorities, and report the
    Horvitz-Thompson estimate weight max(w, tau) where tau is the
    (k+1)-th priority — sums of est_weight over the sample are
    unbiased for population totals, which is what makes a k-row
    sample usable for corpus accounting at 100 TB.

    The draw is the dyadic md5 unit hash shifted to (0, 1] (adding 1
    before the 2^52 divide — u = 0 would divide by zero), so the
    selection and tau replay exactly in ANSI SQL.  Execution: one
    TakeOrderedAndProject of k+1 rows (per-partition partial top-k),
    then a window over those k+1 rows only.  Returns
    ``(id, weight, priority, est_weight)``, the k selected rows.
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    u = (
        F.expr(
            f"cast(conv(substring(md5(concat(cast({id_col} as string),"
            f" ',', '{salt}')), 1, 13), 16, 10) as double) + 1.0"
        )
        / F.lit(_DENOM)
    )
    prio = docs.select(
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        (F.col(weight_col).cast("double") / u).alias("priority"),
    )
    topk1 = prio.orderBy(F.desc("priority"), F.asc(id_col)).limit(k + 1)
    w = Window.orderBy(F.desc("priority"), F.asc(id_col))
    ranked = topk1.withColumn("rk", F.row_number().over(w))
    tau = ranked.filter(F.col("rk") == k + 1).select(
        F.col("priority").alias("tau")
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            "weight",
            "priority",
            F.greatest(F.col("weight"), F.col("tau")).alias("est_weight"),
        )
    )


def mix_corpus(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Training-mixture assembly: give each source a token budget and
    keep a deterministic uniform-ordered prefix of its documents until
    the budget is exhausted (the last document may overshoot — the
    standard greedy cut).  Order within a source is the dyadic md5
    draw, so the mixture is a pure function of (source, id, salt):
    re-runs, retries and engine swaps select identical documents.

    One window per source (cumulative token sum keyed by the source —
    the bounded-bucket contract of pack_documents; a mega-source
    needs the range-partitioned rank seam documented for suffix
    arrays).  Sources absent from ``budgets`` are dropped.  Returns
    ``(source, id, n_tokens, cum_tokens)`` for kept docs.
    """
    if not budgets:
        raise ValueError("budgets must name at least one source")
    bdf = docs.sparkSession.createDataFrame(
        [(s, int(b)) for s, b in sorted(budgets.items())],
        f"{source_col} string, _budget long",
    )
    u = _unit_hash(id_col, salt)
    toks = docs.select(
        F.col(source_col),
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        u.alias("_draw"),
    ).join(F.broadcast(bdf), source_col)
    w = (
        Window.partitionBy(source_col)
        .orderBy("_draw", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        toks.withColumn(
            "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .filter(F.col("cum_before") < F.col("_budget"))
        .select(
            source_col,
            id_col,
            "n_tokens",
            (F.col("cum_before") + F.col("n_tokens")).alias("cum_tokens"),
        )
    )


def greedy_max_coverage(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy maximum-coverage document selection: pick ``k`` documents
    that together cover the most distinct tokens — the classic
    (1 - 1/e)-approximate submodular pick (Nemhauser 1978), the
    diverse-subset primitive behind seed-set and eval-set selection.
    Returns one row per pick: ``(round int, doc_id long, gain long,
    covered_total long)`` where gain is the count of NEWLY covered
    tokens (so covered_total is their running sum, exact).

    Per round: one anti-join of the distinct (doc, token) table
    against the covered-token set and one count argmax with the
    deterministic (gain DESC, doc_id ASC) tie-break — k distributed
    passes, never a per-pair similarity matrix.  The covered set grows
    by one document's vocabulary per round and is re-checkpointed, so
    plan depth stays O(1).  Docs whose tokens are fully covered simply
    have no candidate rows left (gain 0) and can never win while any
    positive gain remains; picked docs are excluded explicitly.
    """
    if k <= 0:
        raise ValueError("greedy_max_coverage: k must be positive")
    dt = (
        docs.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = docs.sparkSession
    covered: DataFrame | None = None
    picked: list[int] = []
    rows: list[tuple[int, int, int, int]] = []
    total = 0
    for r in range(1, k + 1):
        cand = dt if covered is None else dt.join(covered, "term", "left_anti")
        if picked:
            cand = cand.filter(~F.col("doc").isin(*picked))
        best = (
            cand.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc"))
            .first()
        )
        if best is None:
            break
        doc_id, gain = int(best["doc"]), int(best["gain"])
        picked.append(doc_id)
        total += gain
        rows.append((r, doc_id, gain, total))
        new_terms = dt.filter(F.col("doc") == doc_id).select("term")
        covered = (
            new_terms
            if covered is None
            else covered.unionByName(new_terms).distinct()
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, "round int, doc_id long, gain long, covered_total long"
    )
