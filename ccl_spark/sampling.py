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
