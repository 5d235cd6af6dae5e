"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, one pass, JVM higher-order
  functions (zip_with + aggregate) — no Python.
- random-hyperplane LSH buckets: the scale path. Signatures are
  computed in a vectorized Arrow batch (one numpy matmul per batch),
  bucketed by signature prefix; queries probe only their bucket
  (multi-probe = flip one bit). At 10^12 rows the bucket table is the
  thing you range-partition and push predicates into.
- embedding near-dup: same LSH buckets, verify same-bucket pairs with
  exact cosine above a threshold.

Hyperplanes are seeded (splitmix64 -> gaussian via Box-Muller), so
signatures are deterministic at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .datagen import _splitmix64  # deterministic seed expansion


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: str | F.Column) -> F.Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") ** 2))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.linalg.norm(query))
    cos = _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))
    return (
        emb.select(F.col(id_col).cast("long").alias(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    h = _splitmix64(
        np.arange(2 * dim * n_planes, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    )
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = u.reshape(2, n_planes, dim)
    g = np.sqrt(-2 * np.log(u[0] + 1e-300)) * np.cos(2 * np.pi * u[1])
    return g


def lsh_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign pattern of n_planes seeded hyperplanes,
    computed as one numpy matmul per Arrow batch."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                planes = _planes(mat.shape[1], n_planes, seed)
            signs = (mat @ planes.T) > 0
            bucket = (signs * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "bucket": bucket})

    return emb.select(id_col, vec_col).mapInPandas(batch, schema="id long, bucket long")


def lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (plus all 1-bit
    flips when multiprobe) with exact cosine inside."""
    dim = len(query)
    planes = _planes(dim, n_planes, seed)
    signs = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qb = int((signs * (1 << np.arange(n_planes, dtype=np.int64))).sum())
    buckets = {qb}
    if multiprobe:
        buckets |= {qb ^ (1 << b) for b in range(n_planes)}
    sigs = lsh_signatures(emb, n_planes, seed, id_col, vec_col)
    cand_ids = sigs.filter(F.col("bucket").isin(*buckets)).select(
        F.col("id").alias(id_col)
    )
    cand = emb.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query, k, id_col, vec_col)


def _seed_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    c = _planes(dim, n_lists, seed)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF coarse quantizer: (id, list_id) by argmax dot against the
    centroids (one numpy matmul per Arrow batch) — seeded random unit
    vectors by default, or TRAINED centroids from ivf_train. At scale
    the assignment table is the partition key — a query touches only
    its probed lists' partitions."""
    fixed = centroids

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = fixed
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if cents is None:
                cents = _seed_centroids(mat.shape[1], n_lists, seed)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "list_id": np.argmax(mat @ cents.T, axis=1).astype("int64"),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(batch, schema="id long, list_id long")


def ivf_train(
    emb: DataFrame,
    n_lists: int = 16,
    n_iters: int = 3,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the IVF coarse quantizer: ``n_iters`` spherical Lloyd
    (k-means) iterations as DataFrame ops, seeded-deterministic AND
    parallelism-independent. Returns the (n_lists, dim) unit centroids.

    Each iteration is ONE Arrow pass that fuses assignment with a
    map-side partial update: per batch, argmax-assign against the
    current centroids, then accumulate per-list sums of the
    INTEGER-QUANTIZED vectors (round(x*1000) int64) plus counts —
    so the shuffle carries n_lists x dim partial rows per batch, never
    the vectors, and the reduced sums are exact integers (float sums
    would depend on partition order and break the pinned-oracle
    determinism contract). New centroid = mean of members, normalized,
    rounded to 9 decimals; empty lists keep their previous centroid.
    The n_lists x dim reduced table collected per iteration is
    centroid-sized driver traffic, same scale as a convergence scalar."""
    cents = None

    for _ in range(n_iters):
        cur = cents  # bind for closure

        def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = cur
            for pdf in pdf_iter:
                if pdf.empty:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                if c is None:
                    c = _seed_centroids(mat.shape[1], n_lists, seed)
                a = np.argmax(mat @ c.T, axis=1)
                q = np.round(mat * 1000).astype(np.int64)
                sums = np.zeros((n_lists, mat.shape[1]), dtype=np.int64)
                np.add.at(sums, a, q)
                cnts = np.bincount(a, minlength=n_lists)
                nz = np.nonzero(cnts)[0]
                dim = mat.shape[1]
                yield pd.DataFrame(
                    {
                        "list_id": np.repeat(nz, dim),
                        "pos": np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                        "s": sums[nz].ravel(),
                        "c": np.repeat(cnts[nz].astype(np.int64), dim),
                    }
                )

        parts = (
            emb.select(id_col, vec_col)
            .mapInPandas(batch, schema="list_id long, pos long, s long, c long")
            .groupBy("list_id", "pos")
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
            .collect()
        )
        if not parts:
            raise ValueError("ivf_train: empty embedding table")
        dim = 1 + max(r["pos"] for r in parts)
        if cents is None:
            cents = _seed_centroids(dim, n_lists, seed)
        new = cents.copy()
        counts = np.zeros(n_lists, dtype=np.int64)
        sums = np.zeros((n_lists, dim), dtype=np.int64)
        for r in parts:
            sums[r["list_id"], r["pos"]] = r["s"]
            counts[r["list_id"]] = r["c"]
        member = counts > 0
        means = sums[member] / (counts[member, None] * 1000.0)
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new[member] = np.round(means / norms, 9)
        cents = new
    return cents


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` centroids closest
    to the query, exact cosine inside the probed lists only.
    ``centroids`` switches from seeded random lists to TRAINED ones
    (ivf_train) — same probing, better-balanced lists/recall."""
    q = np.asarray(query, dtype=np.float64)
    cents = (
        centroids if centroids is not None else _seed_centroids(len(query), n_lists, seed)
    )
    probes = np.argsort(-(cents @ q))[:n_probe].tolist()
    assign = ivf_assign(emb, n_lists, seed, id_col, vec_col, centroids=cents)
    cand_ids = assign.filter(F.col("list_id").isin(*probes)).select(
        F.col("id").alias(id_col)
    )
    return cosine_topk(emb.join(cand_ids, id_col, "left_semi"), query, k, id_col, vec_col)


def pq_train(
    emb: DataFrame,
    n_sub: int = 4,
    n_centroids: int = 16,
    n_iters: int = 3,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PRODUCT-QUANTIZATION codebooks (Jégou et al., PQ for
    nearest neighbor search): split each vector into ``n_sub``
    subvectors and run L2 k-means per subspace. Returns
    ``(n_sub, n_centroids, sub_dim)`` codebooks.

    This is the ANN memory story at 100 TB: a 64-dim float vector is
    256 bytes raw but ``n_sub`` single-byte codes after encoding (16
    bytes here) — the code table fits in memory at row counts where
    raw vectors cannot. Training mirrors ivf_train's determinism
    contract: every iteration is ONE fused Arrow pass (assign all
    subspaces + accumulate integer-quantized per-centroid sums
    map-side), reduced exactly, so codebooks are identical at any
    parallelism; init is seeded (per-subspace splitmix64 gaussians)."""
    books = None  # (n_sub, n_centroids, sub_dim)

    for _ in range(n_iters):
        cur = books

        def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = cur
            for pdf in pdf_iter:
                if pdf.empty:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                dim = mat.shape[1]
                if dim % n_sub:
                    raise ValueError(
                        f"pq_train: dim {dim} is not divisible by n_sub {n_sub} "
                        "(trailing dimensions would be silently dropped)"
                    )
                sd = dim // n_sub
                if c is None:
                    c = np.stack(
                        [_planes(sd, n_centroids, seed * 1000 + s) for s in range(n_sub)]
                    )
                out_s, out_c, out_p, out_sum, out_cnt = [], [], [], [], []
                for s in range(n_sub):
                    sub = mat[:, s * sd : (s + 1) * sd]
                    d2 = ((sub[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
                    a = np.argmin(d2, axis=1)
                    q = np.round(sub * 1000).astype(np.int64)
                    sums = np.zeros((n_centroids, sd), dtype=np.int64)
                    np.add.at(sums, a, q)
                    cnts = np.bincount(a, minlength=n_centroids)
                    nz = np.nonzero(cnts)[0]
                    out_s.append(np.repeat(s, len(nz) * sd))
                    out_c.append(np.repeat(nz, sd))
                    out_p.append(np.tile(np.arange(sd, dtype=np.int64), len(nz)))
                    out_sum.append(sums[nz].ravel())
                    out_cnt.append(np.repeat(cnts[nz].astype(np.int64), sd))
                yield pd.DataFrame(
                    {
                        "s": np.concatenate(out_s),
                        "c": np.concatenate(out_c),
                        "pos": np.concatenate(out_p),
                        "ssum": np.concatenate(out_sum),
                        "cnt": np.concatenate(out_cnt),
                    }
                )

        parts = (
            emb.select(id_col, vec_col)
            .mapInPandas(batch, schema="s long, c long, pos long, ssum long, cnt long")
            .groupBy("s", "c", "pos")
            .agg(F.sum("ssum").alias("ssum"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        if not parts:
            raise ValueError("pq_train: empty embedding table")
        sd = 1 + max(r["pos"] for r in parts)
        if books is None:
            books = np.stack(
                [_planes(sd, n_centroids, seed * 1000 + s) for s in range(n_sub)]
            )
        new = books.copy()
        for s in range(n_sub):
            sums = np.zeros((n_centroids, sd), dtype=np.int64)
            counts = np.zeros(n_centroids, dtype=np.int64)
            for r in parts:
                if r["s"] == s:
                    sums[r["c"], r["pos"]] = r["ssum"]
                    counts[r["c"]] = r["cnt"]
            member = counts > 0
            new[s][member] = np.round(sums[member] / (counts[member, None] * 1000.0), 9)
        books = new
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — nearest centroid per subspace (one
    vectorized Arrow pass). The codes table is what a 100 TB deployment
    stores and scans; raw vectors are only needed for re-ranking."""
    n_sub, _, sd = codebooks.shape

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if mat.shape[1] != n_sub * sd:
                raise ValueError(
                    f"pq_encode: vector dim {mat.shape[1]} does not match the "
                    f"codebooks' {n_sub} x {sd} layout"
                )
            codes = np.empty((len(mat), n_sub), dtype=np.int32)
            for s in range(n_sub):
                sub = mat[:, s * sd : (s + 1) * sd]
                d2 = ((sub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(batch, schema="id long, codes array<int>")


def pq_topk(
    codes: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per-subspace lookup
    tables ``t_s[c] = <query_s, centroid_{s,c}>`` are baked into the
    plan as literals, so scoring is a pure JVM expression over the
    codes table — approximate dot(query, vec) = sum_s t_s[codes[s]].
    No Python, no raw vectors touched; returns (id, score)."""
    n_sub, _, sd = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    if len(q) != n_sub * sd:
        raise ValueError(
            f"pq_topk: query dim {len(q)} does not match the codebooks' "
            f"{n_sub} x {sd} layout"
        )
    score = None
    for s in range(n_sub):
        table = codebooks[s] @ q[s * sd : (s + 1) * sd]
        term = F.element_at(
            F.array(*[F.lit(round(float(x), 9)) for x in table]),
            F.col("codes").getItem(s) + 1,
        )
        score = term if score is None else score + term
    return (
        codes.select(F.col(id_col).cast("long").alias(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    rerank: int = 100,
    n_lists: int = 16,
    n_probe: int = 4,
    n_sub: int = 32,
    n_centroids: int = 16,
    seed: int = 7,
    pq_seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """Composed IVF-PQ index with exact re-ranking — the deployment
    shape ANN actually ships at 100 TB (Jégou et al.'s IVFADC):

    1. coarse probe: assign vectors to ``n_lists`` IVF lists, keep only
       the ``n_probe`` lists nearest the query (ivf_assign — at scale
       the list id is the partition key, so this is partition pruning);
    2. ADC shortlist: score ONLY the probed lists' PQ codes with
       JVM-literal lookup tables (pq_topk) and keep the top ``rerank``
       candidates — the scan touches n_sub bytes per vector, never the
       raw floats;
    3. exact re-rank: fetch the ``rerank`` raw vectors (a k-sized
       point lookup, the only place full vectors are read) and return
       the exact-cosine top ``k``.

    ``centroids``/``codebooks`` accept trained models (ivf_train /
    pq_train); defaults train nothing and use seeded random centroids
    for the coarse step only — pass both for the production shape. A
    real deployment precomputes the assignment and code tables once;
    recomputing them per query here keeps the function self-contained
    at test scale while the PLAN (probe -> ADC -> rerank) is the same.

    Output: ``(vec_id, cosine)`` — identical shape to ivf_topk, so
    recall is directly comparable (pinned >= ivf_topk's by
    tests/test_pipeline_ops.py::test_ivfpq_recall)."""
    q = np.asarray(query, dtype=np.float64)
    cents = (
        centroids if centroids is not None else _seed_centroids(len(query), n_lists, seed)
    )
    if codebooks is None:
        codebooks = pq_train(
            emb, n_sub=n_sub, n_centroids=n_centroids, seed=pq_seed,
            id_col=id_col, vec_col=vec_col,
        )
    probes = np.argsort(-(cents @ q))[:n_probe].tolist()
    assign = ivf_assign(emb, n_lists, seed, id_col, vec_col, centroids=cents)
    cand_ids = assign.filter(F.col("list_id").isin(*probes)).select(
        F.col("id").alias(id_col)
    )
    cand = emb.join(cand_ids, id_col, "left_semi")
    codes = pq_encode(cand, codebooks, id_col, vec_col)
    shortlist = pq_topk(codes, query, codebooks, k=rerank, id_col="id").select(
        F.col("id").alias(id_col)
    )
    return cosine_topk(
        emb.join(shortlist, id_col, "left_semi"), query, k, id_col, vec_col
    )


def embedding_near_duplicates_exact(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine-verify layer over ALL pairs: (id_a, id_b, cosine).

    Elements are quantized to round(x*1000) int64 before the dot/norm
    arithmetic so the result is bit-identical across engines (the same
    trick as the ann_topk oracle) — this is the oracle-checkable exact
    baseline; the scale path is embedding_near_duplicates (LSH-bucketed,
    never all-pairs)."""
    qarr = lambda c: F.expr(  # noqa: E731
        f"transform({c}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
    )
    a = emb.select(F.col(id_col).cast("long").alias("id_a"), qarr(vec_col).alias("va"))
    b = emb.select(F.col(id_col).cast("long").alias("id_b"), qarr(vec_col).alias("vb"))
    isum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    na = a.select("id_a", isum(F.zip_with("va", "va", lambda x, y: x * y)).alias("n2_a"))
    nb = b.select("id_b", isum(F.zip_with("vb", "vb", lambda x, y: x * y)).alias("n2_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = isum(F.zip_with("va", "vb", lambda x, y: x * y))
    cos = F.round(
        dot.cast("double") / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
        6,
    )
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold among
    same-LSH-bucket candidates. Buckets above ``max_bucket`` members
    are skipped (a degenerate bucket — e.g. all-zero embeddings —
    would otherwise emit |bucket|^2 candidate pairs)."""
    from .dedup import cap_buckets

    sigs = lsh_signatures(emb, n_planes, seed, id_col, vec_col)
    if max_bucket is not None:
        sigs, _ = cap_buckets(sigs, max_bucket, keys=["bucket"])
    a = sigs.select("bucket", F.col("id").alias("id_a"))
    b = sigs.select("bucket", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """k-nearest-neighbor graph by cosine: ``(src, dst, cosine)`` —
    each vector's top-``k`` neighbors, deterministic (cosine DESC,
    dst ASC) tie-break.

    Arithmetic is the integer-quantized dot/norm scheme of
    :func:`embedding_near_duplicates_exact` (round(x*1000) int64), so
    scores are bit-identical across engines and the 6dp-rounded top-k
    cut is stable.

    Scale shape: the default scores ALL ordered pairs — the exact
    baseline, quadratic by definition.  At corpus scale pass
    ``candidates`` (columns ``id_a, id_b``), e.g. LSH-bucket
    cohabitants (:func:`embedding_near_duplicates`) or IVF probe lists
    (:func:`ivf_assign`): scoring then touches only the candidate
    pairs — the standard candidate-generation + exact-verify ANN-graph
    construction, never all-pairs.
    """
    qarr = lambda c: F.expr(  # noqa: E731
        f"transform({c}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
    )
    a = emb.select(F.col(id_col).cast("long").alias("id_a"), qarr(vec_col).alias("va"))
    b = emb.select(F.col(id_col).cast("long").alias("id_b"), qarr(vec_col).alias("vb"))
    isum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    na = a.select("id_a", isum(F.zip_with("va", "va", lambda x, y: x * y)).alias("n2_a"))
    nb = b.select("id_b", isum(F.zip_with("vb", "vb", lambda x, y: x * y)).alias("n2_b"))
    if candidates is not None:
        pairs = (
            candidates.select(
                F.col("id_a").cast("long").alias("id_a"),
                F.col("id_b").cast("long").alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
            .join(a, "id_a")
            .join(b, "id_b")
        )
    else:
        pairs = a.join(b, F.col("id_a") != F.col("id_b"))
    dot = isum(F.zip_with("va", "vb", lambda x, y: x * y))
    cos = F.round(
        dot.cast("double")
        / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
        6,
    )
    scored = (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
        )
    )


def mutual_knn_components(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Shared-nearest-neighbor style clustering: connected components
    of the MUTUAL-kNN graph (an edge survives only if each endpoint is
    in the other's top-k) — the mutual filter is what kills hub
    vertices' spurious star edges, so components trace density.

    Returns ``(vertex, component)`` for vertices with at least one
    mutual neighbor; component ids are min-member ids (the CC
    convention).  Composition: :func:`knn_graph` → self-join reverse
    orientation → :func:`ccl_spark.cc.connected_components`.
    """
    from ccl_spark.cc import connected_components

    g = knn_graph(emb, k=k, id_col=id_col, vec_col=vec_col, candidates=candidates)
    fwd = g.select("src", "dst")
    mutual = fwd.join(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
    ).filter(F.col("src") < F.col("dst"))
    return connected_components(mutual)


def centroid_classify(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification by cosine: average
    each training label's vectors into a centroid, assign every test
    vector to the centroid with the highest cosine.

    Exactness scheme: components are quantized to round(x*1000) int64,
    so centroid sums, test norms, centroid norms, and all dots are
    EXACT integers (the centroid is represented un-normalized as
    (sum-vector, count) — cosine is scale-invariant, so dividing by
    the count is never needed and no float enters before the final
    division).  The argmax is therefore bit-stable across engines and
    parallelism; ties break to the smallest label.

    Shape at scale: centroids are label-count×dim rows (tiny —
    broadcast side of the scoring join); the test side explodes once
    and aggregates per (id, label) with map-side partials.  Returns
    ``(vec_id, pred_label, cosine)``.
    """
    qx = (
        "CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)"
    )
    tr = train.select(
        F.col(label_col).cast("long").alias("lab"),
        F.posexplode(
            F.expr(f"transform({vec_col}, x -> {qx})")
        ).alias("i", "x"),
    )
    cent = tr.groupBy("lab", "i").agg(F.sum("x").alias("sx"))
    cnorm = cent.groupBy("lab").agg(F.sum(F.col("sx") * F.col("sx")).alias("n2_c"))
    te = test.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.posexplode(
            F.expr(f"transform({vec_col}, x -> {qx})")
        ).alias("i", "x"),
    )
    tnorm = te.groupBy("vec_id").agg(F.sum(F.col("x") * F.col("x")).alias("n2_t"))
    dots = (
        te.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "lab")
        .agg(F.sum(F.col("x") * F.col("sx")).alias("dot"))
    )
    scored = dots.join(tnorm, "vec_id").join(F.broadcast(cnorm), "lab").select(
        "vec_id",
        "lab",
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("n2_t").cast("double") * F.col("n2_c").cast("double"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("lab"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("lab").alias("pred_label"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def khop_feature_sums(
    edges: DataFrame,
    features: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """SIGN-style k-hop neighborhood feature aggregation (Frasca et
    al. 2020): ``s_k = (A + I)^k · x`` per feature dimension — the
    graph-smoothed features GNN-free pipelines precompute and feed to
    a plain MLP.

    EXACT integer arithmetic throughout: input components are
    quantized once (round(x*1000) int64) and each hop is
    add-self-plus-neighbor-sums — no division, so the result after
    any fixed ``k`` is bit-identical across engines and partitionings
    (the normalization a consumer wants is a per-vertex rescale it
    can do at read time).

    One hop = one edge-keyed equi-join + one (vertex, dim) aggregate
    over the dim-exploded feature table; rows are |V|·dim regardless
    of k.  Returns ``(vertex, i, s)`` — dimension index is 1-based
    (posexplode + 1, matching SQL GENERATE_SUBSCRIPTS).
    """
    f0 = features.select(
        F.col(id_col).cast("long").alias("vertex"),
        F.posexplode(
            F.expr(
                f"transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
            )
        ).alias("i0", "s"),
    ).select("vertex", (F.col("i0") + 1).cast("long").alias("i"), "s")
    e = (
        edges.select(
            F.col(src).cast("long").alias("s_v"), F.col(dst).cast("long").alias("d_v")
        )
        .filter(F.col("s_v") != F.col("d_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = f0.localCheckpoint(eager=True)
    for _ in range(k):
        nbr = (
            state.join(e, state["vertex"] == e["s_v"])
            .groupBy(F.col("d_v").alias("vertex"), "i")
            .agg(F.sum("s").alias("ns"))
        )
        state = (
            state.join(nbr, ["vertex", "i"], "left")
            .select(
                "vertex",
                "i",
                (F.col("s") + F.coalesce(F.col("ns"), F.lit(0))).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def reciprocal_matches(
    emb_a: DataFrame,
    emb_b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal best-match alignment between two embedding corpora
    (the bilingual-lexicon-induction / entity-alignment criterion): a
    pair survives only if B is A's single nearest neighbor AND A is
    B's — mutual top-1 kills the hub-match noise one-directional
    nearest-neighbor linking suffers from.

    Scoring is the integer-quantized cosine (bit-stable across
    engines); ties break to the smaller candidate id on both sides.
    Returns ``(id_a, id_b, cosine)``.  The default scores the full
    bipartite product — the exact baseline; at corpus scale generate
    candidates first (LSH buckets / IVF lists) exactly as in
    :func:`knn_graph`.
    """
    qarr = lambda c: F.expr(  # noqa: E731
        f"transform({c}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
    )
    isum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    a = emb_a.select(F.col(id_col).cast("long").alias("id_a"), qarr(vec_col).alias("va"))
    b = emb_b.select(F.col(id_col).cast("long").alias("id_b"), qarr(vec_col).alias("vb"))
    na = a.select("id_a", isum(F.zip_with("va", "va", lambda x, y: x * y)).alias("n2_a"))
    nb = b.select("id_b", isum(F.zip_with("vb", "vb", lambda x, y: x * y)).alias("n2_b"))
    dot = isum(F.zip_with("va", "vb", lambda x, y: x * y))
    scored = (
        a.crossJoin(b)
        .select("id_a", "id_b", dot.alias("dot"))
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double")),
                6,
            ).alias("cosine"),
        )
        .localCheckpoint(eager=True)
    )
    wa = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    wb = Window.partitionBy("id_b").orderBy(F.desc("cosine"), F.asc("id_a"))
    best_a = scored.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") == 1
    ).select("id_a", "id_b", "cosine")
    best_b = scored.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") == 1
    ).select(F.col("id_a").alias("ba"), F.col("id_b").alias("bb"))
    return best_a.join(
        best_b,
        (F.col("id_a") == F.col("ba")) & (F.col("id_b") == F.col("bb")),
    ).select("id_a", "id_b", "cosine")


def pca_power_top(
    emb: DataFrame,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal direction of an embedding corpus by one-pass Gram
    accumulation + fixed-iteration power method — the distributed-PCA
    shape: the corpus is touched ONCE to build the dim×dim Gram matrix
    ``G = Σ x xᵀ`` (exact int64 from quantized components — dim² rows,
    tiny), and the power iterations are dim-sized matvec joins that
    never see the corpus again.  No centering (direction of maximal
    raw second moment); callers wanting covariance subtract the mean
    first.

    Each iteration normalizes by the vector's max |entry| (sup-norm —
    one scalar broadcast) to keep doubles bounded; the start vector is
    all-ones.  Returns ``(i, v, rayleigh)``: the sup-normalized
    direction entry per dimension (1-based) and the Rayleigh quotient
    vᵀGv / vᵀv (the top eigenvalue estimate), both 6dp-rounded.
    """
    ex = emb.select(
        F.posexplode(
            F.expr(
                f"transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
            )
        ).alias("i0", "x"),
        F.col(id_col).cast("long").alias("id"),
    ).select("id", (F.col("i0") + 1).cast("long").alias("i"), "x")
    gram = (
        ex.select(F.col("i").alias("gi"), F.col("x").alias("xi"), "id")
        .join(ex.select(F.col("i").alias("gj"), F.col("x").alias("xj"), "id"), "id")
        .groupBy("gi", "gj")
        .agg(F.sum(F.col("xi") * F.col("xj")).cast("double").alias("g"))
        .localCheckpoint(eager=True)
    )
    dims = gram.select(F.col("gi").alias("i")).distinct()
    v = dims.select("i", F.lit(1.0).alias("v")).localCheckpoint(eager=True)
    for _ in range(n_iter):
        gv = (
            gram.join(v.select(F.col("i").alias("gj"), "v"), "gj")
            .groupBy("gi")
            .agg(F.sum(F.col("g") * F.col("v")).alias("nv"))
            .select(F.col("gi").alias("i"), "nv")
        )
        mx = gv.agg(F.max(F.abs(F.col("nv"))).alias("m"))
        v = (
            gv.crossJoin(F.broadcast(mx))
            .select("i", (F.col("nv") / F.col("m")).alias("v"))
            .localCheckpoint(eager=True)
        )
    gv = (
        gram.join(v.select(F.col("i").alias("gj"), "v"), "gj")
        .groupBy("gi")
        .agg(F.sum(F.col("g") * F.col("v")).alias("gv"))
        .select(F.col("gi").alias("i"), "gv")
    )
    num = (
        gv.join(v, "i")
        .agg(F.sum(F.col("gv") * F.col("v")).alias("n"))
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("d"))
    ray = num.crossJoin(den).select((F.col("n") / F.col("d")).alias("rayleigh"))
    return (
        v.crossJoin(F.broadcast(ray))
        .select("i", F.round("v", 6).alias("v"), F.round("rayleigh", 6).alias("rayleigh"))
    )


def ann_two_stage(
    emb: DataFrame,
    query_vec_id: int = 0,
    coarse_dims: int = 4,
    coarse_k: int = 50,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval (the matryoshka / truncate-then-rerank
    pattern): stage 1 scans the corpus with a CHEAP dot product over
    only the first ``coarse_dims`` dimensions and keeps ``coarse_k``
    candidates; stage 2 re-ranks just those candidates with the exact
    full-dimension dot product.

    At 100 TB the point is bandwidth: the coarse pass reads a
    ``coarse_dims/dim`` slice of the vector column (columnar formats
    make the truncation nearly free) and the expensive exact scoring
    touches ``coarse_k`` rows instead of the corpus.  Both stages use
    the repo's integer-quantized dot (round(x*1000) products in int64),
    so ranking replays exactly in SQL.

    Returns ``(vec_id, coarse_dot, dot)`` top-``k`` by exact dot
    (DESC, vec_id) among the stage-1 candidates.
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q))

    def _qdot(a: str, b: str) -> F.Column:
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            "CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT) * "
            "CAST(ROUND(CAST(y AS DOUBLE) * 1000, 0) AS BIGINT)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )

    coarse = (
        corpus.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            "embedding",
            "qe",
            _qdot(f"slice(embedding, 1, {coarse_dims})",
                  f"slice(qe, 1, {coarse_dims})").alias("coarse_dot"),
        )
        .orderBy(F.desc("coarse_dot"), F.asc("vec_id"))
        .limit(coarse_k)
    )
    return (
        coarse.select(
            "vec_id", "coarse_dot", _qdot("embedding", "qe").alias("dot")
        )
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(k)
    )
