"""HITS (Kleinberg hubs & authorities) by power iteration.

Per iteration: authority(v) = sum of hub over in-neighbors, then
L2-normalize; hub(u) = sum of authority over out-neighbors, then
L2-normalize.

Scale shape (round-4 rework, all measured — see edges.cache_partitioned
for the numbers):

- ``iters_per_check=2`` fuses two full iterations per materialization,
  so the edge-relation exchanges inside a job are shared by Catalyst's
  ReusedExchange instead of being paid per iteration (6.8M edges, 10
  iters: 75s -> 61s; k=3's plan depth erodes the gain back to 71s).
- ``colocate=True`` switches to TWO cached co-partitioned edge
  orientations (``e_src`` by src for the authority half-step, ``e_dst``
  by dst for the hub half-step) so NEITHER join ever exchanges the
  edge relation — only the |V|-sized state shuffles (plan-audited by
  tests/test_plan_audits.py::test_hits_iteration_no_edge_exchange).
  That is the shape for network-bound clusters where an edge exchange
  dominates; on this single-node sandbox the columnar cache decode
  costs more than the tmpfs shuffle, so the default is the checkpoint
  + fused-exchange-reuse shape.

Each half-step is one equi-join + one map-side-combined groupBy sum;
the normalization scalar is a 1-row aggregate broadcast into the plan.

Fixed-iteration mode (tol=0) replays a deterministic sequence, which
is what the driver-gate's chained-CTE oracle reproduces (block fusion
never changes the arithmetic or the iteration count); in that mode no
delta aggregation runs at all (ADVICE r3) — state is materialized by
an eager localCheckpoint and the convergence scan is skipped. With
``tol > 0`` the check runs once per block, so convergence may overshoot
by up to k-1 iterations — never stop early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .superstep import SuperstepHarness, edge_signature, pin_input_signature


def _prepare(edges: DataFrame, src: str, dst: str, colocate: bool = False):
    """Vertex set + the edge table(s): two cached co-partitioned
    orientations when colocating, one shared checkpoint otherwise
    (duplicating the bytes buys nothing without pinned partitioning)."""
    from .edges import cache_partitioned

    pairs = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    verts = (
        pairs.select(F.col("src").alias("vertex"))
        .unionByName(pairs.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if colocate:
        e_src = cache_partitioned(pairs, "src", colocate=True)
        e_dst = cache_partitioned(pairs, "dst", colocate=True)
    else:
        e_src = e_dst = cache_partitioned(pairs, "src")
    return verts, e_src, e_dst


def _normalized(scores: DataFrame, col: str) -> DataFrame:
    nrm = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
    return scores.crossJoin(F.broadcast(nrm)).select(
        "vertex",
        F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
        .otherwise(F.lit(0.0))
        .alias(col),
    )


def _msgs_auth(e_src: DataFrame, state: DataFrame) -> DataFrame:
    """The authority half-step's edge x state join — with colocated
    orientations, e_src's cached HashPartitioning(src) is reused and
    only state shuffles (plan-audited)."""
    return e_src.join(state.select(F.col("vertex").alias("src"), "hub"), "src")


def _msgs_hub(e_dst: DataFrame, auth: DataFrame) -> DataFrame:
    """The hub half-step's edge x authority join — with colocated
    orientations, e_dst's cached HashPartitioning(dst) is reused and
    only auth shuffles (plan-audited)."""
    return e_dst.join(auth.select(F.col("vertex").alias("dst"), "authority"), "dst")


def _auth_step(e_src: DataFrame, state: DataFrame, verts: DataFrame) -> DataFrame:
    """authority = normalized sum of hub over in-neighbors."""
    a_raw = (
        _msgs_auth(e_src, state)
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.sum("hub").alias("authority"))
    )
    return _normalized(
        verts.join(a_raw, "vertex", "left").select(
            "vertex", F.coalesce("authority", F.lit(0.0)).alias("authority")
        ),
        "authority",
    )


def _hub_step(e_dst: DataFrame, auth: DataFrame, verts: DataFrame) -> DataFrame:
    """hub = normalized sum of authority over out-neighbors."""
    h_raw = (
        _msgs_hub(e_dst, auth)
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.sum("authority").alias("hub"))
    )
    return _normalized(
        verts.join(h_raw, "vertex", "left").select(
            "vertex", F.coalesce("hub", F.lit(0.0)).alias("hub")
        ),
        "hub",
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    tol: float = 0.0,
    iters_per_check: int = 2,
    colocate: bool = False,
    harness: SuperstepHarness | None = None,
) -> DataFrame:
    """Return ``(vertex long, hub double, authority double)``, both
    scores L2-normalized. ``tol > 0`` stops early when the max
    per-vertex change of both scores drops below it (checked once per
    fused block). ``harness`` checkpoints per-block state + lineage and
    resumes mid-algorithm (the deterministic iteration sequence makes a
    resumed run equal an uninterrupted one — same contract as
    cc/pagerank/lpa)."""
    verts, e_src, e_dst = _prepare(edges, src, dst, colocate=colocate)

    # init all-ones; the in-iteration normalization makes the sequence
    # of NORMALIZED scores independent of the initial scaling
    state = verts.select(
        "vertex", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint(eager=True)
    it = 0
    if harness is not None:
        resumed = harness.latest()
        # resuming a checkpoint against a different edge table would
        # silently continue iterating the wrong graph (ADVICE r4) —
        # pin the same order-free edge signature pagerank uses. Only
        # the edge set is pinned: iters_per_check/colocate never change
        # the iterate sequence, and tol only decides when to stop.
        pin_input_signature(
            harness,
            resumed,
            edge_signature(
                edges.select(
                    F.col(src).cast("long").alias("src"),
                    F.col(dst).cast("long").alias("dst"),
                ).distinct(),
                "src",
                "dst",
            ),
            "",
            "hits",
        )
        if resumed is not None:
            it = resumed[0]
            state = resumed[1].select("vertex", "hub", "authority")
    k = max(int(iters_per_check), 1)
    while it < max_iter:
        t0 = harness.timer() if harness is not None else None
        kk = min(k, max_iter - it)
        s = state
        for _ in range(kk):
            auth = _auth_step(e_src, s, verts)
            hub = _hub_step(e_dst, auth, verts)
            s = _join2(s.select("vertex"), hub, auth)
        if tol > 0:
            nxt = (
                state.select(
                    "vertex",
                    F.col("hub").alias("old_hub"),
                    F.col("authority").alias("old_authority"),
                )
                .join(s, "vertex")
                .localCheckpoint(eager=False)
            )
            delta = nxt.agg(
                F.max(
                    F.greatest(
                        F.abs(F.col("hub") - F.col("old_hub")),
                        F.abs(F.col("authority") - F.col("old_authority")),
                    )
                )
            ).first()[0]
            state = nxt.select("vertex", "hub", "authority")
            it += kk
            if harness is not None:
                harness.record(
                    superstep=it - 1, df=state, changed=-1,
                    delta=float(delta) if delta is not None else 0.0, timer=t0,
                )
            if delta is not None and delta < tol:
                break
        else:
            # fixed-iteration mode: no discarded delta aggregation
            # (ADVICE r3) — the eager checkpoint is the materializer
            state = s.localCheckpoint(eager=True)
            it += kk
            if harness is not None:
                harness.record(
                    superstep=it - 1, df=state, changed=-1, delta=0.0, timer=t0
                )
    e_src.unpersist()
    if e_dst is not e_src:
        e_dst.unpersist()
    return state


def _join2(base: DataFrame, hub: DataFrame, auth: DataFrame) -> DataFrame:
    keep = [c for c in base.columns if c not in ("vertex", "hub", "authority")]
    return (
        base.join(hub, "vertex").join(auth, "vertex").select("vertex", *keep, "hub", "authority")
    )


def salsa(
    edges: DataFrame,
    max_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """SALSA hub/authority scores (Lempel & Moran 2000): power
    iteration of the two bipartite random-walk chains.

    Authority chain: from authority k step back to a uniform
    in-neighbor i, then forward to a uniform out-neighbor of i; the
    hub chain is the mirror image.  Each iteration is therefore two
    edge-keyed equi-joins with degree division — the same
    one-exchange-per-hop shape as PageRank, never materializing the
    quadratic A^T·A.  Both chains start uniform and preserve total
    mass exactly, so the final normalization divides by the exact
    integer node count (bit-identical across engines) rather than a
    float sum.

    Returns ``(vertex, authority, hub)`` rounded to 6dp; vertices
    missing from a chain (no in-links / no out-links) carry 0.0.
    ``max_iter`` is a fixed iteration count — the chains converge
    geometrically and the oracle replays the identical rounds.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    od = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy("d").agg(F.count(F.lit(1)).alias("idg"))

    # ---- authority chain ----
    a = idg.select(F.col("d").alias("v"), F.lit(1.0).alias("a"))
    for _ in range(max_iter):
        back = (
            e.join(idg, "d")
            .join(a, e["d"] == F.col("v"))
            .groupBy("s")
            .agg(F.sum(F.col("a") / F.col("idg")).alias("m"))
        )
        a = (
            e.join(od, "s")
            .join(back, "s")
            .groupBy(e["d"])
            .agg(F.sum(F.col("m") / F.col("od")).alias("a"))
            .select(F.col("d").alias("v"), "a")
            .localCheckpoint(eager=True)
        )

    # ---- hub chain (mirror) ----
    h = od.select(F.col("s").alias("v"), F.lit(1.0).alias("h"))
    for _ in range(max_iter):
        fwd = (
            e.join(od, "s")
            .join(h, e["s"] == F.col("v"))
            .groupBy("d")
            .agg(F.sum(F.col("h") / F.col("od")).alias("m"))
        )
        h = (
            e.join(idg, "d")
            .join(fwd, "d")
            .groupBy(e["s"])
            .agg(F.sum(F.col("m") / F.col("idg")).alias("h"))
            .select(F.col("s").alias("v"), "h")
            .localCheckpoint(eager=True)
        )

    n_a = idg.agg(F.count(F.lit(1)).alias("n_a"))
    n_h = od.agg(F.count(F.lit(1)).alias("n_h"))
    a_norm = a.crossJoin(F.broadcast(n_a)).select(
        "v", (F.col("a") / F.col("n_a")).alias("a")
    )
    h_norm = h.crossJoin(F.broadcast(n_h)).select(
        "v", (F.col("h") / F.col("n_h")).alias("h")
    )
    return (
        a_norm.join(h_norm, "v", "full_outer")
        .select(
            F.col("v").alias("vertex"),
            F.round(F.coalesce("a", F.lit(0.0)), 6).alias("authority"),
            F.round(F.coalesce("h", F.lit(0.0)), 6).alias("hub"),
        )
    )
