"""Synchronous label propagation (community detection).

Every vertex starts with its own id; each superstep all vertices adopt
the most frequent label among their neighbors simultaneously, with a
deterministic tie-break (smallest label) so output is identical at any
parallelism — the no-order-dependence discipline the reference's
sequential numbering forced is kept here by construction.

Per superstep: one join (labels onto the undirected neighbor table) +
one (u, label) count aggregation + one per-vertex min_by argmax — all
JVM-side hash aggregates with map-side partials, no sort. The
neighbor table is pinned once for the run via edges.cache_partitioned
(default: checkpoint, with the per-job exchange shared across the
fused rounds by ReusedExchange; ``colocate=True``: cached
HashPartitioning on the JOIN key ``v`` so rounds never exchange the
neighbor table — the network-bound-cluster shape; see
cache_partitioned for the measurements behind the default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .superstep import SuperstepHarness, edge_signature, pin_input_signature


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    vertices: DataFrame | None = None,
    rounds_per_check: int = 2,
    colocate: bool = False,
    harness: SuperstepHarness | None = None,
) -> DataFrame:
    """Return ``(vertex long, label long)`` after at most ``max_iter``
    synchronous rounds (stops early when no label changes).

    ``rounds_per_check`` fuses k rounds into one lazy plan per
    materialization + changed-count check (blocks always sum to
    ``max_iter``, and stopping is only ever delayed past a fixpoint,
    where extra rounds are identity). Default 2: measured best at BOTH
    341k edges (5.4s vs 6.1s at k=3) and 6.8M edges (25.0s vs 28.8s) —
    each fused round re-references the labels via join+window, so k=3's
    recompute depth already costs more than the saved check job."""
    pairs = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    from .edges import cache_partitioned

    nbrs = cache_partitioned(
        pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        "v",
        colocate=colocate,
    )
    verts = pairs.select(F.col("u").alias("vertex")).unionByName(
        pairs.select(F.col("v").alias("vertex"))
    )
    if vertices is not None:
        verts = verts.unionByName(vertices.select(F.col("vertex").cast("long")))
    verts = verts.distinct().localCheckpoint(eager=True)

    labels = verts.select("vertex", F.col("vertex").alias("label"))
    start = 0
    if harness is not None:
        resumed = harness.latest()
        # same edge-signature pin as pagerank/hits resume (ADVICE r4):
        # a mismatched edge table must raise, not silently continue.
        # rounds_per_check never changes the synchronous label
        # sequence, so only the edge set is pinned.
        pin_input_signature(
            harness, resumed, edge_signature(pairs, "u", "v"), "", "lpa"
        )
        if resumed is not None:
            # synchronous rounds are deterministic, so resuming from
            # round t replays the identical label sequence a full run
            # produces (same contract as cc/pagerank resume)
            start, labels = resumed[0], resumed[1].select("vertex", "label")
    k = max(int(rounds_per_check), 1)
    it = start
    while it < max_iter:
        t0 = harness.timer() if harness is not None else None
        kk = min(k, max_iter - it)
        cur = labels
        for _ in range(kk):
            msgs = nbrs.join(cur, nbrs.v == cur.vertex).select("u", "label")
            counts = msgs.groupBy("u", "label").agg(F.count(F.lit(1)).alias("cnt"))
            # argmax by (cnt DESC, label ASC) as a hash aggregate with
            # map-side partials instead of a row_number window — same
            # deterministic winner, no per-round sort (negating cnt, not
            # label: label ids are xxhash64 longs where Long.MIN_VALUE
            # would overflow under ANSI negation)
            best = counts.groupBy(F.col("u").alias("vertex")).agg(
                F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), "label"))
                .alias("new_label")
            )
            cur = cur.join(best, "vertex", "left").select(
                "vertex",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
            )
        # lazy checkpoint: the changed-count aggregation is the action
        # that materializes it — one job per fused block instead of two
        # (same pattern as cc._signature)
        nxt = cur.localCheckpoint(eager=False)
        changed = nxt.filter("chg").count()
        labels = nxt.select("vertex", "label")
        it += kk
        if harness is not None:
            harness.record(
                superstep=it - 1, df=labels, changed=changed,
                delta=float(changed), timer=t0,
            )
        if changed == 0:
            break
    nbrs.unpersist()
    return labels


def label_spreading(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Semi-supervised seeded label propagation (Zhu & Ghahramani
    2002; the discrete web-spam/quality-propagation shape of Castillo
    et al. 2007): ``seeds(vertex, label)`` hold their labels FIXED,
    every other vertex synchronously adopts the most frequent label
    among its labeled neighbors (count DESC, label ASC tie-break, so
    the assignment is parallelism- and engine-independent); unlabeled
    vertices with no labeled neighbor stay unlabeled until the
    frontier reaches them.  Returns ``(vertex long, label long)`` for
    the vertices labeled after exactly ``n_iter`` rounds (fixed rounds
    — the oracle unrolls the same chain; rounds past the fixpoint are
    identity).

    Per round: one neighbor join against the O(labeled) state + one
    (vertex, label) count + one row_number window — the LPA superstep
    with a seed override, all JVM-side."""
    und = (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .unionByName(
            edges.select(
                F.col(dst).cast("long").alias("s"), F.col(src).cast("long").alias("d")
            ).filter(F.col("s") != F.col("d"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sd = seeds.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("label").cast("long").alias("label"),
    ).localCheckpoint(eager=True)
    state = sd
    for _ in range(n_iter):
        votes = (
            und.join(
                state.select(F.col("vertex").alias("d"), "label"), "d"
            )
            .groupBy(F.col("s").alias("vertex"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = votes.groupBy("vertex").agg(
            F.min_by("label", F.struct((-F.col("n")).alias("nn"), "label"))
            .alias("label")
        )
        state = sd.unionByName(
            top.join(sd.select("vertex"), "vertex", "left_anti")
        ).localCheckpoint(eager=True)
    return state


def weighted_label_propagation(
    edges: DataFrame,
    weight: str,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 5,
    colocate: bool = False,
) -> DataFrame:
    """Synchronous WEIGHTED label propagation: each round a vertex
    adopts the label with the largest summed incident edge weight
    (weight-sum DESC, label ASC tie-break) — the variant used when
    link multiplicity or anchor quality should count, not just link
    existence.

    Multi-edges collapse by summing weights per undirected pair, and
    weights are cast to long — INTEGER weights make every per-label
    sum exact, so the synchronous sequence replays bit-identically in
    the chained-CTE oracle at any parallelism (the SSSP/louvain
    integer-exactness discipline).  Same per-round shape as
    :func:`label_propagation`: one join onto the pinned neighbor
    table + one aggregate + one window.  Stops early at a fixpoint
    (further rounds are identity, so a fixed-iteration oracle
    agrees).
    """
    from .edges import cache_partitioned

    pairs = edges.select(
        F.col(src).cast("long").alias("u"),
        F.col(dst).cast("long").alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    sym = (
        pairs.unionByName(
            pairs.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    nbrs = cache_partitioned(sym, "v", colocate=colocate)
    verts = (
        pairs.select(F.col("u").alias("vertex"))
        .unionByName(pairs.select(F.col("v").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = verts.select("vertex", F.col("vertex").alias("label"))
    for _ in range(max_iter):
        msgs = nbrs.join(labels, nbrs.v == labels.vertex).select("u", "label", "w")
        counts = msgs.groupBy("u", "label").agg(F.sum("w").alias("cnt"))
        best = counts.groupBy(F.col("u").alias("vertex")).agg(
            F.min_by("label", F.struct((-F.col("cnt")).alias("nc"), "label"))
            .alias("new_label")
        )
        nxt = labels.join(best, "vertex", "left").select(
            "vertex",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
        ).localCheckpoint(eager=False)
        changed = nxt.filter("chg").count()
        labels = nxt.select("vertex", "label")
        if changed == 0:
            break
    nbrs.unpersist()
    return labels
