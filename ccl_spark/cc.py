"""Connected components via alternating large-star / small-star.

Implements the alternating star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC'14): each round
rewrites the edge set so every node points closer to its component
minimum; the fixpoint is a star forest (child -> component-min root).
Rounds are O(log n) on power-law graphs, each round a constant number
of shuffles, which is what makes this the right primitive at 10^12-edge
scale (vs. O(diameter) min-label flooding).

This generalizes the reference's equivalence-closure machinery:
/root/reference/ccl2d.py:166-191 (single-pass pair compression) and
/root/reference/ccl_marker_stack.py:484-530 (O(n^2) merge/fork closure
loop) are both replaced by the same distributed fixpoint.

Scale notes (local tests are small; the plan is what matters):
- Edges are canonicalized once; every round is `groupBy(min)` +
  equi-join, both AQE-managed. Skewed hubs are exactly the nodes that
  become roots fastest, so the star rewrite self-heals skew; AQE
  skew-join splitting covers the first rounds.
- `localCheckpoint(eager=True)` every round truncates the logical plan
  (iterative self-join lineage otherwise grows unboundedly).
- With a `SuperstepHarness` the per-round edge set is persisted to
  parquet with lineage rows, so a killed run resumes mid-algorithm.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

from .superstep import SuperstepHarness

_DEBUG = os.environ.get("CCL_SPARK_DEBUG", "") == "1"


def _dedup_pairs(df: DataFrame) -> DataFrame:
    return df.filter(F.col("u") != F.col("v")).distinct()


def _undirected(edges: DataFrame) -> DataFrame:
    """All (u, v) neighbor pairs, both directions, no self-loops."""
    fwd = edges.select(F.col("u"), F.col("v"))
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return _dedup_pairs(fwd.unionByName(rev))


def large_star(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u}).

    Output pairs always satisfy u > v (v > center >= min), so the
    result is already in canonical (hi, lo) orientation. With
    ``canonical=True`` the input is a distinct (hi, lo) set, so the
    both-directions neighbor view needs no dedup — one shuffle saved;
    Catalyst reuses the groupBy exchange for the join side.
    """
    nbrs = _undirected(edges) if not canonical else edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    out = (
        nbrs.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v"))


def small_star(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u) to their min.

    Returns the canonical distinct (hi, lo) edge set of the next round.
    ``canonical=True`` skips re-orientation when the input already has
    u > v on every pair (true for large_star output).
    """
    canon = (
        edges
        if canonical
        else edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    )
    canon = _dedup_pairs(canon)
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    lo = canon.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    hi = mins.select(F.col("u"), F.col("m").alias("v"))
    return _dedup_pairs(lo.unionByName(hi))


def _signature(edges: DataFrame) -> tuple:
    # count + xor of row hashes: order-independent, overflow-free, exact,
    # and cheap (decimal sums cost multiple seconds per round at 10^7 rows)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def _local_contract(pairs: DataFrame) -> DataFrame:
    """Per-partition union-find contraction (no shuffle).

    Each partition's subgraph is solved locally with an in-memory
    union-find (Arrow batches); the partition emits pointer rows
    (vertex -> local representative) plus the contracted edge set
    between representatives — together an equivalent, pre-flattened
    graph the global star fixpoint converges on in fewer rounds.
    This is the reference's 'label segments independently, then
    reconcile' parallelization (ccl_marker_stack.py:1678-1685) with
    the serial interface sweep replaced by the global fixpoint; the
    win grows with partition locality (src-bucketed edge tables).
    """
    import pandas as pd

    def contract(pdf_iter):
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            root = a
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[a] != root:
                parent[a], a = root, parent[a]
            return root

        rows = []
        for pdf in pdf_iter:
            rows.append(pdf)
            for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
                ru, rv = find(int(u)), find(int(v))
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
        if not rows:
            return
        # pointer rows are EDGES (vertex, rep): a vertex split across
        # partitions gets different local reps, and these rows are what
        # join them in the global fixpoint
        ptr = pd.DataFrame({"u": list(parent), "v": [find(a) for a in parent]})
        ptr = ptr[ptr["u"] != ptr["v"]]
        alledges = pd.concat(rows, ignore_index=True)
        cu = alledges["u"].map(find).to_numpy()
        cv = alledges["v"].map(find).to_numpy()
        mask = cu != cv
        ce = pd.DataFrame({"u": cu[mask], "v": cv[mask]}).drop_duplicates()
        yield pd.concat([ptr, ce], ignore_index=True)

    return pairs.mapInPandas(contract, schema="u long, v long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 60,
    harness: SuperstepHarness | None = None,
    pre_contract: bool = False,
) -> DataFrame:
    """Return ``(vertex long, component long)``.

    ``component`` is the canonical minimum vertex id of the component —
    order-free and deterministic at any parallelism, which is what lets
    local[8] and local[32] produce identical output.

    ``vertices`` (single column ``vertex``) optionally adds isolated
    vertices; endpoints of ``edges`` are always included.

    ``harness`` enables parquet checkpoint/resume + lineage metrics
    (see superstep.SuperstepHarness). Without it, localCheckpoint is
    used purely to truncate lineage.
    """
    spark = edges.sparkSession
    pairs = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    verts = pairs.select(F.col("u").alias("vertex")).unionByName(
        pairs.select(F.col("v").alias("vertex"))
    )
    if vertices is not None:
        verts = verts.unionByName(vertices.select(F.col("vertex").cast("long")))
    verts = verts.distinct()

    if pre_contract:
        pairs = _local_contract(pairs)

    # canonical (hi, lo) starting set — the round-to-round invariant
    cur = _dedup_pairs(
        pairs.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    )
    start_step = 0
    if harness is not None:
        resumed = harness.latest()
        if resumed is not None:
            start_step, cur = resumed
    cur = cur.localCheckpoint(eager=True)
    sig = _signature(cur)

    converged = sig[0] == 0
    for step in range(start_step, max_iter if not converged else 0):
        with_timer = harness.timer() if harness is not None else None
        t0 = time.monotonic() if _DEBUG else 0.0
        # lazy checkpoint: the signature aggregation is the action that
        # materializes it — one job per round instead of two
        nxt = small_star(
            large_star(cur, canonical=True), canonical=True
        ).localCheckpoint(eager=False)
        new_sig = _signature(nxt)
        if _DEBUG:
            print(
                f"cc round {step}: {new_sig[0]} edges, "
                f"{time.monotonic() - t0:.2f}s, parts={nxt.rdd.getNumPartitions()}",
                file=sys.stderr,
            )
        changed = new_sig != sig
        cur.unpersist()  # superseded round state; nxt is materialized
        if harness is not None:
            harness.record(
                superstep=step,
                df=nxt,
                changed=-1 if changed else 0,
                delta=float(abs(new_sig[0] - sig[0])),
                timer=with_timer,
            )
        cur, sig = nxt, new_sig
        if not changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # Fixpoint is a star forest: (child, root). Roots/isolated vertices
    # label themselves.
    stars = cur.groupBy("u").agg(F.min("v").alias("component"))
    labels = (
        verts.join(stars, verts.vertex == stars.u, "left")
        .select("vertex", F.coalesce("component", "vertex").alias("component"))
    )
    return labels
