"""Per-component aggregates and snapshot operators.

Maps the reference's label bookkeeping to DataFrame one-liners
(SURVEY.md §2):

- component_sizes      G1  np.unique(return_counts) ccl_marker_stack.py:908-914
- top_k_components     G5  cc3d.largest_k            contrib/cc3d.ipynb
- min_size_filter      F4  minimum_pixel_area        ccl_marker_stack.py:904-930
- ages                 G2  m_ages                    ccl_marker_stack.py:989-1003
- end_of_life          C11 m0_eol                    ccl_marker_stack.py:664-667
- incremental_cc       C6  ccl_relabel2 linking      ccl_marker_stack.py:262-723,
  generalized: a new crawl snapshot's edges merge into existing
  components without recomputing from scratch — prior labels enter the
  union-find as (vertex -> component) edges, so converged state is
  reused and only newly-connected regions move.

`labels` tables are ``(vertex long, component long)``; snapshot
variants add ``snapshot_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cc import connected_components


def component_sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("component").agg(F.count(F.lit(1)).alias("n_vertices"))


def top_k_components(labels: DataFrame, k: int = 10) -> DataFrame:
    return (
        component_sizes(labels)
        .orderBy(F.desc("n_vertices"), F.asc("component"))
        .limit(k)
    )


def dense_renumber(distinct_ids: DataFrame, col: str = "component") -> DataFrame:
    """(id, rank) dense 1-based renumbering by ascending id — without a
    global window (which would funnel every distinct id through one
    task). Two-phase: range-partition the distinct ids, rank within
    each partition (parallel window), then add per-partition offsets
    (one tiny count per partition collected to the driver, same scale
    as a convergence scalar)."""
    n_parts = max(distinct_ids.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        distinct_ids.select(col)
        .distinct()
        .repartitionByRange(n_parts, col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partitioning across the two jobs below
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = distinct_ids.sparkSession.createDataFrame(
        list(offsets.items()), "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(col)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(col, (F.row_number().over(w) + F.col("_off")).alias("rank"))
    )


def min_size_filter(labels: DataFrame, min_size: int, renumber: bool = False) -> DataFrame:
    """Drop components smaller than ``min_size`` (the reference's dust
    filter, ccl_marker_stack.py:904-930); optionally dense-renumber
    survivors by ascending component id (the reference's np.unique
    compaction — labels renumbered to arange in ascending old-label
    order, background slot 0 excluded)."""
    keep = component_sizes(labels).filter(F.col("n_vertices") >= min_size)
    out = labels.join(keep.select("component"), "component", "left_semi")
    if renumber:
        ranks = dense_renumber(out.select("component"), "component").select(
            "component", F.col("rank").alias("new_component")
        )
        out = out.join(ranks, "component").select(
            "vertex", F.col("new_component").alias("component")
        )
    return out


def ages(snapshot_labels: DataFrame) -> DataFrame:
    """(component, age): number of distinct snapshots in which the
    component appears — the reference's per-label lifetime."""
    return snapshot_labels.groupBy("component").agg(
        F.countDistinct("snapshot_id").alias("age")
    )


def end_of_life(snapshot_labels: DataFrame) -> DataFrame:
    """(snapshot_id, component): components present in snapshot t but
    absent from the NEXT PRESENT snapshot (consecutive present ids are
    paired via lead() over the distinct snapshot-id axis, so gap-y
    sequences like {0, 1, 5} don't spuriously EOL everything at the
    gap). The final snapshot is not an EOL boundary.

    The snapshot-id axis is tiny (one row per crawl/slice), so the
    global lead() window and the broadcast of the (id, next_id) map
    are O(#snapshots), never O(|labels|)."""
    present = snapshot_labels.select("snapshot_id", "component").distinct()
    snaps = present.select("snapshot_id").distinct()
    nxt_map = snaps.select(
        "snapshot_id",
        F.lead("snapshot_id").over(Window.orderBy("snapshot_id")).alias("_next"),
    )
    nxt_present = present.select(
        F.col("snapshot_id").alias("_next"), "component"
    )
    return (
        present.join(F.broadcast(nxt_map), "snapshot_id")
        .filter(F.col("_next").isNotNull())
        .join(nxt_present, ["_next", "component"], "left_anti")
        .select("snapshot_id", "component")
    )


def incremental_cc(
    prev_labels: DataFrame | None, new_edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Fold a new batch of edges into existing components.

    Prior (vertex, component) rows are already star edges pointing at
    their component minimum, so feeding them to the union-find together
    with the new edges converges in very few rounds: only chains of
    newly-merged components iterate. Labels stay canonical minima, so
    repeated incremental runs equal a from-scratch run (tested)."""
    if prev_labels is None:
        return connected_components(new_edges, src, dst)
    star = prev_labels.select(
        F.col("vertex").alias("u"), F.col("component").alias("v")
    )
    combined = new_edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).unionByName(star)
    return connected_components(
        combined, "u", "v", vertices=prev_labels.select("vertex")
    )
