"""Grid-stack fixtures -> graph adapter.

Re-expresses the reference's pixel pipeline as edge tables so the same
distributed connected-components primitive (cc.py) covers it:

- threshold (ccl2d.py:56-62): foreground iff ``value > lo`` after the
  reference's uint8 quantization (ccl2d.py:33-40) — replicated exactly,
  including int() truncation of the trigger.
- 8-connectivity within a slice (cv2.connectedComponents default,
  confirmed by the diagonal merges in the ccl2d.py:240-246 fixture).
- polar rule (ccl2d.py:117-126): all foreground in row 0 is one
  component; likewise row n_rows-1.
- dateline rule (ccl2d.py:132-163): col 0 and col n_cols-1 cells merge
  at row offsets {-1, 0, +1}.
- per-slice label numbers (what the golden fixtures pin): OpenCV's
  8-connectivity labeling is block-based (BBDT/Spaghetti family — 2x2
  blocks scanned in raster order, final labels ascending by first block
  touched). So the reference's per-slice label of a component is the
  dense rank of min over its pixels of the 2x2-block raster index.
  Verified against all four reference fixtures.
- temporal overlap (ccl_marker_stack.py:300-343): consecutive slices
  linked where the later slice's foreground coincides with the earlier
  slice's labels — an equi-join on (row, col).

Cell tables are tiny fixtures here, but every operator is a plain
DataFrame join/agg that scales: neighbor offsets are an explode +
equi-join (no cross product), boundary rules are per-slice aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cc import connected_components


def threshold_cells(
    grid: DataFrame,
    lo: float,
    hi: float,
    n_rows: int,
    n_cols: int,
) -> DataFrame:
    """Foreground cells of ``grid(slice_id, row, col, value)``.

    Replicates ccl2d's normalize+threshold arithmetic per slice:
    data_u8 = uint8(255 * v / max_slice); trigger = int(255 * lo / max_slice);
    foreground iff data_u8 > trigger. (Binary-threshold semantics:
    ``value > trigger`` is foreground — the module docstring in the
    reference says "below", the code and fixtures say ">".)
    """
    mx = grid.groupBy("slice_id").agg(F.max("value").alias("mx"))
    mx = mx.select(
        "slice_id", F.when(F.col("mx") == 0, F.lit(1.0)).otherwise(F.col("mx")).alias("mx")
    )
    g = grid.join(mx, "slice_id")
    d_u8 = F.floor(F.lit(255.0) * F.col("value") / F.col("mx")).cast("int")
    trigger = F.floor(F.lit(255.0) * F.lit(float(lo)) / F.col("mx")).cast("int")
    return g.filter(d_u8 > trigger).select("slice_id", "row", "col")


def intra_slice_edges(
    cells: DataFrame, n_rows: int, n_cols: int, latlon: bool = True
) -> DataFrame:
    """Edges (src, dst) over cell vertex ids within each slice.

    vertex id = slice_id * n_rows * n_cols + row * n_cols + col.
    """
    vid = (
        F.col("slice_id").cast("long") * (n_rows * n_cols)
        + F.col("row").cast("long") * n_cols
        + F.col("col").cast("long")
    )
    c = cells.select("slice_id", "row", "col", vid.alias("vid"))

    # 8-connectivity: emit 4 forward offsets, equi-join on target coords.
    offsets = [(0, 1), (1, -1), (1, 0), (1, 1)]
    off = c.sparkSession.createDataFrame(offsets, "dr int, dc int")
    probes = c.crossJoin(F.broadcast(off)).select(
        "slice_id",
        (F.col("row") + F.col("dr")).alias("row"),
        (F.col("col") + F.col("dc")).alias("col"),
        F.col("vid").alias("src"),
    )
    adj = probes.join(c, ["slice_id", "row", "col"]).select("src", F.col("vid").alias("dst"))

    parts = [adj]
    if latlon:
        # Polar rows: anchor-star edges instead of a pairwise clique.
        for r in (0, n_rows - 1):
            ring = c.filter(F.col("row") == r)
            anchor = ring.groupBy("slice_id").agg(F.min("vid").alias("anchor"))
            parts.append(
                ring.join(anchor, "slice_id")
                .filter(F.col("vid") != F.col("anchor"))
                .select(F.col("anchor").alias("src"), F.col("vid").alias("dst"))
            )
        # Dateline: col 0 <-> col n_cols-1 at row offsets {-1, 0, +1}.
        west = c.filter(F.col("col") == 0).select("slice_id", "row", F.col("vid").alias("wv"))
        east = c.filter(F.col("col") == n_cols - 1).select(
            "slice_id", "row", F.col("vid").alias("ev")
        )
        for dr in (-1, 0, 1):
            parts.append(
                west.withColumn("row", F.col("row") + dr)
                .join(east, ["slice_id", "row"])
                .select(F.col("wv").alias("src"), F.col("ev").alias("dst"))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def slice_labels(
    cells: DataFrame, n_rows: int, n_cols: int, latlon: bool = True
) -> DataFrame:
    """Per-slice reference labels: (slice_id, row, col, label).

    Components come from the distributed CC fixpoint; the label integer
    is the reference's: dense rank within the slice of the component's
    minimum 2x2-block raster index (OpenCV block-scan order), 1-based.
    """
    size = n_rows * n_cols
    vid = (
        F.col("slice_id").cast("long") * size
        + F.col("row").cast("long") * n_cols
        + F.col("col").cast("long")
    )
    c = cells.select("slice_id", "row", "col", vid.alias("vid"))
    edges = intra_slice_edges(cells, n_rows, n_cols, latlon)
    comps = connected_components(
        edges, src="src", dst="dst", vertices=c.select(F.col("vid").alias("vertex"))
    )
    n_block_cols = (n_cols + 1) // 2
    block_key = (F.col("row") / 2).cast("long") * n_block_cols + (F.col("col") / 2).cast("long")
    labeled = c.join(comps, c.vid == comps.vertex).select(
        "slice_id", "row", "col", "component", block_key.alias("bk")
    )
    comp_key = labeled.groupBy("slice_id", "component").agg(F.min("bk").alias("min_bk"))
    w = Window.partitionBy("slice_id").orderBy("min_bk")
    comp_lbl = comp_key.select("slice_id", "component", F.dense_rank().over(w).alias("label"))
    return labeled.join(comp_lbl, ["slice_id", "component"]).select(
        "slice_id", "row", "col", "label"
    )


def voxel_edges(cells: DataFrame, n_rows: int, n_cols: int) -> DataFrame:
    """26-connectivity edges over a voxel stack (slice_id, row, col) —
    the 3D variant of the reference's contrib/cc3d.ipynb cell 8
    (``cc3d.connected_components(data, connectivity=26)``).

    Same shape as intra_slice_edges: emit the 13 forward offsets of the
    26-neighborhood, equi-join on target coordinates — an explode +
    join, never a cross product; dust filtering and top-k reuse F4/G5
    on the resulting labels."""
    vid = (
        F.col("slice_id").cast("long") * (n_rows * n_cols)
        + F.col("row").cast("long") * n_cols
        + F.col("col").cast("long")
    )
    c = cells.select("slice_id", "row", "col", vid.alias("vid"))
    # forward half of the 26-neighborhood: (ds, dr, dc) lexicographically > 0
    offsets = [(0, 0, 1), (0, 1, -1), (0, 1, 0), (0, 1, 1)] + [
        (1, dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    ]
    off = c.sparkSession.createDataFrame(offsets, "ds int, dr int, dc int")
    probes = c.crossJoin(F.broadcast(off)).select(
        (F.col("slice_id") + F.col("ds")).alias("slice_id"),
        (F.col("row") + F.col("dr")).alias("row"),
        (F.col("col") + F.col("dc")).alias("col"),
        F.col("vid").alias("src"),
    )
    return probes.join(c, ["slice_id", "row", "col"]).select(
        "src", F.col("vid").alias("dst")
    )


def voxel_components(cells: DataFrame, n_rows: int, n_cols: int) -> DataFrame:
    """(slice_id, row, col, component) for a voxel stack under
    26-connectivity; component = canonical min voxel id."""
    vid = (
        F.col("slice_id").cast("long") * (n_rows * n_cols)
        + F.col("row").cast("long") * n_cols
        + F.col("col").cast("long")
    )
    c = cells.select("slice_id", "row", "col", vid.alias("vid"))
    comps = connected_components(
        voxel_edges(cells, n_rows, n_cols),
        vertices=c.select(F.col("vid").alias("vertex")),
    ).select(F.col("vertex").alias("vid"), "component")
    return c.join(comps, "vid").select("slice_id", "row", "col", "component")


def dust_filter(labels: DataFrame, min_area: int) -> DataFrame:
    """Reference dust filter (F4, ccl_marker_stack.py:904-930), applied
    per slice *before* temporal linking (as make_slice_from does): drop
    labels covering < ``min_area`` cells, then dense-renumber survivors
    in ascending old-label order (the reference's np.unique compaction;
    the background slot 0 is assumed kept, which holds whenever the
    grid has >= min_area background cells).

    The renumber window is partitioned by slice_id — parallel across
    slices, never a global window."""
    counts = labels.groupBy("slice_id", "label").agg(F.count(F.lit(1)).alias("n"))
    keep = counts.filter(F.col("n") >= min_area).select("slice_id", "label")
    kept = labels.join(keep, ["slice_id", "label"], "left_semi")
    w = Window.partitionBy("slice_id").orderBy("label")
    ranks = keep.select(
        "slice_id", "label", F.dense_rank().over(w).alias("new_label")
    )
    return kept.join(ranks, ["slice_id", "label"]).select(
        "slice_id", "row", "col", F.col("new_label").alias("label")
    )


def overlap_pairs(labels: DataFrame) -> DataFrame:
    """Temporal links: (slice_id, prev_label, label) where slice t's
    foreground coincides (same row, col) with slice t-1's foreground.

    This is the Equivalence build of ccl_marker_stack.py:128-218 as a
    single equi-join + distinct instead of a per-pixel dict loop.
    """
    cur = labels.select("slice_id", "row", "col", "label")
    prev = labels.select(
        (F.col("slice_id") + 1).alias("slice_id"),
        "row",
        "col",
        F.col("label").alias("prev_label"),
    )
    return cur.join(prev, ["slice_id", "row", "col"]).select(
        "slice_id", "prev_label", "label"
    ).distinct()
