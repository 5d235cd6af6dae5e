"""Helpers shared by the golden-fixture tests: build cell DataFrames
from in-test grids and reassemble label arrays from the engine output."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ccl_spark.grids import overlap_pairs, slice_labels
from ccl_spark.replay import StackReplay


def cells_df(spark: SparkSession, stack: list[list[list[float]]]) -> DataFrame:
    """stack[slice][row][col] -> foreground cells (value > 1, the
    fixtures' thresh=(1,2) after uint8 quantization keeps value==2)."""
    rows = []
    for sid, grid in enumerate(stack):
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v > 1:
                    rows.append((sid, r, c))
    return spark.createDataFrame(rows, "slice_id int, row int, col int")


def collect_slice_labels(
    spark: SparkSession, stack, n_rows: int, n_cols: int, latlon: bool = True
):
    """Returns (labels_by_slice, overlaps_by_slice):
    labels_by_slice[sid] = {(row, col): label};
    overlaps_by_slice[sid] = [(prev_label, label), ...] linking sid-1 -> sid.
    """
    cells = cells_df(spark, stack)
    lab = slice_labels(cells, n_rows, n_cols, latlon=latlon)
    lab_rows = lab.collect()
    ov_rows = overlap_pairs(lab).collect()
    n = len(stack)
    labels_by_slice = [{} for _ in range(n)]
    for r in lab_rows:
        labels_by_slice[r.slice_id][(r.row, r.col)] = r.label
    overlaps_by_slice = [[] for _ in range(n)]
    for r in ov_rows:
        overlaps_by_slice[r.slice_id].append((r.prev_label, r.label))
    return labels_by_slice, overlaps_by_slice


def replay_stack(labels_by_slice, overlaps_by_slice) -> StackReplay:
    replay = StackReplay()
    for sid, lmap in enumerate(labels_by_slice):
        replay.add_slice(set(lmap.values()), overlaps_by_slice[sid])
    return replay


def to_array(label_map: dict, value_map: dict, n_rows: int, n_cols: int):
    """Rebuild the dense int array: label_map {(r,c): per-slice label},
    value_map {per-slice label: final id}."""
    out = [[0] * n_cols for _ in range(n_rows)]
    for (r, c), l in label_map.items():
        out[r][c] = value_map[l]
    return out
