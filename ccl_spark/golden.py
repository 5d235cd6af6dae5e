"""Golden-fixture pipelines as gate-visible DataFrame queries.

Each function runs a reference unittest fixture end-to-end through the
engine — threshold (F1/F2) -> intra-slice CC with boundary rules
(C1-C5) -> temporal linking (C6-C12) -> numbering replay (A1-A5,
D3-D4) — and returns the final labeled cells as a DataFrame, so the
external DuckDB gate can pin them against the reference's expected
label arrays (literal VALUES oracles; the arrays come from the
reference's own unittests):

- ccl2d basic      /root/reference/ccl2d.py:224-246
- diagonals stack  /root/reference/ccl_marker_stack.py:1242-1409
- segmented        /root/reference/ccl_marker_stack.py:1411-1632

Component membership is computed distributed (cc.py); only the
label-level numbering replay (a few ints per structure per slice —
see replay.py) runs on the driver, exactly as documented in SURVEY §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .grids import dust_filter, overlap_pairs, slice_labels, threshold_cells
from .replay import StackReplay, segmented_resolve

# --- fixture grids (cell lists; value 2.0 on a 0.0 background) -----------

CCL2D_CELLS = [
    (0, 0), (0, 2), (1, 2), (2, 2), (0, 4), (2, 4),
    (3, 5), (4, 0), (4, 3), (4, 4), (4, 5),
]

DIAGONAL_CELLS = [
    [(1, 1), (2, 1), (3, 1), (4, 1), (0, 3), (2, 3), (1, 5), (3, 5)],
    [(1, 1), (3, 1), (4, 1), (0, 3), (2, 3), (3, 3), (1, 5), (2, 5), (3, 5)],
    [(1, 1), (4, 1), (0, 3), (1, 3), (2, 3), (3, 3), (1, 5), (3, 5)],
    [],
    [(2, 3)],
    [],
    [(0, 0), (0, 4), (1, 1), (2, 0), (3, 5), (4, 2), (4, 4)],
]

# dust fixture: slice 0 has a 3-cell bar plus a 1-cell dust speck; the
# speck is filtered (min_area=2) BEFORE linking, so slice 1's 2-cell
# region at the speck's position gets a fresh label instead of linking
# (the reference order: make_slice_from filters, then relabel2 links).
DUST_CELLS = [
    [(1, 1), (2, 1), (3, 1), (1, 3)],
    [(1, 1), (2, 1), (3, 1), (1, 3), (2, 3)],
]


def grid_df(
    spark: SparkSession, stack_cells: list[list[tuple[int, int]]],
    n_rows: int, n_cols: int,
) -> DataFrame:
    """Full dense grid table (slice_id, row, col, value) with 2.0 at
    the fixture cells and 0.0 elsewhere — the F1/F2 input shape."""
    rows = []
    for sid, cells in enumerate(stack_cells):
        fg = set(cells)
        for r in range(n_rows):
            for c in range(n_cols):
                rows.append((sid, r, c, 2.0 if (r, c) in fg else 0.0))
    return spark.createDataFrame(rows, "slice_id int, row int, col int, value double")


def _replay_mapping(
    spark: SparkSession, labels: DataFrame, want_ages: bool = False
) -> DataFrame:
    """Collect the tiny per-slice label summary, run the numbering
    replay, return a mapping DataFrame (slice_id, label, final)."""
    lab_rows = labels.collect()
    ov_rows = overlap_pairs(labels).collect()
    n = max((r.slice_id for r in lab_rows), default=-1) + 1
    by_slice: list[set[int]] = [set() for _ in range(n)]
    for r in lab_rows:
        by_slice[r.slice_id].add(r.label)
    ov: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for r in ov_rows:
        ov[r.slice_id].append((r.prev_label, r.label))
    replay = StackReplay()
    for sid in range(n):
        replay.add_slice(by_slice[sid], ov[sid])
    resolved = replay.resolve()
    rows = []
    for sid in range(n):
        vals = replay.ages_at(sid) if want_ages else resolved[sid]
        rows.extend((sid, l, v) for l, v in vals.items())
    if not rows:
        rows = [(0, 0, 0)]  # never empty; fixtures always have cells
    return spark.createDataFrame(rows, "slice_id int, label int, final int")


def ccl2d_labels(spark: SparkSession) -> DataFrame:
    """Single-slice fixture through F1/F2 + C1-C5: (row, col, label)."""
    g = grid_df(spark, [CCL2D_CELLS], 5, 6)
    cells = threshold_cells(g, 1.0, 2.0, 5, 6)
    return slice_labels(cells, 5, 6, latlon=True).select("row", "col", "label")


def roi_labels(spark: SparkSession, min_col: int = 2) -> DataFrame:
    """F3 region-of-interest blank (ccl_test_on_modis.py:91): zero out
    columns < min_col before labeling — a plain pushdown predicate."""
    g = grid_df(spark, [CCL2D_CELLS], 5, 6)
    cells = threshold_cells(g, 1.0, 2.0, 5, 6).filter(f"col >= {min_col}")
    return slice_labels(cells, 5, 6, latlon=True).select("row", "col", "label")


# per-process memo of materialized fixture label tables: the gate runs
# the golden family back-to-back in one session, and e.g. the
# diagonals labels/ages queries are the SAME grid -> threshold -> CC
# pipeline differing only in the replay — rebuilding it per query is
# what pushed the gate past its time budget in round 4. Keyed by
# session so a fresh SparkSession never sees a stale checkpoint.
_LABELS_MEMO: dict[str, tuple[SparkSession, DataFrame]] = {}


def _stack_labels(
    spark: SparkSession,
    memo_key: str,
    stack_cells: list[list[tuple[int, int]]],
    n_rows: int,
    n_cols: int,
    min_area: int | None = None,
) -> DataFrame:
    hit = _LABELS_MEMO.get(memo_key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    g = grid_df(spark, stack_cells, n_rows, n_cols)
    cells = threshold_cells(g, 1.0, 2.0, n_rows, n_cols)
    labels = slice_labels(cells, n_rows, n_cols, latlon=True)
    if min_area is not None:
        labels = dust_filter(labels, min_area)
    labels = labels.localCheckpoint(eager=True)  # reused: collect + final join
    _LABELS_MEMO[memo_key] = (spark, labels)
    return labels


def _stack_query(
    spark: SparkSession,
    stack_cells: list[list[tuple[int, int]]],
    n_rows: int,
    n_cols: int,
    want_ages: bool = False,
    min_area: int | None = None,
    memo_key: str | None = None,
) -> DataFrame:
    labels = _stack_labels(
        spark,
        memo_key or str((stack_cells, min_area)),
        stack_cells,
        n_rows,
        n_cols,
        min_area,
    )
    mapping = _replay_mapping(spark, labels, want_ages=want_ages)
    out_col = "age" if want_ages else "label"
    return labels.join(mapping, ["slice_id", "label"]).selectExpr(
        "slice_id", "row", "col", f"final as {out_col}"
    )


def diagonals_labels(spark: SparkSession) -> DataFrame:
    """7-slice temporal-tracking fixture, replayed final labels."""
    return _stack_query(spark, DIAGONAL_CELLS, 5, 6, memo_key="diagonals")


def diagonals_ages(spark: SparkSession) -> DataFrame:
    """Same fixture, per-cell component ages (A3/G2)."""
    return _stack_query(spark, DIAGONAL_CELLS, 5, 6, want_ages=True, memo_key="diagonals")


def dust_labels(spark: SparkSession) -> DataFrame:
    """Min-area filter exercised through the golden path (F4 before C6)."""
    return _stack_query(spark, DUST_CELLS, 5, 6, min_area=2)


def segmented_cells() -> list[list[tuple[int, int]]]:
    """The 25-slice segmented fixture (ccl_marker_stack.py:1411-1632)."""
    nseg, nstride = 5, 5
    nd = nseg * nstride
    out = []
    for i in range(nd):
        cells = [(2, 2), (2, 4)]
        if i == nd - nstride - 1:
            cells += [(0, 2), (1, 2)]
        if i == nd - nstride:
            cells += [(0, 2)]
        if i in (2 * nstride, 2 * nstride + 1):
            cells += [(0, 0)]
        out.append(cells)
    return out


def segmented_labels(spark: SparkSession) -> DataFrame:
    """Segmented protocol (D3/D4/A4/A5): 5 segments labeled
    independently, stitched at interfaces, globally reconciled."""
    nseg, nstride = 5, 5
    stack = segmented_cells()
    g = grid_df(spark, stack, 4, 5)
    cells = threshold_cells(g, 1.0, 2.0, 4, 5)
    labels = slice_labels(cells, 4, 5, latlon=True).localCheckpoint(eager=True)
    lab_rows = labels.collect()
    ov_rows = overlap_pairs(labels).collect()
    n = nseg * nstride
    by_slice: list[set[int]] = [set() for _ in range(n)]
    for r in lab_rows:
        by_slice[r.slice_id].add(r.label)
    ov: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for r in ov_rows:
        ov[r.slice_id].append((r.prev_label, r.label))

    segments = []
    for s in range(nseg):
        seg = StackReplay()
        for j in range(nstride):
            sid = s * nstride + j
            seg.add_slice(by_slice[sid], ov[sid] if j > 0 else [])
        segments.append(seg)
    interface_ov = [ov[s * nstride + nstride] for s in range(nseg - 1)]
    resolved = segmented_resolve(segments, interface_ov)

    rows = []
    for s in range(nseg):
        for j in range(nstride):
            sid = s * nstride + j
            rows.extend((sid, l, v) for l, v in resolved[s][j].items())
    mapping = spark.createDataFrame(rows, "slice_id int, label int, final int")
    return labels.join(mapping, ["slice_id", "label"]).selectExpr(
        "slice_id", "row", "col", "final as label"
    )
