"""Exact-label parity with the reference's golden unittest fixtures.

Each test ports a fixture grid from /root/reference and asserts our
distributed CC + numbering replay reproduces the reference's expected
integer label arrays exactly (the reference asserts with np.allclose
rtol 1e-5 on integers — i.e. exact):

- ccl2d basic      ccl2d.py:224-246
- diagonals stack  ccl_marker_stack.py:1242-1409 (labels + ages)
- relabel2         ccl_marker_stack.py:1966-2065
- segmented        ccl_marker_stack.py:1411-1632
"""

from __future__ import annotations

from ccl_spark.replay import StackReplay, segmented_resolve
from tests.gridutil import collect_slice_labels, replay_stack, to_array


def grid(n_rows, n_cols, cells):
    g = [[0.0] * n_cols for _ in range(n_rows)]
    for r, c in cells:
        g[r][c] = 2.0
    return g


def test_ccl2d_basic(spark):
    d0 = grid(
        5,
        6,
        [(0, 0), (0, 2), (1, 2), (2, 2), (0, 4), (2, 4), (3, 5), (4, 0), (4, 3), (4, 4), (4, 5)],
    )
    expected = [
        [1, 0, 1, 0, 1, 0],
        [0, 0, 1, 0, 0, 0],
        [0, 0, 1, 0, 2, 0],
        [0, 0, 0, 0, 0, 2],
        [2, 0, 0, 2, 2, 2],
    ]
    labels, _ = collect_slice_labels(spark, [d0], 5, 6)
    got = to_array(labels[0], {l: l for l in labels[0].values()}, 5, 6)
    assert got == expected


DIAGONAL_SLICES = [
    grid(5, 6, [(1, 1), (2, 1), (3, 1), (4, 1), (0, 3), (2, 3), (1, 5), (3, 5)]),
    grid(5, 6, [(1, 1), (3, 1), (4, 1), (0, 3), (2, 3), (3, 3), (1, 5), (2, 5), (3, 5)]),
    grid(5, 6, [(1, 1), (4, 1), (0, 3), (1, 3), (2, 3), (3, 3), (1, 5), (3, 5)]),
    grid(5, 6, []),
    grid(5, 6, [(2, 3)]),
    grid(5, 6, []),
    grid(5, 6, [(0, 0), (0, 4), (1, 1), (2, 0), (3, 5), (4, 2), (4, 4)]),
]

DIAGONAL_EXPECTED = [
    [[0, 0, 0, 11, 0, 0], [0, 10, 0, 0, 0, 12], [0, 10, 0, 11, 0, 0], [0, 10, 0, 0, 0, 12], [0, 10, 0, 0, 0, 0]],
    [[0, 0, 0, 11, 0, 0], [0, 10, 0, 0, 0, 12], [0, 0, 0, 11, 0, 12], [0, 10, 0, 11, 0, 12], [0, 10, 0, 0, 0, 0]],
    [[0, 0, 0, 11, 0, 0], [0, 10, 0, 11, 0, 12], [0, 0, 0, 11, 0, 0], [0, 0, 0, 11, 0, 12], [0, 10, 0, 0, 0, 0]],
    [[0] * 6 for _ in range(5)],
    [[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 13, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]],
    [[0] * 6 for _ in range(5)],
    [[14, 0, 0, 0, 14, 0], [0, 14, 0, 0, 0, 0], [14, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 14], [0, 0, 14, 0, 14, 0]],
]

DIAGONAL_AGES = [
    [[0, 0, 0, 3, 0, 0], [0, 3, 0, 0, 0, 3], [0, 3, 0, 3, 0, 0], [0, 3, 0, 0, 0, 3], [0, 3, 0, 0, 0, 0]],
    [[0, 0, 0, 3, 0, 0], [0, 3, 0, 0, 0, 3], [0, 0, 0, 3, 0, 3], [0, 3, 0, 3, 0, 3], [0, 3, 0, 0, 0, 0]],
    [[0, 0, 0, 3, 0, 0], [0, 3, 0, 3, 0, 3], [0, 0, 0, 3, 0, 0], [0, 0, 0, 3, 0, 3], [0, 3, 0, 0, 0, 0]],
    [[0] * 6 for _ in range(5)],
    [[0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]],
    [[0] * 6 for _ in range(5)],
    [[1, 0, 0, 0, 1, 0], [0, 1, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 1], [0, 0, 1, 0, 1, 0]],
]


def test_diagonals_labels_and_ages(spark):
    labels, overlaps = collect_slice_labels(spark, DIAGONAL_SLICES, 5, 6)
    replay = replay_stack(labels, overlaps)
    resolved = replay.resolve()
    for sid in range(len(DIAGONAL_SLICES)):
        got = to_array(labels[sid], resolved[sid], 5, 6)
        assert got == DIAGONAL_EXPECTED[sid], f"labels mismatch at slice {sid}"
    for sid in range(len(DIAGONAL_SLICES)):
        got = to_array(labels[sid], replay.ages_at(sid), 5, 6)
        assert got == DIAGONAL_AGES[sid], f"ages mismatch at slice {sid}"


def test_relabel2(spark):
    d0 = grid(5, 6, [(r, 2) for r in range(5)])
    d1 = grid(5, 6, [(0, 2), (2, 2), (1, 5), (2, 5), (3, 5), (4, 5)])
    d2 = grid(5, 6, [(0, 2), (1, 5), (3, 5), (4, 5)])
    expected_m1_new = [
        [0, 0, 3, 0, 0, 0],
        [0, 0, 0, 0, 0, 2],
        [0, 0, 3, 0, 0, 2],
        [0, 0, 0, 0, 0, 2],
        [0, 0, 0, 0, 0, 2],
    ]
    expected_m0_resolved = [[0, 0, 4, 0, 0, 0] for _ in range(5)]

    labels, overlaps = collect_slice_labels(spark, [d0, d1, d2], 5, 6)
    replay = replay_stack(labels, overlaps)
    # stored slice 1 == m1_new of the first ccl_relabel2 call
    assert to_array(labels[1], replay.slices[1], 5, 6) == expected_m1_new
    # composed back-substitution of slice 0 through both translations
    resolved = replay.resolve()
    assert to_array(labels[0], resolved[0], 5, 6) == expected_m0_resolved


def test_voxel_26_connectivity(spark):
    """3D variant (contrib/cc3d.ipynb cell 8, connectivity=26): pure
    space-diagonal chains connect, which 6-connectivity would not."""
    from ccl_spark.grids import voxel_components

    cells = spark.createDataFrame(
        [
            (0, 0, 0), (1, 1, 1), (2, 2, 2),   # (1,1,1)-space-diagonal chain
            (0, 0, 3), (0, 0, 4),              # in-slice pair, clear of the chain
            (2, 0, 4),                          # isolated voxel
        ],
        "slice_id int, row int, col int",
    )
    got = {
        (r.slice_id, r.row, r.col): r.component
        for r in voxel_components(cells, 5, 5).collect()
    }
    assert got == {
        (0, 0, 0): 0, (1, 1, 1): 0, (2, 2, 2): 0,
        (0, 0, 3): 3, (0, 0, 4): 3,
        (2, 0, 4): 54,
    }


def test_dust_filter_golden(spark):
    """Min-area filter exercised through the golden replay path
    (reference param minimum_pixel_area, ccl_marker_stack.py:852-930):
    dust is dropped and renumbered BEFORE temporal linking, so slice 1's
    region over the dead speck gets a fresh label instead of inheriting."""
    from ccl_spark.golden import dust_labels

    rows = {(r.slice_id, r.row, r.col): r.label for r in dust_labels(spark).collect()}
    expected = {
        (0, 1, 1): 3, (0, 2, 1): 3, (0, 3, 1): 3,
        (1, 1, 1): 3, (1, 2, 1): 3, (1, 3, 1): 3,
        (1, 1, 3): 2, (1, 2, 3): 2,
    }
    assert rows == expected


def test_segmented(spark):
    nseg, nstride = 5, 5
    nd = nseg * nstride
    slices = []
    for i in range(nd):
        cells = [(2, 2), (2, 4)]
        if i == nd - nstride - 1:
            cells += [(0, 2), (1, 2)]
        if i == nd - nstride:
            cells += [(0, 2)]
        if i in (2 * nstride, 2 * nstride + 1):
            cells += [(0, 0)]
        slices.append(grid(4, 5, cells))

    labels, overlaps = collect_slice_labels(spark, slices, 4, 5)

    segments = []
    for s in range(nseg):
        seg = StackReplay()
        for j in range(nstride):
            sid = s * nstride + j
            seg.add_slice(set(labels[sid].values()), overlaps[sid] if j > 0 else [])
        segments.append(seg)
    interface_ov = [overlaps[s * nstride + nstride] for s in range(nseg - 1)]

    resolved = segmented_resolve(segments, interface_ov)

    expected = []
    for i in range(nd):
        e = [[0] * 5 for _ in range(4)]
        e[2][2], e[2][4] = 52, 53
        if i == nd - nstride - 1:
            e[0][2], e[1][2] = 52, 52
        if i == nd - nstride:
            e[0][2] = 52
        if i in (2 * nstride, 2 * nstride + 1):
            e[0][0] = 24
        expected.append(e)

    for s in range(nseg):
        for j in range(nstride):
            sid = s * nstride + j
            got = to_array(labels[sid], resolved[s][j], 4, 5)
            assert got == expected[sid], f"mismatch at global slice {sid}"
