"""Property-based tests (hypothesis) — robustness beyond the reference's
golden fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from img2table_spark.kernels.common import merge_contours
from img2table_spark.kernels.html_io import parse_html_tables, table_to_html
from img2table_spark.kernels.imageops import (
    connected_components_with_stats,
    dilate_rect,
    erode_rect,
)
from img2table_spark.kernels.objects import Cell, Table
from img2table_spark.kernels.spans import create_all_rectangles


# ---------------------------------------------------------------- HTML I/O

@st.composite
def grids(draw):
    n_rows = draw(st.integers(1, 5))
    n_cols = draw(st.integers(1, 5))
    # random merge seeds: each cell may copy its left/top neighbour
    rows = []
    for r in range(n_rows):
        row = []
        for c in range(n_cols):
            choice = draw(st.integers(0, 3))
            if choice == 1 and c > 0:
                row.append(row[c - 1])          # merge left
            elif choice == 2 and r > 0 and (c == 0 or rows[r - 1][c] is not row[c - 1]):
                row.append(rows[r - 1][c])      # merge up (keeps rectangles)
            else:
                value = draw(st.one_of(st.none(), st.text(
                    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                                           max_codepoint=0x7F), max_size=6)))
                row.append(Cell(c * 10, r * 10, c * 10 + 10, r * 10 + 10,
                                content=value or None))
        rows.append(row)
    return Table(rows=rows)


@given(grids())
@settings(max_examples=60, deadline=None)
def test_html_round_trip_values(table):
    """parse(render(t)) preserves grid shape and every cell value."""
    html = table_to_html(table)
    parsed = parse_html_tables(html)
    # rendering can only produce a table when spans tile into rectangles;
    # the generator guarantees that, so parse must return exactly one table
    assert len(parsed) == 1
    p = parsed[0]
    assert (p.nb_rows, p.nb_columns) == (table.nb_rows, table.nb_columns)
    want = [[(c.content or None) for c in row] for row in table.rows]
    # whitespace collapse: values without leading/trailing spaces survive
    got = [[c.content for c in row] for row in p.rows]
    norm = [[(" ".join(v.split()) or None) if v else None for v in row] for row in want]
    assert got == norm


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=12, unique=True))
@settings(max_examples=100, deadline=None)
def test_create_all_rectangles_is_exact_cover(positions):
    """The rectangle decomposition covers every position exactly once."""
    spans = create_all_rectangles(list(positions), "v")
    covered = []
    for s in spans:
        for r in range(s.top_row, s.bottom_row + 1):
            for c in range(s.col_left, s.col_right + 1):
                covered.append((r, c))
    assert sorted(covered) == sorted(positions)


# ------------------------------------------------------------- morphology

@given(
    st.integers(5, 40), st.integers(5, 40),
    st.integers(1, 7), st.integers(1, 7),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_morphology_matches_naive(h, w, kx, ky, seed):
    rng = np.random.default_rng(seed)
    a = (255 * (rng.random((h, w)) < 0.4)).astype(np.uint8)

    def naive(img, kx_, ky_, maximum):
        ax_, ay_ = kx_ // 2, ky_ // 2
        pad_val = 0 if maximum else 255
        p = np.pad(img, ((ay_, ky_ - 1 - ay_ if ky_ > 1 else 0),
                         (ax_, kx_ - 1 - ax_ if kx_ > 1 else 0)),
                   constant_values=pad_val)
        out = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                win = p[y : y + (ky_ if ky_ > 1 else 1), x : x + (kx_ if kx_ > 1 else 1)]
                out[y, x] = win.max() if maximum else win.min()
        return out

    assert np.array_equal(dilate_rect(a, kx, ky), naive(a, kx, ky, True))
    assert np.array_equal(erode_rect(a, kx, ky), naive(a, kx, ky, False))


# ------------------------------------------------- connected components

@given(st.integers(3, 30), st.integers(3, 30), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_cc_labels_partition_foreground(h, w, seed):
    rng = np.random.default_rng(seed)
    a = (255 * (rng.random((h, w)) < 0.35)).astype(np.uint8)
    n, labels, stats = connected_components_with_stats(a)
    assert ((labels > 0) == (a > 0)).all()
    # areas sum to foreground count; bboxes contain their labels
    assert stats[1:, 4].sum() == int((a > 0).sum())
    for i in range(1, n):
        x, y, ww, hh, area = stats[i]
        ys, xs = np.nonzero(labels == i)
        assert xs.min() == x and ys.min() == y
        assert xs.max() == x + ww - 1 and ys.max() == y + hh - 1
        assert len(xs) == area
    # 8-connectivity: no two distinct labels are 8-adjacent
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sl_a = labels[max(0, dy) : h + min(0, dy), max(0, dx) : w + min(0, dx)]
            sl_b = labels[max(0, -dy) : h + min(0, -dy), max(0, -dx) : w + min(0, -dx)]
            both = (sl_a > 0) & (sl_b > 0)
            assert (sl_a[both] == sl_b[both]).all()


# ---------------------------------------------------------- merge sweep

@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50), st.integers(1, 20), st.integers(1, 20)),
                min_size=1, max_size=15))
@settings(max_examples=60, deadline=None)
def test_merge_contours_vertical_disjoint(boxes):
    cells = [Cell(x, y, x + w_, y + h_) for x, y, w_, h_ in boxes]
    merged = merge_contours(cells, vertically=True)
    # merged intervals are y-disjoint and cover all inputs
    merged_sorted = sorted(merged, key=lambda c: c.y1)
    for a, b in zip(merged_sorted, merged_sorted[1:]):
        assert a.y2 < b.y1
    for c in cells:
        assert any(m.y1 <= c.y1 and c.y2 <= m.y2 for m in merged)
