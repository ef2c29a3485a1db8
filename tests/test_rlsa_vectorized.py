"""Differential pin: the vectorized adaptive_rlsa (r6) against the
reference-shaped sequential walk it replaced, over adversarial synthetic
component maps (obstacle -1 labels, touching runs, tall/short mixes)."""

import numpy as np

from img2table_spark.kernels.rlsa import adaptive_rlsa


def _sequential(cc, cc_stats, a, th, c):
    rlsa_img = (cc > 0).astype(np.uint8)
    H, W = cc.shape
    stats = [tuple(int(v) for v in row[:4]) for row in cc_stats]
    for row in range(H):
        cols = np.nonzero(cc[row])[0]
        if len(cols) == 0:
            continue
        row_labels = cc[row, cols]
        prev_pos, prev_label = -1, -1
        for col, label in zip(cols.tolist(), row_labels.tolist()):
            if prev_label == -1 or label == -1:
                prev_pos, prev_label = col, label
                continue
            if label == prev_label:
                rlsa_img[row, prev_pos:col] = 1
            else:
                x1_cc, y1_cc, width_cc, height_cc = stats[label]
                x1_p, y1_p, width_p, height_p = stats[prev_label]
                length = col - prev_pos - 1
                height_ratio = max(height_cc, height_p) / max(min(height_cc, height_p), 1)
                h_overlap = min(y1_cc + height_cc, y1_p + height_p) - max(y1_cc, y1_p)
                window = cc[max(0, row - 2) : min(row + 3, H), prev_pos + 1 : col]
                no_other = not (
                    (window != -1) & (window != 0) & (window != label) & (window != prev_label)
                ).any()
                if (
                    length <= a * min(height_cc, height_p)
                    and height_ratio <= th
                    and h_overlap >= c * min(height_cc, height_p)
                    and no_other
                ):
                    rlsa_img[row, prev_pos:col] = 1
            prev_pos, prev_label = col, label
    return rlsa_img


def _synthetic_cc(rng, H=60, W=120, n_comp=14, obstacles=True):
    cc = np.zeros((H, W), dtype=np.int32)
    stats = np.zeros((n_comp + 1, 5), dtype=np.int64)
    for lab in range(1, n_comp + 1):
        h = rng.integers(1, 9)
        w = rng.integers(1, 15)
        y = rng.integers(0, H - h)
        x = rng.integers(0, W - w)
        cc[y : y + h, x : x + w] = lab
        stats[lab] = [x, y, w, h, h * w]
    # recompute tight stats after overwrites (later rects clobber earlier)
    for lab in range(1, n_comp + 1):
        ys, xs = np.nonzero(cc == lab)
        if len(ys) == 0:
            stats[lab] = [0, 0, 1, 1, 0]
            continue
        stats[lab] = [
            xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1, len(ys),
        ]
    if obstacles:
        for _ in range(3):
            y = rng.integers(0, H)
            x = rng.integers(0, W - 5)
            cc[y, x : x + 5] = -1
    return cc, stats


def test_adaptive_rlsa_matches_sequential():
    rng = np.random.default_rng(7)
    for trial in range(40):
        cc, stats = _synthetic_cc(rng, obstacles=(trial % 2 == 0))
        a, th, c = 3.5, 2.5, 0.5
        got = adaptive_rlsa(cc, stats, a, th, c)
        want = _sequential(cc, stats, a, th, c)
        assert np.array_equal(got, want), trial


def _sequential_obstacles(img, min_width):
    mask = np.zeros(img.shape, dtype=bool)
    mw = int(np.ceil(min_width))
    H, W = img.shape
    if W - mw <= 0 or H == 0:
        return mask
    sw = np.lib.stride_tricks.sliding_window_view(img, mw, axis=1)
    win_any = (sw.max(axis=2) > 0)
    for col in range(W - mw):
        rows_on = np.nonzero(win_any[:, col])[0]
        prev = -1
        for row in rows_on.tolist():
            if row - prev - 1 > H / 5:
                mask[prev + 1 : row, col : col + mw] = True
            prev = row
        row = H - 1
        if row + 1 - prev - 1 > H / 5:
            mask[prev + 1 : row + 1, col : col + mw] = True
    return mask


def test_find_obstacles_matches_sequential():
    from img2table_spark.kernels.rlsa import find_obstacles

    rng = np.random.default_rng(11)
    for trial in range(30):
        H = int(rng.integers(3, 40))
        W = int(rng.integers(3, 50))
        density = rng.choice([0.0, 0.02, 0.1, 0.5])
        img = (rng.random((H, W)) < density).astype(np.uint8) * 255
        mwf = float(rng.choice([1.0, 2.3, 4.0, 7.5]))
        got = find_obstacles(img, mwf)
        want = _sequential_obstacles(img, mwf)
        assert np.array_equal(got, want), (trial, H, W, mwf, density)


def test_adaptive_rlsa_empty_and_single():
    cc = np.zeros((5, 5), dtype=np.int32)
    stats = np.zeros((1, 5), dtype=np.int64)
    assert adaptive_rlsa(cc, stats, 3.5, 2.5, 0.5).sum() == 0
    cc[2, 2] = 1
    stats2 = np.array([[0, 0, 1, 1, 0], [2, 2, 1, 1, 1]], dtype=np.int64)
    out = adaptive_rlsa(cc, stats2, 3.5, 2.5, 0.5)
    assert out[2, 2] == 1 and out.sum() == 1
