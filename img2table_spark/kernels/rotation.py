"""S3 — skew estimation and rotation fix.

Parity target: reference src/img2table/document/base/rotation.py:14-256
(Otsu threshold → filtered CC centroids → pairwise angle voting → Dixon Q
test / projection-profile evaluation → warpAffine). cv2's warpAffine is
replaced by a vectorized inverse-mapping bilinear resampler.
"""

from __future__ import annotations

import math

import numpy as np

from img2table_spark.kernels.imageops import connected_components_with_stats, rgb2gray

DIXON_Q_CONF = {
    0.9: {3: 0.941, 4: 0.765, 5: 0.642, 6: 0.56, 7: 0.507, 8: 0.468, 9: 0.437, 10: 0.412},
    0.95: {3: 0.970, 4: 0.829, 5: 0.71, 6: 0.625, 7: 0.568, 8: 0.526, 9: 0.493, 10: 0.466},
    0.99: {3: 0.994, 4: 0.926, 5: 0.821, 6: 0.74, 7: 0.68, 8: 0.634, 9: 0.598, 10: 0.568},
}


def otsu_threshold_inv(gray: np.ndarray) -> np.ndarray:
    """cv2.threshold(..., THRESH_BINARY_INV + THRESH_OTSU)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = gray.size
    sum_all = (np.arange(256) * hist).sum()
    sum_b = 0.0
    w_b = 0.0
    best_t, best_var = 0, -1.0
    for t in range(256):
        w_b += hist[t]
        if w_b == 0:
            continue
        w_f = total - w_b
        if w_f == 0:
            break
        sum_b += t * hist[t]
        m_b = sum_b / w_b
        m_f = (sum_all - sum_b) / w_f
        var = w_b * w_f * (m_b - m_f) ** 2
        if var > best_var:
            best_var = var
            best_t = t
    return (255 * (gray <= best_t)).astype(np.uint8)


def get_connected_components(img: np.ndarray):
    """(reference: rotation.py:14-57) — img is grayscale."""
    thresh = otsu_threshold_inv(img)
    _, _, stats = connected_components_with_stats(thresh)
    stats = stats[stats[:, 4] > 5]
    if len(stats) == 0:
        return np.empty((0, 2)), 0.0, thresh

    median_width = float(np.median(stats[:, 2]))
    median_height = float(np.median(stats[:, 3]))
    upper = 4 * median_width * median_height
    lower = 0.25 * median_width * median_height
    areas = stats[:, 2] * stats[:, 3]
    ar = stats[:, 2] / stats[:, 3]
    mask = (lower < areas) & (areas < upper) & (0.5 < ar) & (ar < 2)
    s = stats[mask]
    centroids = np.column_stack([s[:, 0] + s[:, 2] / 2, s[:, 1] + s[:, 3] / 2])
    return centroids, median_height, thresh


def compute_angles(centroids: np.ndarray, ref_height: float) -> list[float]:
    """(reference: rotation.py:60-83)"""
    angles = []
    n = len(centroids)
    for i in range(n):
        xi, yi = centroids[i]
        for j in range(i + 1, n):
            xj, yj = centroids[j]
            if xi == xj:
                continue
            if not -10 * ref_height <= yi - yj <= 10 * ref_height:
                continue
            slope = round((yi - yj) / (xi - xj), 3)
            angle = math.atan(slope) * 180 / math.pi
            if not -45 <= angle <= 45:
                angle = -min(angle + 90, 90 - angle) * float(np.sign(angle))
            angles.append(angle)
    return angles


def get_relevant_angles(centroids: np.ndarray, ref_height: float, n_max: int = 5) -> list[float]:
    """(reference: rotation.py:86-114)"""
    if len(centroids) == 0:
        return [0]
    angles = compute_angles(centroids, ref_height)
    counts: dict[float, int] = {}
    for a in angles:
        counts[a] = counts.get(a, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], abs(kv[0])))[:n_max]
    if ranked:
        if ranked[0][0] == 0:
            return [0]
        max_len = max(c for _, c in ranked)
        return sorted({a for a, c in ranked if c >= 0.25 * max_len})
    return [0]


def angle_dixon_q_test(angles: list[float], confidence: float = 0.9) -> float:
    """(reference: rotation.py:117-144)"""
    q_crit = DIXON_Q_CONF[confidence]
    while len(angles) >= 3:
        rng = angles[-1] - angles[0]
        diffs = [abs(nxt - prev) for prev, nxt in zip(angles, angles[1:])]
        idx_outlier = 0 if int(np.argmax(diffs)) == 0 else len(angles) - 1
        gap = max(diffs)
        if rng and gap / rng > q_crit.get(len(angles), 1.0):
            angles.pop(idx_outlier)
        else:
            break
    return float(np.mean(angles))


def _rotation_matrix(center: tuple[float, float], angle: float) -> np.ndarray:
    a = math.cos(math.radians(angle))
    b = math.sin(math.radians(angle))
    cx, cy = center
    return np.array(
        [[a, b, (1 - a) * cx - b * cy], [-b, a, b * cx + (1 - a) * cy]], dtype=np.float64
    )


def _warp_affine(img: np.ndarray, m: np.ndarray, out_w: int, out_h: int, border_value=0) -> np.ndarray:
    """Inverse-mapping bilinear warp (cv2.warpAffine INTER_LINEAR,
    BORDER_CONSTANT)."""
    # invert [[a, b, tx], [c, d, ty]]
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)

    ys, xs = np.mgrid[0:out_h, 0:out_w]
    sx = ia * xs + ib * ys + itx
    sy = ic * xs + id_ * ys + ity

    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0

    H, W = img.shape[:2]
    valid = (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)

    def sample(yy, xx):
        inside = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        yyc = np.clip(yy, 0, H - 1)
        xxc = np.clip(xx, 0, W - 1)
        if img.ndim == 3:
            px = img[yyc, xxc].astype(np.float64)
            px[~inside] = border_value if np.isscalar(border_value) else np.asarray(border_value)
        else:
            px = img[yyc, xxc].astype(np.float64)
            px = np.where(inside, px, border_value if np.isscalar(border_value) else border_value[0])
        return px

    p00 = sample(y0, x0)
    p01 = sample(y0, x0 + 1)
    p10 = sample(y0 + 1, x0)
    p11 = sample(y0 + 1, x0 + 1)

    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
        valid_b = valid[..., None]
    else:
        valid_b = valid
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    bv = border_value if np.isscalar(border_value) else np.asarray(border_value, dtype=np.float64)
    out = np.where(valid_b, out, bv)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def rotate_img(img: np.ndarray, angle: float) -> np.ndarray:
    """(reference: rotation.py:147-156)"""
    h, w = img.shape[:2]
    m = _rotation_matrix((w / 2, h / 2), angle)
    return _warp_affine(img, m, w, h, border_value=0)


def evaluate_angle(img: np.ndarray, angle: float) -> int:
    rotated = rotate_img(img, angle)
    proj = rotated.sum(axis=1).astype(np.int64)
    return int(((proj[1:] - proj[:-1]) ** 2).sum())


def estimate_skew(angles: list[float], thresh: np.ndarray) -> float:
    """(reference: rotation.py:174-200)"""
    if len(angles) == 1:
        return angles.pop()
    if angles[-1] - angles[0] <= 0.015:
        return angle_dixon_q_test(angles)
    best_angle = None
    best_eval = 0
    for angle in sorted(angles, key=abs):
        ev = evaluate_angle(thresh, angle)
        if ev > best_eval:
            best_angle = angle
            best_eval = ev
    return best_angle or 0


def rotate_img_with_border(img: np.ndarray, angle: float, background_color=(255, 255, 255)) -> np.ndarray:
    """(reference: rotation.py:203-230)"""
    h, w = img.shape[:2]
    m = _rotation_matrix((w // 2, h // 2), angle)
    bound_w = int(h * abs(m[0, 1]) + w * abs(m[0, 0]))
    bound_h = int(h * abs(m[0, 0]) + w * abs(m[0, 1]))
    m[0, 2] += bound_w / 2 - w // 2
    m[1, 2] += bound_h / 2 - h // 2
    bv = background_color if img.ndim == 3 else background_color[0]
    return _warp_affine(img, m, bound_w, bound_h, border_value=bv)


def fix_rotation_image(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """(reference: rotation.py:233-256)"""
    gray = rgb2gray(img)
    centroids, ref_height, thresh = get_connected_components(gray)
    if len(centroids) < 2:
        return img, False
    angles = get_relevant_angles(centroids, ref_height)
    skew_angle = estimate_skew(angles, thresh)
    if abs(skew_angle) >= 0.25:
        return rotate_img_with_border(img, skew_angle), True
    return img, False
