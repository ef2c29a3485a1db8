"""S3 rotation parity vs reference tests
(tests/document/base/test_rotation.py)."""

import numpy as np
import pytest

from img2table_spark.kernels.png import decode_png
from img2table_spark.kernels.rotation import (
    angle_dixon_q_test,
    fix_rotation_image,
    get_connected_components,
    get_relevant_angles,
    rotate_img_with_border,
)


@pytest.fixture(scope="module")
def rot_img(ref_tests):
    with open(ref_tests / "document/base/test_data/test.png", "rb") as f:
        return decode_png(f.read())


def test_get_connected_components(ref_tests, rot_img):
    """Oracle: test_rotation.py:11-16 — 98 centroids."""
    from img2table_spark.kernels.imageops import rgb2gray

    cc, ref_height, thresh = get_connected_components(rgb2gray(rot_img))
    assert len(cc) == 98


def test_get_relevant_angles():
    centroids = np.array(
        [
            [35.8676, 5473.6768], [45.4648, 8734.32], [476.386, 98.437],
            [9834.4648, 468.47], [746.746, 7348.43], [846.462, 8474.48],
            [2983.846, 94483.46], [1093.46, 8473.46], [3676.77, 84783.64],
        ]
    )
    result = get_relevant_angles(centroids=centroids, ref_height=1000, n_max=5)
    assert len(result) == 5


def test_angle_dixon_q_test():
    result = angle_dixon_q_test(angles=[12.23, 12.78, 12.79, 12.82], confidence=0.9)
    assert round(result, 3) == 12.797


def _ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Uniform-window SSIM (8×8 blocks), enough for the ≥0.85 mean assert."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
        b = b.mean(axis=2)
    h = min(a.shape[0], b.shape[0]) // 8 * 8
    w = min(a.shape[1], b.shape[1]) // 8 * 8
    a = a[:h, :w].reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    b = b[:h, :w].reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    mu_a, mu_b = a.mean(1), b.mean(1)
    va, vb = a.var(1), b.var(1)
    cov = ((a - mu_a[:, None]) * (b - mu_b[:, None])).mean(1)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def test_fix_rotation_image(rot_img):
    """Oracle: test_rotation.py:40-66 — mean SSIM ≥ 0.85 after round-trip."""

    def crop_to_orig(img, orig):
        oh, ow = orig.shape[:2]
        cy, cx = img.shape[0] // 2, img.shape[1] // 2
        return img[cy - oh // 2 : cy + oh // 2 + 1, cx - ow // 2 : cx + ow // 2 + 1]

    sims = []
    for angle in range(-30, 30, 6):
        test_img = rotate_img_with_border(rot_img.copy(), angle=angle)
        fixed, _ = fix_rotation_image(test_img)
        result = crop_to_orig(fixed, rot_img)
        sims.append(_ssim(rot_img, result))
    assert float(np.mean(sims)) >= 0.85, sims
