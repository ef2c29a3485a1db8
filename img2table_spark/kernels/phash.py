"""Perceptual image hashing (dHash) for multimodal near-dup detection.

dHash: grayscale → area-mean resize to 9×8 → horizontal gradient sign bits
→ 64-bit fingerprint. Robust to re-encoding (PNG↔BMP↔lossy JPEG), scaling
and small noise; Hamming distance ≈ perceptual distance. The banded-LSH
pair join over these hashes lives in operators/multimodal.py — the image
twin of the SimHash text path (queries.q09).
"""

from __future__ import annotations

import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114])


def _area_resize_gray(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """RGB uint8 → float gray → area-mean resize (exact box averages over
    a uniform split; deterministic, no interpolation kernels)."""
    g = img.astype(np.float64) @ _LUMA
    h, w = g.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        row = g[ys[i] : max(ys[i + 1], ys[i] + 1)]
        for j in range(out_w):
            out[i, j] = row[:, xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: sign of horizontal gradient on a 9×8 grid."""
    g = _area_resize_gray(img, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
