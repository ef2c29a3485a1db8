"""Perceptual image dedup: dHash kernel invariance across codecs and the
banded-LSH near-dup pair operator end-to-end."""

import numpy as np

from img2table_spark.kernels.encoders import (
    encode_bmp24,
    encode_jpeg_progressive,
    encode_png,
)
from img2table_spark.kernels.exr import encode_exr
from img2table_spark.kernels.hdr import encode_hdr
from img2table_spark.kernels.phash import dhash64, hamming64
from img2table_spark.operators.multimodal import dhash_neardup_pairs, image_dhash


def _img(seed, h=64, w=96):
    rng = np.random.RandomState(seed)
    # smooth random field: block noise upsampled, so gradients are stable
    small = rng.randint(0, 256, size=(h // 8, w // 8, 3))
    return np.repeat(np.repeat(small, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_dhash_invariant_across_codecs():
    img = _img(1)
    base = dhash64(img)
    for enc in (encode_png, encode_bmp24, encode_hdr, encode_exr):
        from img2table_spark.kernels.image_doc import decode_image_bytes

        assert hamming64(dhash64(decode_image_bytes(enc(img))), base) == 0, enc


def test_dhash_robust_to_lossy_and_scale():
    img = _img(2)
    from img2table_spark.kernels.image_doc import decode_image_bytes

    lossy = decode_image_bytes(encode_jpeg_progressive(img, qval=2))
    assert hamming64(dhash64(lossy), dhash64(img)) <= 6
    # 2x downscale (area mean) keeps the fingerprint
    half = img.reshape(32, 2, 48, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert hamming64(dhash64(half), dhash64(img)) <= 6


def test_dhash_separates_unrelated_images():
    assert hamming64(dhash64(_img(3)), dhash64(_img(4))) > 10


def test_dhash_neardup_pairs_spark(spark):
    rows = []
    # group A: 0 = PNG, 1 = BMP twin, 2 = lossy JPEG twin
    a = _img(10)
    rows.append((0, bytearray(encode_png(a))))
    rows.append((1, bytearray(encode_bmp24(a))))
    rows.append((2, bytearray(encode_jpeg_progressive(a, qval=2))))
    # group B: 3 = HDR, 4 = EXR of a different image
    b = _img(11)
    rows.append((3, bytearray(encode_hdr(b))))
    rows.append((4, bytearray(encode_exr(b))))
    # unrelated
    rows.append((5, bytearray(encode_png(_img(12)))))
    # corrupt payload -> error row, excluded from pairs
    rows.append((6, bytearray(b"\x89PNG\r\n\x1a\nnot really a png")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    hashes = image_dhash(df, num_partitions=4)
    rows_h = {r.media_id: (r.dhash, r.error) for r in hashes.collect()}
    assert rows_h[6][0] is None and rows_h[6][1] is not None
    assert all(rows_h[i][0] is not None for i in range(6))

    pairs = {(r.id_a, r.id_b) for r in dhash_neardup_pairs(hashes, max_dist=6).collect()}
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= pairs
    assert not any(5 in p or 6 in p for p in pairs)
