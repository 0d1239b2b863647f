"""Pure-numpy image codecs (functions/imagecodec.py): PNG/BMP/PPM
round-trips through REAL bytes, all PNG unfilter paths, palette and
gray color types, resize kernels, and the end-to-end Spark
image_features pipeline with fake=False over actual PNG blobs."""

import struct
import zlib

import numpy as np
import pytest

from coa_codesearch_mcp_spark.functions.imagecodec import (
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    resize_bilinear,
    resize_nearest,
)
from coa_codesearch_mcp_spark.functions.multimodal import decode_image


def _rand_img(h, w, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_filter0():
    img = _rand_img(13, 17)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_sub_and_up_filters():
    img = _rand_img(12, 9, seed=3)
    data = encode_png(img, filters=[0, 1, 2])
    assert np.array_equal(decode_png(data), img)


def test_png_average_and_paeth_unfilter():
    """Hand-build filtered scanlines with filters 3 (Average) and 4
    (Paeth) per the spec's reconstruction formulas, then assert the
    decoder reconstructs the intended pixels."""
    img = _rand_img(6, 5, seed=11)
    h, w, bpp = img.shape[0], img.shape[1], 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    rows = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = 3 if y % 2 == 0 else 4
        rows.append(f)
        for i in range(w * bpp):
            left = int(line[i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if f == 3:
                rows.append((int(line[i]) - (left + up) // 2) % 256)
            else:
                rows.append((int(line[i]) - paeth(left, up, ul)) % 256)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_gray_and_palette():
    gray = np.random.RandomState(5).randint(0, 256, (7, 4), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    assert out.shape == (7, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)

    # palette: hand-build a color-type-3 PNG
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    rows = bytearray()
    for y in range(2):
        rows.append(0)
        rows.extend(idx[y].tobytes())

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), palette[idx])


def test_bmp_roundtrip_with_row_padding():
    img = _rand_img(5, 3, seed=9)  # 3*3=9 bytes/row -> padded to 12
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_roundtrip_and_comment_header():
    img = _rand_img(4, 6, seed=13)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    data = b"P6\n# a comment line\n6 4\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


def test_decode_image_dispatch():
    img = _rand_img(4, 4)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xffjpeg")


def test_resize_kernels():
    img = _rand_img(8, 8)
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], img)
    down = resize_bilinear(img, 4, 4)
    assert down.shape == (4, 4, 3)
    # bilinear downsample of a constant image is the constant
    const = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(const, 3, 5), np.full((3, 5, 3), 77))


def test_image_features_real_kernel_end_to_end(spark):
    """fake=False over ACTUAL PNG bytes: the full mapInPandas pipeline
    decodes with the real kernel and reports true dimensions."""
    from coa_codesearch_mcp_spark.functions.multimodal import image_features

    rows = []
    for i in range(6):
        img = _rand_img(8 + i, 10 + i, seed=i)
        rows.append((f"img://{i}", bytearray(encode_png(img))))
    df = spark.createDataFrame(rows, "url string, html binary")
    feats = {r["url"]: r for r in image_features(df, fake=False).collect()}
    assert len(feats) == 6
    for i in range(6):
        r = feats[f"img://{i}"]
        assert (r["height"], r["width"]) == (8 + i, 10 + i)
        assert len(r["feature"]) == 16
