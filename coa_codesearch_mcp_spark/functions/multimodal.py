"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Round-4: the image decode kernel is REAL for PNG / BMP / PPM —
implemented from the public specs with stdlib ``zlib`` + numpy
(functions/imagecodec.py), so ``image_features(fake=False)`` runs
end-to-end on actual image bytes with no codec library. Formats that
genuinely need entropy/DCT libraries (JPEG, WebP, video, audio)
remain environment-blocked behind ``NotImplementedError``; the
deterministic fake kernel (``fake=True``) still exists for tests that
want format-independent plumbing coverage.

Scale notes: media blobs dominate row size, so ``mapInPandas`` with a
small ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in
session.py) keeps Arrow batches bounded; metadata-only projections
never touch the blob column (columnar pruning does the work).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(data: bytes) -> "np.ndarray":
    """Decode image bytes -> HxWx3 uint8 RGB.

    PNG / BMP / PPM decode for real (pure numpy + stdlib zlib from
    the public specs — functions/imagecodec.py). JPEG/WebP/video
    would need codec libraries this environment does not provide and
    stay NotImplementedError (swap in PIL/turbojpeg in a deployment
    that has them)."""
    from .imagecodec import decode_bmp, decode_png, decode_ppm

    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise NotImplementedError(
        "only PNG/BMP/PPM are decodable without codec libraries "
        "(JPEG/WebP need libjpeg-class dependencies not present in "
        "this environment); use fake=True for the deterministic test "
        "kernel"
    )


def _fake_decode(data: bytes) -> np.ndarray:
    """Deterministic fake: pseudo-image seeded by the blob digest."""
    h = hashlib.sha256(data).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    w, hgt = 8 + h[4] % 8, 8 + h[5] % 8
    return rng.randint(0, 256, size=(hgt, w, 3), dtype=np.uint8)


def image_features(
    df: DataFrame,
    blob_col: str = "html",  # any binary column
    url_col: str = "url",
    feature_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode -> resize -> feature-extract over Arrow batches.

    The UDF signature, batching, and output schema are the production
    shape; only the decode kernel is swapped."""

    decode = _fake_decode if fake else decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                data = bytes(blob)
                img = decode(data)
                # downsample to a fixed grid and average channels —
                # a stand-in for a real embedding model
                gh = img[:: max(1, img.shape[0] // 4), :: max(1, img.shape[1] // 4)]
                feat = gh.mean(axis=2).flatten()[:feature_dim]
                feat = np.pad(feat, (0, max(0, feature_dim - len(feat))))
                # perceptual-hash-ish: sign bits of mean-centered grid
                centered = feat - feat.mean()
                phash = 0
                for i, v in enumerate(centered[:64]):
                    if v > 0:
                        phash |= 1 << i
                rows.append(
                    {
                        "url": url,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "n_bytes": len(data),
                        "phash": phash - (1 << 64) if phash >= (1 << 63) else phash,
                        "feature": [float(x) for x in feat],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])

    return df.select(url_col, blob_col).mapInPandas(extract, IMAGE_FEATURE_SCHEMA)
