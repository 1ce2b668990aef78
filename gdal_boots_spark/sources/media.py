"""Multimodal columns: media spans as opaque binary + typed metadata.

Interleaved documents carry ``kind='media'`` spans whose ``media_ref``
points at a tile row (FIXTURES.md §1 convention).  This module is the
Spark-side plumbing the brief requires — schema, partitioning, UDF
signature, batch shape — with the codec boundary explicit:

* raw NumPy tile blobs: decoded for real (frombuffer);
* encoded image/audio/video (PNG/JPEG/WAV...): behind ``_decode_image``
  which tries Pillow and otherwise raises NotImplementedError — the
  image libraries are not in this container (STUB, clearly marked).
  ``fake_features`` provides the deterministic stand-in used in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.spans import extract_media_spans

MEDIA_FEATURE_DIM = 8


def _decode_image(blob: bytes) -> np.ndarray:
    """STUB: decode an encoded image (PNG/JPEG).  Pillow/GDAL are not
    available in this environment; raw-blob rasters take the
    frombuffer path instead."""
    try:
        import io

        from PIL import Image  # noqa: WPS433  (optional dependency)

        return np.asarray(Image.open(io.BytesIO(blob)))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError("image codec not available in this container") from exc


def fake_features(arr: np.ndarray) -> np.ndarray:
    """Deterministic 8-dim feature vector from a pixel array: moments +
    quartiles — the stand-in for a real embedding model."""
    a = arr.astype(np.float64).ravel()
    if a.size == 0:
        return np.zeros(MEDIA_FEATURE_DIM)
    q1, med, q3 = np.percentile(a, [25, 50, 75])
    return np.array([a.mean(), a.std(), a.min(), a.max(), q1, med, q3, float(a.size)])


def media_features(docs: DataFrame, tiles: DataFrame) -> DataFrame:
    """Interleaved docs x tile store -> per-media-span features.

    -> (doc_id, span_pos, media_ref, width, height, n_bytes,
        feat array<double>[8])

    Join on media_ref == tile_key (hash join; tiles shuffle once), then
    one Arrow-batched decode+feature pass.  Blobs enter Python once per
    batch — never per row.
    """
    spans = extract_media_spans(docs)
    t = tiles.select(
        F.col("tile_key").alias("media_ref"), "width", "height", "dtype", "data"
    )
    joined = spans.join(t, "media_ref")

    def featurize(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, nbytes = [], []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(r["height"], r["width"])
                feats.append(fake_features(arr))
                nbytes.append(len(r["data"]))
            out = pdf[["doc_id", "span_pos", "media_ref", "width", "height"]].copy()
            out["n_bytes"] = nbytes
            out["feat"] = feats
            yield out

    return joined.mapInPandas(
        featurize,
        schema="doc_id string, span_pos int, media_ref string, width int, height int, n_bytes long, feat array<double>",
    )


def resize_array(arr: np.ndarray, out_h: int, out_w: int, kernel: str = "bilinear") -> np.ndarray:
    """REAL media resize on a decoded pixel array using the engine's own
    resampling kernels (geom.resample_kernels) — no image library
    needed once pixels are decoded (raw blobs and PNG decode for real;
    JPEG etc. stay behind the _decode_image stub)."""
    from ..geom.resample_kernels import CONV_KERNELS, bilinear, nearest, separable_conv

    scale_x = arr.shape[1] / out_w
    scale_y = arr.shape[0] / out_h
    if kernel == "nearest":
        return nearest(arr, 0, 0, scale_x, scale_y, out_h, out_w, 0, 0)
    if kernel == "bilinear":
        return bilinear(arr, 0, 0, scale_x, scale_y, out_h, out_w, 0, 0)
    if kernel in CONV_KERNELS:
        return separable_conv(arr, 0, 0, scale_x, scale_y, out_h, out_w, 0, 0, kernel)
    raise ValueError(f"unknown kernel {kernel}")


def media_resize(
    docs: DataFrame, tiles: DataFrame, out_w: int = 8, out_h: int = 8, kernel: str = "bilinear"
) -> DataFrame:
    """Per-media-span resize (the decode/resize/frame-sample stage of a
    multimodal training pipeline) -> (doc_id, span_pos, media_ref,
    width, height, dtype, data) with data = resized pixels.

    Same join shape as media_features; the resize itself is the
    engine's vectorized kernel, one Python pass per Arrow batch.
    """
    spans = extract_media_spans(docs)
    t = tiles.select(F.col("tile_key").alias("media_ref"), "width", "height", "dtype", "data")
    joined = spans.join(t, "media_ref")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(r["height"], r["width"])
                blobs.append(np.ascontiguousarray(resize_array(arr, out_h, out_w, kernel)).tobytes())
            out = pdf[["doc_id", "span_pos", "media_ref", "dtype"]].copy()
            out["width"] = out_w
            out["height"] = out_h
            out["data"] = blobs
            yield out[["doc_id", "span_pos", "media_ref", "width", "height", "dtype", "data"]]

    return joined.mapInPandas(
        run,
        schema="doc_id string, span_pos int, media_ref string, width int, height int, dtype string, data binary",
    )


def media_thumbnails_png(
    docs: DataFrame, tiles: DataFrame, out_w: int = 8, out_h: int = 8, kernel: str = "bilinear"
) -> DataFrame:
    """Resize + min-max normalize to uint8 + REAL PNG encode (the
    engine's pure-Python codec, sources.png) -> (doc_id, span_pos,
    media_ref, png binary).  A fully real thumbnail pipeline for raw
    and PNG media; only foreign codecs (JPEG/WAV) remain stubbed."""
    from .png import encode_png

    resized = media_resize(docs, tiles, out_w=out_w, out_h=out_h, kernel=kernel)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pngs = []
            for _, r in pdf.iterrows():
                arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(r["height"], r["width"])
                a = arr.astype(np.float64)
                lo, hi = a.min(), a.max()
                u8 = np.zeros(a.shape, np.uint8) if hi == lo else np.round((a - lo) / (hi - lo) * 255).astype(np.uint8)
                pngs.append(encode_png(u8))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "span_pos": pdf["span_pos"], "media_ref": pdf["media_ref"], "png": pngs}
            )

    return resized.mapInPandas(enc, schema="doc_id string, span_pos int, media_ref string, png binary")
