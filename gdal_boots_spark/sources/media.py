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
