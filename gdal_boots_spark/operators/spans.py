"""Span operators over interleaved documents (input_hint schema).

The per-row invariant every document-transforming operator must keep:
**span-sequence equality** — (kind, text, media_ref, order) per doc.
``span_signature`` computes an order-sensitive digest used by tests and
by the resumable runner's row-count/lineage metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_signature(docs: DataFrame, out_col: str = "span_sig") -> DataFrame:
    """Order-sensitive per-doc digest of (kind, text, media_ref, order).

    ``to_json`` of the spans array preserves element order, so equal
    digests <=> equal span sequences.
    """
    return docs.withColumn(out_col, F.md5(F.to_json(F.col("spans"))))


def explode_spans(docs: DataFrame) -> DataFrame:
    """One row per span, keeping the array position (= order)."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "span")
    ).select(
        "doc_id",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_geo_spans(docs: DataFrame) -> DataFrame:
    """doc_id + GeoJSON text of every kind='geo' span.

    Narrow (no shuffle): posexplode + filter, all codegen.
    """
    return explode_spans(docs).where(F.col("kind") == "geo").select("doc_id", "span_pos", "text")


def extract_media_spans(docs: DataFrame) -> DataFrame:
    return explode_spans(docs).where(F.col("kind") == "media").select("doc_id", "span_pos", "media_ref")
