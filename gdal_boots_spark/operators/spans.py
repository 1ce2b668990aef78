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
    """One row per span, keeping the array position (= order).

    Emitted as server-side-parsed SQL strings (same logical plan as the
    Column-tree form): these helpers sit under nearly every span query,
    and the Column version cost ~180 py4j round trips per build on the
    cold-plan profile (r8; the r5 flagship lesson applied repo-wide).
    """
    return docs.selectExpr(
        "doc_id", "posexplode(spans) AS (span_pos, span)"
    ).selectExpr(
        "doc_id", "span_pos", "span.kind AS kind", "span.text AS text",
        "span.media_ref AS media_ref", "span.offset AS offset",
    )


def extract_geo_spans(docs: DataFrame) -> DataFrame:
    """doc_id + GeoJSON text of every kind='geo' span.

    Narrow (no shuffle): posexplode + filter, all codegen.
    """
    return docs.selectExpr(
        "doc_id", "posexplode(spans) AS (span_pos, span)"
    ).where("span.kind = 'geo'").selectExpr("doc_id", "span_pos", "span.text AS text")


def extract_media_spans(docs: DataFrame) -> DataFrame:
    return docs.selectExpr(
        "doc_id", "posexplode(spans) AS (span_pos, span)"
    ).where("span.kind = 'media'").selectExpr("doc_id", "span_pos", "span.media_ref AS media_ref")
