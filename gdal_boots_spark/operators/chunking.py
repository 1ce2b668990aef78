"""Token-window document chunking — split each document into
fixed-token-count segments with optional overlap (stride), the
segment-preparation step a pre-training pipeline runs between cleaning
and shard packing (packing.pack_shards consumes the chunk token
counts downstream).

Reference scope note: the reference engine (gdal-boots) has no text
ops; this belongs to the engine's first-class LLM-pipeline family
(SURVEY §8 extras).

Scale shape (10^12 docs): ZERO shuffles — one codegen Generate per
document (chunk starts are a sequence expression, chunk text a
slice+concat inside the same projection); output order is
(doc, chunk_idx) within the input partitioning, so downstream
groupBy(doc) reuses nothing and pays the one shuffle IT needs, not
this operator.  No Python, no explode-join, no driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_fns import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int | None = None,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (key, chunk_idx, chunk_text, n_tokens) per token window.

    Chunks start at token offsets 0, stride, 2*stride, ... while the
    offset is inside the document; the final chunk may be short
    (``n_tokens`` < ``chunk_tokens``).  ``stride`` defaults to
    ``chunk_tokens`` (non-overlapping); ``stride < chunk_tokens``
    yields overlapping context windows.  Tokenization is the canonical
    normalize_text split (empty text = one empty token = one chunk),
    chunk_idx is 0-based, and chunk_text re-joins with single spaces —
    all integer/string-exact across engines for the DuckDB oracle.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    t = tokens(F.col(text_col))
    n = F.size(t)
    # chunk count = floor((n-1)/stride) + 1 for n >= 1; null text
    # (size -1) must not reach sequence() — sequence(0, -1) is
    # DESCENDING, not empty
    idx = F.when(
        n >= 1, F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = docs.select(
        F.col(key_col), n.alias("_n"), t.alias("_t"), F.posexplode(idx).alias("chunk_idx", "_i")
    )
    start = F.col("_i") * stride + 1  # slice() is 1-based
    return chunks.select(
        key_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(F.col("_t"), start, chunk_tokens)).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - start + 1).cast("long").alias("n_tokens"),
    )


def chunk_oracle_sql(chunk_tokens: int = 64, stride: int = 48) -> str:
    """Exact DuckDB equivalent over the documents table (same
    tokenization, 0-based chunk_idx, 1-based token slicing)."""
    return f"""
        WITH d AS (
          SELECT doc_id,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
          FROM documents
        ),
        w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM d),
        idx AS (
          SELECT doc_id, ws, CAST(i AS BIGINT) AS i,
                 CAST(i AS BIGINT) * {stride} + 1 AS s
          FROM w, UNNEST(range(0, (len(ws) - 1) // {stride} + 1)) AS t(i)
          WHERE len(ws) >= 1
        )
        SELECT doc_id,
               i AS chunk_idx,
               array_to_string(ws[s : s + {chunk_tokens} - 1], ' ') AS chunk_text,
               CAST(least({chunk_tokens}, len(ws) - s + 1) AS BIGINT) AS n_tokens
        FROM idx
    """
