"""Intra-document repetition statistics — the Gopher-style repetition
quality filter (dup-word and most-frequent-bigram counts) a
training-data pipeline runs before dedup.

Reference scope note: the reference engine (gdal-boots) has no text
ops; this belongs to the engine's first-class LLM-pipeline family
(SURVEY §8 extras) next to quality_features/token_stats
(functions/text_fns.py).

Scale shape (10^12 docs): one narrow projection computes the
array-local counts (n_words, n_distinct_words) with ZERO shuffle;
only the top-bigram count pays shuffles — explode -> partial-agg
groupBy(doc, bigram) -> groupBy(doc) — both with map-side combine,
keys salted naturally by the bigram dimension, no driver collect.
The wide (doc, bigram) shuffle carries NO payload columns (r6); the
per-doc counts are recombined by a join that only shuffles the narrow
doc-table side, the bigram side reusing its groupBy partitioning.
Outputs are all BIGINT counts (no float ratios), so the DuckDB oracle
is hash-exact; callers derive ratios downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_fns import shingles, tokens


def repetition_stats(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (key, n_words, n_distinct_words, top_bigram_count) per doc.

    ``n_words`` / ``n_distinct_words`` follow the canonical
    normalize_text tokenization every dedup op keys on (lower, trim,
    collapse whitespace; empty text tokenizes to one empty token —
    consistency with fingerprint/token semantics beats prettiness).
    ``top_bigram_count`` is the occurrence count of the most frequent
    word bigram (0 when the doc has fewer than 2 words).  Ratios like
    dup_word_frac = 1 - n_distinct/n or top_bigram_char_frac are one
    cheap expression away and left to callers so the outputs stay
    integer-exact across engines."""
    t = tokens(F.col(text_col))
    # zero-shuffle per-doc word counts (narrow projection of the doc
    # table; VERDICT r5 item 8 — these used to ride the (doc, bigram)
    # shuffle as F.first payload, ~16 B/row of avoidable shuffle bytes)
    perdoc = docs.select(
        F.col(key_col),
        F.size(t).cast("long").alias("n_words"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_words"),
    )
    # the wide shuffle now carries (key, bigram) ALONE; the second
    # groupBy reduces to one row per doc, already hash-partitioned by
    # key, so the final recombine join only shuffles the narrow perdoc
    # side (key + two longs per doc)
    bg = docs.select(key_col, F.explode(shingles(F.col(text_col), 2)).alias("_b"))
    top = (
        bg.groupBy(key_col, "_b")
        .agg(F.count("*").alias("_c"))
        .groupBy(key_col)
        .agg(F.max("_c").alias("_tc"))
    )
    return perdoc.join(top, key_col, "left").select(
        key_col,
        "n_words",
        "n_distinct_words",
        F.coalesce(F.col("_tc"), F.lit(0)).cast("long").alias("top_bigram_count"),
    )


def repetition_oracle_sql(key_sql: str = "doc_id") -> str:
    """Exact DuckDB equivalent (integer counts, same tokenization)."""
    return f"""
        WITH d AS (
          SELECT {key_sql} AS k,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
          FROM documents
        ),
        w AS (SELECT k, string_split(norm, ' ') AS ws FROM d),
        stats AS (
          SELECT k,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
                 ws
          FROM w
        ),
        bg AS (
          SELECT k, ws[CAST(i AS BIGINT)] || ' ' || ws[CAST(i AS BIGINT) + 1] AS b
          FROM stats, UNNEST(range(1, len(ws))) AS t(i)
        ),
        bc AS (SELECT k, b, COUNT(*) AS c FROM bg GROUP BY k, b),
        top AS (SELECT k, MAX(c) AS tc FROM bc GROUP BY k)
        SELECT s.k AS doc_id,
               s.n_words,
               s.n_distinct_words,
               CAST(COALESCE(top.tc, 0) AS BIGINT) AS top_bigram_count
        FROM stats s LEFT JOIN top ON s.k = top.k
    """


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text") -> DataFrame:
    """-> (ngram, cnt): the corpus's k most frequent word n-grams,
    ties broken by ngram ascending (deterministic across engines).

    Scale shape: explode -> ONE partial-agg groupBy(ngram) shuffle ->
    TakeOrderedAndProject (per-partition top-k merged at the driver,
    k rows only — never a global sort of the distinct-ngram table)."""
    from ..functions.text_fns import shingles

    grams = shingles(F.col(text_col), n)
    counts = (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("ngram")).limit(k)


def top_ngrams_oracle_sql(n: int = 2, k: int = 20) -> str:
    """Exact DuckDB equivalent (same tokenization + tie-break)."""
    return f"""
        WITH d AS (
          SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
          FROM documents
        ),
        w AS (SELECT string_split(norm, ' ') AS ws FROM d),
        bg AS (
          SELECT list_aggregate(ws[CAST(i AS BIGINT) : CAST(i AS BIGINT) + {n} - 1], 'string_agg', ' ') AS g
          FROM w, UNNEST(range(1, len(ws) - {n} + 2)) AS t(i)
          WHERE len(ws) >= {n}
        )
        SELECT g AS ngram, COUNT(*) AS cnt
        FROM bg GROUP BY g
        ORDER BY cnt DESC, ngram LIMIT {k}
    """
