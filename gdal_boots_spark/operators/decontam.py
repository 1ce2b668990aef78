"""Benchmark decontamination — flag training documents that share any
word n-gram with an evaluation/benchmark set (the overlap filter the
GPT-3 / Llama data pipelines run before training; 13-gram and 8-gram
variants are published, the n is a parameter here).

Reference scope note: the reference engine (gdal-boots) has no text
ops; this belongs to the engine's first-class LLM-pipeline family
(SURVEY §8 extras) next to the dedup family (operators/dedup.py) —
the difference is the comparison target: dedup is doc-vs-corpus,
decontamination is doc-vs-REFERENCE-SET, and the reference set is
dimension-sized (benchmarks are millions of tokens, not terabytes).

Scale shape (10^12 docs vs ~10^6 benchmark grams): the benchmark side
collapses to a distinct-gram DIMENSION that broadcasts; the fact side
is one explode of per-doc distinct shingles into a BroadcastHashJoin —
ZERO fact-side shuffle to find hits.  Only matching (doc, gram) rows
survive into the groupBy(doc) count (benchmark hits are rare by
construction in a clean corpus, so the post-join volume is tiny), and
the final left join back onto the narrow (doc_id) projection shuffles
ids + one long only.  No collect, no cartesian, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_fns import shingles


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    key_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    hashed: bool = False,
) -> DataFrame:
    """-> (key, contaminated, n_hit_grams) per document.

    ``n_hit_grams`` counts the DISTINCT benchmark n-grams occurring in
    the document (canonical normalize_text tokenization, same as every
    dedup op); ``contaminated`` = n_hit_grams > 0.  Documents shorter
    than ``n`` words produce no shingles and are never contaminated.
    Integer count + boolean keep the DuckDB oracle hash-exact.

    ``hashed=True`` is the broadcast-size lever for big benchmarks:
    both sides join on the portable 60-bit gram hash (md5_long) instead
    of the gram string, shrinking the broadcast ~6x (8 bytes/gram vs
    typical 40-60-byte trigrams) and making the hashed relation's probe
    key fixed-width.  A false positive needs a 60-bit collision between
    a document gram and a benchmark gram (~m*n_grams/2^60 expected —
    negligible below 10^8 distinct grams); the exact-string default
    remains the oracle contract.
    """
    bcol = bench_text_col or text_col
    if hashed:
        from ..functions.text_fns import md5_long

        # explode to a column first, hash in the next select (a
        # generator cannot nest inside another expression)
        bench_grams = (
            benchmark.select(F.explode(shingles(F.col(bcol), n)).alias("_s"))
            .select(md5_long(F.col("_s")).alias("_g"))
            .distinct()
        )
        doc_grams = docs.select(
            F.col(key_col),
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("_s"),
        ).select(key_col, md5_long(F.col("_s")).alias("_g"))
    else:
        bench_grams = (
            benchmark.select(F.explode(shingles(F.col(bcol), n)).alias("_g")).distinct()
        )
        doc_grams = docs.select(
            F.col(key_col), F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("_g")
        )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(key_col)
        .agg(F.count("*").alias("_c"))
    )
    return docs.select(key_col).join(hits, key_col, "left").select(
        key_col,
        (F.coalesce(F.col("_c"), F.lit(0)) > 0).alias("contaminated"),
        F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("n_hit_grams"),
    )


def decontaminate_oracle_sql(n: int = 3, bench_pred: str = "doc_id % 37 = 0") -> str:
    """Exact DuckDB equivalent over the documents table, with the
    benchmark set selected by ``bench_pred`` (the board query uses a
    deterministic doc_id slice as its stand-in benchmark)."""
    return f"""
        WITH d AS (
          SELECT doc_id,
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
          FROM documents
        ),
        w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM d),
        dg AS (
          SELECT DISTINCT doc_id,
                 list_aggregate(ws[CAST(i AS BIGINT) : CAST(i AS BIGINT) + {n} - 1],
                                'string_agg', ' ') AS g
          FROM w, UNNEST(range(1, len(ws) - {n} + 2)) AS t(i)
          WHERE len(ws) >= {n}
        ),
        bench AS (SELECT DISTINCT g FROM dg WHERE {bench_pred}),
        hits AS (
          SELECT dg.doc_id, COUNT(*) AS c
          FROM dg JOIN bench USING (g)
          GROUP BY dg.doc_id
        )
        SELECT d.doc_id,
               COALESCE(hits.c, 0) > 0 AS contaminated,
               CAST(COALESCE(hits.c, 0) AS BIGINT) AS n_hit_grams
        FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
    """
