"""KMV (K-minimum-values) distinct sketch — the brief's "novel sketch"
custom operator, chosen over HLL because a KMV built on a PORTABLE
deterministic hash is exactly reproducible: the driver oracle verifies
the sketch CONTENT bit-for-bit, not just an error bound.

Theory (Bar-Yossef et al. 2002 / the theta-sketch family): hash every
value uniformly into [0, 1); the k-th smallest hash of a set with D
distinct values concentrates at k/D, so ``(k-1) / h_(k)`` is an
(unbiased, ~1/sqrt(k) relative error) estimator of D.  Sketches MERGE
by unioning and re-truncating to the k smallest — the property that
lets partial sketches combine across partitions/days/shards without
re-reading data.

Engine hash: the portable 60-bit md5 (functions.text_fns.md5_long),
normalized by 2^60 — identical in DuckDB SQL, so the whole operator is
exact-oracle-checkable.

Physical shape at 100 TB: distinct() is the only wide op (map-side
partial dedup, sort-based, spill-safe — NO collect_set memory blowup on
hot groups); the per-group k smallest then come from a window over the
deduped narrow (group, hash) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_fns import md5_long

_KMV_SCALE = float(1 << 60)  # md5_long is 60-bit


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """-> (group, sketch array<long> (<= k smallest distinct hashes,
    ascending), n_kept, est_distinct double).

    ``est_distinct`` is exact (== n_kept) while the group holds fewer
    than k distinct values, else the KMV estimate (k-1)/h_(k)."""
    h = df.select(
        F.col(group_col).alias("grp"),
        md5_long(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    agg = topk.groupBy("grp").agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").alias("n_kept"),
        F.max("h").alias("_hmax"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1))) / (F.col("_hmax").cast("double") / F.lit(_KMV_SCALE))
    )
    return agg.select("grp", "sketch", "n_kept", est.alias("est_distinct"))


def kmv_merge(sketches: DataFrame, k: int = 32, group_col: str = "grp") -> DataFrame:
    """Merge per-shard sketches (the mergeability contract): union the
    hash lists, dedup, keep the k smallest — identical to sketching the
    unioned raw data (pytest-asserted)."""
    ex = sketches.select(group_col, F.explode("sketch").alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = ex.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    agg = topk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").alias("n_kept"),
        F.max("h").alias("_hmax"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1))) / (F.col("_hmax").cast("double") / F.lit(_KMV_SCALE))
    )
    return agg.select(group_col, "sketch", "n_kept", est.alias("est_distinct"))
