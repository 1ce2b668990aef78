"""As-of join — the brief's time-series custom operator ("as-of join,
range join, hypertable rollup" — range join is operators/bbox_join,
the rollup is operators/rollup; this completes the trio).

``asof_join(left, right, ...)`` matches every left row to the MOST
RECENT right row of the same key with ``r.ts <= l.ts`` (backward
direction — pandas.merge_asof / QuestDB/DuckDB ASOF JOIN semantics),
ties on equal right timestamps broken by the highest right id (a total,
engine-portable order).

Physical shape (the union-tag trick — the plan you want at 100 TB):

    left(side=1) ∪ right(side=0)
      -> ONE shuffle on the key
      -> window ordered by (ts, side, id):
           last(right payload, ignorenulls) carry-forward
      -> filter side=1

No range-condition join (which Spark would execute as a broadcast
nested loop or an exploded inequality join), no per-row Python, no
state: cost is one exchange + one sort per partition — the same as a
groupBy.  A right row at exactly l.ts sorts FIRST (side 0 < 1), so the
match is backward-INCLUSIVE, deterministically on both engines.

``tolerance`` (seconds) optionally nulls out matches older than
l.ts - tolerance, matching pandas.merge_asof(tolerance=...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    payload: tuple[str, ...] = ("event_id", "value"),
    tolerance: float | None = None,
) -> DataFrame:
    """left cols + ``r_<payload>`` columns (+ ``r_ts``) of the as-of
    match; unmatched left rows keep nulls (left-outer semantics)."""
    lcols = left.columns
    l2 = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        F.col(id_col).alias("_oid"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}") for c in payload],
    )
    r2 = right.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        F.col(id_col).alias("_oid"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_rp_{c}") for c in payload],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"r_{c}") for c in payload]
    r_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w).alias("r_ts")
    m = u.select("_side", "_ts", "_l", *carried, r_ts).where(F.col("_side") == 1)
    if tolerance is not None:
        keep = F.col("r_ts").isNotNull() & (
            F.col("_ts").cast("double") - F.col("r_ts").cast("double") <= tolerance
        )
        m = m.select(
            "_side", "_ts", "_l",
            *[F.when(keep, F.col(f"r_{c}")).alias(f"r_{c}") for c in payload],
            F.when(keep, F.col("r_ts")).alias("r_ts"),
        )
    return m.select(F.col("_l.*"), *[f"r_{c}" for c in payload], "r_ts")
