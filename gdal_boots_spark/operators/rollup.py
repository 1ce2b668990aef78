"""Multi-resolution event-time rollup (hypertable continuous-aggregate
pattern): each coarser level re-aggregates the FINER level's partial
aggregates instead of rescanning raw events.

At 100 TB of events this is the difference between one O(events)
shuffle per resolution and one O(events) shuffle TOTAL: the minute
level pays it once, the hour level shuffles O(minute windows) rows,
the day level O(hour windows).  count/sum/min/max re-aggregate
losslessly (mean derives as sum/count at read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_rollup(
    events: DataFrame,
    levels: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """-> {level: (w_start, <key>, n, v, vmin, vmax)} per resolution.

    ``levels`` must be coarsening (each window a multiple of the
    previous) so window starts nest exactly and partial re-aggregation
    is lossless.
    """
    out: dict[str, DataFrame] = {}
    base = events.groupBy(F.window(ts_col, levels[0]).alias("w"), key_col).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("v"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    ).select(F.col("w.start").alias("w_start"), key_col, "n", "v", "vmin", "vmax")
    out[levels[0]] = base
    for lvl in levels[1:]:
        prev = out[list(out)[-1]]
        cur = prev.groupBy(F.window("w_start", lvl).alias("w"), key_col).agg(
            F.sum("n").alias("n"),
            F.sum("v").alias("v"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        ).select(F.col("w.start").alias("w_start"), key_col, "n", "v", "vmin", "vmax")
        out[lvl] = cur
    return out
