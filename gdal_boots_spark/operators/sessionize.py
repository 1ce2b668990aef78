"""Gap-based sessionization over an event stream — the classic
"new session after N minutes of inactivity" rule (and the same
primitive that threads raw interaction logs into conversations for
training-data assembly).

Reference scope note: the reference engine (gdal-boots) has no event
ops; this belongs to the engine's first-class LLM-pipeline family
(SURVEY §8 extras) next to event_rollup (operators/rollup.py).

Scale shape (10^12 events): ONE shuffle keyed by user_id (uniformly
distributed, no hot key) feeds BOTH window passes — the lag and the
running session counter share the identical (partitionBy user_id,
orderBy ts, event_id) spec, so Spark plans a single Exchange + sort
with two Window operators on top.  No collect, no Python, no second
shuffle; session stats re-aggregate the already-partitioned rows.

All outputs are integers (microsecond epochs, counts, indices) so the
DuckDB oracle hashes exactly; gap comparison is STRICTLY-greater in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> events + (session_idx) : per-user session counter (1-based,
    in time order); a new session starts when the gap since the user's
    previous event EXCEEDS ``gap`` (strictly), or at the first event.

    Ordering ties break by ``id_col`` so the counter is deterministic
    under identical timestamps.  ``gap`` is '<n> <unit>' with unit in
    seconds/minutes/hours/days.
    """
    gap_us = _gap_micros(gap)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _micros(events, ts_col)
    new_sess = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > F.lit(gap_us)), 1
    ).otherwise(0)
    return events.withColumn(
        "session_idx", F.sum(new_sess).over(w).cast("long")
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (user, session_idx, n_events, start_us, end_us, duration_us)
    per session.  Reuses sessionize's partitioning: the groupBy keys
    are a superset of the window's partition key, so no third shuffle
    materializes beyond the window exchange."""
    s = sessionize(events, gap, user_col, ts_col, id_col)
    us = _micros(events, ts_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def _micros(events: DataFrame, ts_col: str):
    """Microsecond epoch of the event time.  Parquet event times are
    TIMESTAMP_NTZ (no zone), which unix_micros rejects; casting NTZ ->
    TIMESTAMP reinterprets the wall time in the session zone — a
    CONSTANT offset (engine sessions pin Etc/UTC, no DST), and the
    gap rule consumes differences only, so session boundaries are
    zone-invariant either way."""
    t = events.schema[ts_col].dataType.typeName()
    col = F.col(ts_col).cast("timestamp") if t == "timestamp_ntz" else F.col(ts_col)
    return F.unix_micros(col)


def _gap_micros(gap: str) -> int:
    n, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(n) * mult * 1_000_000


def session_stats_oracle_sql(gap_us: int = 1_800_000_000) -> str:
    """DuckDB oracle for the per-session aggregate in its session-
    WINDOW form — (user_id, start_us, end_us = last event + gap,
    n_events) — the drained shape of the streaming session window
    (streaming/doc_stream.stream_session_stats).  Same strict-gap rule
    and tie-break as sessionize_oracle_sql."""
    return f"""
        SELECT user_id,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) + {gap_us} AS BIGINT) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
          SELECT user_id, us,
                 SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sess
          FROM (
            SELECT event_id, user_id, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                        ) IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                        ) > {gap_us}
                   THEN 1 ELSE 0 END AS new_sess
            FROM events
          )
        )
        GROUP BY user_id, sess
    """


def sessionize_oracle_sql(gap_us: int = 1_800_000_000) -> str:
    """Exact DuckDB equivalent of the board query (same strict-gap
    rule, same (ts, event_id) tie-break, BIGINT outputs)."""
    return f"""
        SELECT event_id, user_id,
               CAST(SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                      ) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                      ) > {gap_us}
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
        )
    """
