"""Gap-based sessionization (operators/sessionize.py): strict-gap
session counter + session stats, DuckDB-oracle exact, one-shuffle plan.
"""

import re

import duckdb
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from gdal_boots_spark.operators.sessionize import session_stats, sessionize

SF = "/root/testdata/sf0.01"


def test_sessionize_matches_duckdb_oracle(spark):
    got = entrymod.queries()["sessionize"](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.execute(entrymod.oracle_sql()["sessionize"]).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert len(entrymod.queries()) == 50


def test_sessionize_edge_rules(spark):
    """Hand-checkable: strictly-greater gap rule (an event at EXACTLY
    the gap stays in-session), same-timestamp tie-break by event_id,
    independent counters per user."""
    rows = [
        # user 1: 0s, exactly +30min (in session), +30min+1us (new)
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 00:30:00"),
        (3, 10, "2024-01-01 01:00:00.000001"),
        # user 2: two events at the SAME instant -> one session,
        # ordered by event_id
        (4, 20, "2024-01-01 00:00:00"),
        (5, 20, "2024-01-01 00:00:00"),
        # then a far later event -> second session
        (6, 20, "2024-01-02 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, s string").select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    out = {r["event_id"]: r["session_idx"] for r in sessionize(ev, "30 minutes").collect()}
    assert out[1] == 1 and out[2] == 1  # exactly the gap: same session
    assert out[3] == 2                  # one microsecond past: new
    assert out[4] == 1 and out[5] == 1
    assert out[6] == 2

    stats = {
        (r["user_id"], r["session_idx"]): r
    for r in session_stats(ev, "30 minutes").collect()}
    assert stats[(10, 1)]["n_events"] == 2
    assert stats[(10, 1)]["duration_us"] == 1_800_000_000
    assert stats[(10, 2)]["duration_us"] == 0
    assert stats[(20, 1)]["n_events"] == 2 and stats[(20, 1)]["duration_us"] == 0


def test_sessionize_plan_single_exchange(spark):
    """Scale contract: both window passes (lag flag + running counter)
    share ONE user_id-keyed Exchange — two Window operators, one
    hashpartitioning, no second shuffle."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        sessionize(ev, "30 minutes")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bWindow ", plan)) == 2
    # session_stats' groupBy(user, session_idx) is satisfied by the
    # window's HashPartitioning(user) (subset rule) — still 1 exchange
    splan = (
        session_stats(ev, "30 minutes")._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", splan)) == 1
