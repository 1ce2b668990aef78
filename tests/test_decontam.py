"""Benchmark decontamination (operators/decontam.py): n-gram overlap
against a reference set, DuckDB-oracle exact, broadcast-only plan.
"""

import duckdb
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from gdal_boots_spark.operators.decontam import decontaminate

SF = "/root/testdata/sf0.01"


def test_decontaminate_matches_duckdb_oracle(spark):
    """The board query (stand-in benchmark = doc_id % 37 slice) at the
    driver's gate scale, value-exact."""
    got = entrymod.queries()["decontaminate"](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(entrymod.oracle_sql()["decontaminate"]).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    # the benchmark slice itself is contaminated by construction
    # (each benchmark doc shares its own trigrams), given >= 3 words
    g = got.set_index("doc_id")
    bench_long = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .where((F.col("doc_id") % 37 == 0))
        .select("doc_id", F.size(F.split(F.trim("text"), " ")).alias("nw"))
        .collect()
        if r["nw"] >= 3
    ]
    assert all(bool(g.loc[d, "contaminated"]) for d in bench_long)
    assert len(entrymod.queries()) == 50


def test_decontaminate_edge_docs(spark):
    """Hand-checkable fixtures: exact trigram sharing flags, shorter
    overlap (bigram-only) does not, short/empty docs never flag."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 'quick brown fox'
            (2, "a quick brown dog runs"),      # bigram overlap only
            (3, "totally different words here"),
            (4, "ox"),                          # < n words
            (5, ""),                            # empty
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "very quick brown fox indeed")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit_grams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hit_grams"] == 0
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"]
    assert not out[5]["contaminated"]


def test_decontaminate_plan_broadcasts(spark):
    """Scale contract: the benchmark gram dimension broadcasts; the
    fact side reaches the hit join with ZERO shuffle (the only
    Exchanges are on the distinct-gram dimension and the tiny
    post-join doc aggregate)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no exchange may sit between the fact scan's Generate and the
    # broadcast hit join: the fact branch is Scan -> Filter -> Generate
    # -> BroadcastHashJoin with no hashpartitioning of _g on that path
    fact_branch = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning(_g" not in fact_branch


def test_decontaminate_hashed_matches_exact(spark):
    """hashed=True (60-bit gram-hash broadcast, the big-benchmark
    scale lever) returns the identical result on real data — a
    difference would need a 60-bit hash collision."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    a = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    b = sorted(map(tuple, decontaminate(docs, bench, n=3, hashed=True).collect()))
    assert a == b and len(a) > 0
