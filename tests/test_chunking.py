"""Token-window chunking (operators/chunking.py): overlapping-stride
segments, DuckDB-oracle exact, zero-shuffle plan.
"""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from gdal_boots_spark.operators.chunking import chunk_documents

SF = "/root/testdata/sf0.01"


def test_chunk_docs_matches_duckdb_oracle(spark):
    got = entrymod.queries()["chunk_docs"](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(entrymod.oracle_sql()["chunk_docs"]).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert len(entrymod.queries()) == 53


def test_chunk_edge_rules(spark):
    """Hand-checkable: short doc = one short chunk, exact-multiple
    length has no empty tail chunk, overlap stride windows, empty text
    = one empty chunk, invalid params raise."""
    docs = spark.createDataFrame(
        [
            (1, "a b c"),              # 3 tokens
            (2, "a b c d"),            # exactly 2 chunks at size 2
            (3, ""),                   # one empty token
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["chunk_idx"]): r for r in chunk_documents(docs, 2).collect()}
    assert out[(1, 0)]["chunk_text"] == "a b" and out[(1, 0)]["n_tokens"] == 2
    assert out[(1, 1)]["chunk_text"] == "c" and out[(1, 1)]["n_tokens"] == 1
    assert out[(2, 1)]["chunk_text"] == "c d"
    assert (2, 2) not in out  # no empty tail at exact multiples
    assert out[(3, 0)]["chunk_text"] == "" and out[(3, 0)]["n_tokens"] == 1

    # overlapping windows: size 3, stride 2 over 5 tokens
    ov = {
        r["chunk_idx"]: r["chunk_text"]
        for r in chunk_documents(
            spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string"), 3, 2
        ).collect()
    }
    assert ov == {0: "a b c", 1: "c d e", 2: "e"}

    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, 0)


def test_chunk_plan_zero_shuffle(spark):
    """Scale contract: chunking is one codegen Generate — NO Exchange
    anywhere in the plan."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_documents(docs, 64, 48)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert len(re.findall(r"Generate", plan)) == 1
