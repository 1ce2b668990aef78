"""Intra-document repetition stats (operators/repetition.py):
Gopher-style repetition quality counts, DuckDB-oracle exact.
"""

import duckdb

from gdal_boots_spark.operators.repetition import repetition_oracle_sql, repetition_stats

SF = "/root/testdata/sf0.01"


def test_repetition_stats_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = repetition_stats(docs).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = con.execute(repetition_oracle_sql()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def test_repetition_stats_edge_docs(spark):
    """Hand-verifiable fixtures: empty text, single word, all-repeat,
    and a known dominant bigram."""
    rows = [
        ("a", ""),                        # 1 empty token, 0 bigrams
        ("b", "hello"),                   # 1 word, 0 bigrams
        ("c", "x x x x"),                 # 4 words, 1 distinct, 'x x' x3
        ("d", "the cat and the cat sat"),  # 'the cat' twice
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert (out["a"]["n_words"], out["a"]["n_distinct_words"], out["a"]["top_bigram_count"]) == (1, 1, 0)
    assert (out["b"]["n_words"], out["b"]["top_bigram_count"]) == (1, 0)
    assert (out["c"]["n_words"], out["c"]["n_distinct_words"], out["c"]["top_bigram_count"]) == (4, 1, 3)
    assert (out["d"]["n_words"], out["d"]["n_distinct_words"], out["d"]["top_bigram_count"]) == (6, 4, 2)


def test_repetition_stats_entry_surface(spark):
    """Registered on the entry surface with the exact-equality oracle
    contract; board unchanged at 50."""
    import duckdb as _duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.all_queries()["repetition_stats"](spark, SF).toPandas()
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    odf = con.execute(entrymod.all_oracle_sql()["repetition_stats"]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert len(entrymod.queries()) == 50


def test_top_ngrams_matches_duckdb_oracle(spark):
    """Global top-k frequent n-grams: exact vs the oracle at n=2 and
    n=3 (deterministic count-desc/ngram-asc tie-break), and the plan
    uses TakeOrderedAndProject — k rows to the driver, never a global
    sort of the distinct-ngram table."""
    from gdal_boots_spark.operators.repetition import top_ngrams, top_ngrams_oracle_sql

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    for n, k in [(2, 20), (3, 7)]:
        got = top_ngrams(docs, n, k).toPandas()
        want = con.execute(top_ngrams_oracle_sql(n, k)).df()
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b) and len(a) == k, (n, k)
    plan = top_ngrams(docs, 2, 20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Python" not in plan


def test_top_ngrams_entry_surface(spark):
    import duckdb as _duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.all_queries()["top_ngrams"](spark, SF).toPandas()
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    odf = con.execute(entrymod.all_oracle_sql()["top_ngrams"]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) == 25
    assert len(entrymod.queries()) == 50
