"""PII/URL scrubbing (functions/text_fns.scrub_*): Java-regex and
RE2-compatible rule set, byte-equal redaction across engines.
"""

import duckdb

from pyspark.sql import functions as F

from gdal_boots_spark.functions.text_fns import scrub_counts, scrub_oracle_expr, scrub_text

SF = "/root/testdata/sf0.01"


def test_scrub_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        docs.select(
            "doc_id",
            scrub_text(F.col("text")).alias("scrubbed"),
            *[v.alias(k) for k, v in scrub_counts(F.col("text")).items()],
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    expr, counts = scrub_oracle_expr("text")
    want = con.execute(
        f"SELECT doc_id, {expr} AS scrubbed, {counts[0]} AS n_urls, "
        f"{counts[1]} AS n_emails, {counts[2]} AS n_longnums FROM documents ORDER BY doc_id"
    ).df()
    cols = sorted(got.columns)
    assert got[cols].equals(want[cols]) and len(got) > 0


def test_scrub_rules(spark):
    """Hand-checked redactions: URLs first (they contain @ and
    digits), then emails, then standalone >=7-digit runs; unicode
    passes through untouched outside matches."""
    rows = [
        (1, "see https://a.b/c?d=e and mail x.y+z@site.org or call 12345678901"),
        (2, "short 123456 stays; θ and ü survive; a@b.c too-short tld stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", scrub_text(F.col("text")).alias("s"),
        *[v.alias(k) for k, v in scrub_counts(F.col("text")).items()]
    ).collect()}
    assert out[1]["s"] == "see <URL> and mail <EMAIL> or call <NUM>"
    assert (out[1]["n_urls"], out[1]["n_emails"], out[1]["n_longnums"]) == (1, 1, 1)
    assert out[2]["s"] == rows[1][1]
    assert (out[2]["n_urls"], out[2]["n_emails"], out[2]["n_longnums"]) == (0, 0, 0)


def test_scrub_entry_surface(spark):
    """Registered on the entry surface; board unchanged at 50."""
    import duckdb as _duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.extra_queries()["scrub_text"](spark, SF).toPandas()
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    odf = con.execute(entrymod.extra_oracle_sql()["scrub_text"]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert len(entrymod.queries()) == 50
