"""PII/URL scrubbing (functions/text_fns.scrub_*): Java-regex and
RE2-compatible rule set, byte-equal redaction across engines.
"""

import duckdb

from pyspark.sql import functions as F

from gdal_boots_spark.functions.text_fns import (
    SCRUB_COUNT_NAMES,
    scrub_counts,
    scrub_oracle_expr,
    scrub_text,
)

SF = "/root/testdata/sf0.01"


def _oracle_select() -> str:
    expr, counts = scrub_oracle_expr("text")
    cols = ", ".join(f"{c} AS {n}" for n, c in zip(SCRUB_COUNT_NAMES, counts))
    return f"SELECT doc_id, {expr} AS scrubbed, {cols} FROM documents"


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
    want = con.execute(_oracle_select() + " ORDER BY doc_id").df()
    cols = sorted(got.columns)
    assert got[cols].equals(want[cols]) and len(got) > 0


def test_scrub_rules(spark):
    """Hand-checked redactions across the widened r6 rule set: URLs
    first (they contain @, dots and digits), then emails, IPv4s,
    card-format groups, phone-format groups, standalone >=7-digit
    runs; unicode passes through untouched outside matches."""
    rows = [
        (1, "see https://a.b/c?d=e and mail x.y+z@site.org or call 12345678901"),
        (2, "short 123456 stays; θ and ü survive; a@b.c too-short tld stays"),
        (3, "host 10.20.30.40 paid 4111 1111 1111 1111 tel +1 (212) 555 0199"),
        (4, "dial 555-123-4567 now"),
        (5, "version 10.2.3 build 7 keeps"),
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
    assert out[3]["s"] == "host <IP> paid <CC> tel <PHONE>"
    assert (out[3]["n_ips"], out[3]["n_cards"], out[3]["n_phones"]) == (1, 1, 1)
    assert out[4]["s"] == "dial <PHONE> now"
    # dotted versions with single-digit components are NOT phones/IPs
    assert out[5]["s"] == rows[4][1]


def test_scrub_vertical_tab_cross_engine(spark):
    """ADVICE r5: Java's ASCII \\s includes \\x0B, RE2's does not — the
    URL rule now spells whitespace as one explicit shared class, so a
    vertical tab terminates the URL identically in both engines."""
    rows = [(1, "x https://a.b/c\x0btail y"), (2, "https://a.b/d\ttab")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = df.select(
        "doc_id", scrub_text(F.col("text")).alias("scrubbed"),
        *[v.alias(k) for k, v in scrub_counts(F.col("text")).items()],
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = con.execute(_oracle_select() + " ORDER BY doc_id").df()
    cols = sorted(got.columns)
    assert got[cols].equals(want[cols])
    assert got.loc[0, "scrubbed"] == "x <URL>\x0btail y"


def test_scrub_entry_surface(spark):
    """Promoted onto the driver board in r6 (ADVICE r5); board at 50."""
    import duckdb as _duckdb

    import __spark_entry__ as entrymod

    sdf = entrymod.all_queries()["scrub_text"](spark, SF).toPandas()
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    odf = con.execute(entrymod.all_oracle_sql()["scrub_text"]).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert "scrub_text" in entrymod.queries() and len(entrymod.queries()) == 50
