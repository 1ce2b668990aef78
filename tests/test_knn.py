"""M5: grid-pruned kNN == brute-force oracle."""

import numpy as np

from gdal_boots_spark.operators.knn import knn_join


def _brute_knn(qx, qy, bx, by, bids, k):
    out = {}
    for i, (x, y) in enumerate(zip(qx, qy)):
        d = np.sqrt((bx - x) ** 2 + (by - y) ** 2)
        order = np.lexsort((bids, d))[:k]
        out[i] = [(int(bids[j]), float(d[j])) for j in order]
    return out


def test_knn_matches_bruteforce(spark):
    rng = np.random.default_rng(21)
    bx = rng.uniform(26, 29, 800)
    by = rng.uniform(53, 55, 800)
    qx = rng.uniform(25.8, 29.2, 60)  # some queries outside the base hull
    qy = rng.uniform(52.8, 55.2, 60)
    base = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(bx, by))], "bid long, x double, y double"
    )
    query = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(qx, qy))], "qid long, x double, y double"
    )
    got = knn_join(query, base, k=5, q_id="qid", b_id="bid")
    rows = got.collect()
    exp = _brute_knn(qx, qy, bx, by, np.arange(800), 5)
    got_by_q = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got_by_q.setdefault(r["qid"], []).append((r["bid"], r["dist"]))
    assert set(got_by_q) == set(exp)
    for q in exp:
        assert [b for b, _ in got_by_q[q]] == [b for b, _ in exp[q]], q
        assert np.allclose([d for _, d in got_by_q[q]], [d for _, d in exp[q]])


def test_knn_k_larger_than_base(spark):
    base = spark.createDataFrame([(i, float(i), 0.0) for i in range(3)], "bid long, x double, y double")
    query = spark.createDataFrame([(0, 1.2, 0.0)], "qid long, x double, y double")
    rows = knn_join(query, base, k=10).collect()
    assert len(rows) == 3  # all of the base, never more
    assert sorted(r["bid"] for r in rows) == [0, 1, 2]


def test_radius_join_vs_oracle(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE, compare_to_oracle

    df = entrymod.queries()["radius_join"](spark, SF_ORACLE)
    compare_to_oracle(df, entrymod.oracle_sql()["radius_join"], SF_ORACLE, float_cols=("dist",), atol=0.0)


def test_radius_join_bruteforce_random(spark):
    """Exactness on random points at several radii (incl. radius larger
    than a cell and queries outside the base extent)."""
    import numpy as np

    from gdal_boots_spark.operators.knn import radius_join

    rng = np.random.default_rng(11)
    b = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform([26, 53], [29, 55], (300, 2)))]
    q = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform([25.5, 52.5], [29.5, 55.5], (60, 2)))]
    base = spark.createDataFrame(b, "bid long, x double, y double")
    query = spark.createDataFrame(q, "qid long, x double, y double")
    # sorted-LIST compare (not sets): a wrapped duplicate cell would
    # emit the same (qid, bid) pair twice and a set compare masks it.
    # radius 120 forces a coarse auto res (n <= 4) where the annulus
    # block is wider than the wrap modulus — the regression case.
    for radius in (0.02, 0.3, 1.5, 120.0):
        got = sorted((r["qid"], r["bid"]) for r in radius_join(query, base, radius).collect())
        exp = sorted(
            (qi, bi)
            for qi, qx, qy in q
            for bi, bx, by in b
            if np.sqrt((qx - bx) * (qx - bx) + (qy - by) * (qy - by)) <= radius
        )
        assert got == exp, radius
