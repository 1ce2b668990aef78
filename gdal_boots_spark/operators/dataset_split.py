"""Deterministic dataset splitting / sampling for training pipelines.

A 100-TB training corpus needs reproducible, engine-portable held-out
splits and per-stratum downsampling: assignment must be a pure function
of (seed, key) — no RNG state, no shuffle, no driver coordination — so
any engine recomputes the identical split of the identical rows.

Mechanism: the first 8 hex chars of ``md5(seed || key)`` compared as a
STRING against hex cutoffs.  Lowercase fixed-width hex compares
lexicographically == numerically, and md5 is bit-identical across
Spark, DuckDB, Python et al., so the very same predicate is exact SQL
in any engine (the oracle tests assert this).  Everything is native
column expressions — whole-stage codegen, zero Python, zero shuffles;
at 10^12 rows the split is a free map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_cutoff(fraction: float) -> str:
    """fraction in [0,1] -> 8-char lowercase hex cutoff (floor)."""
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def _bucket(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, float], seed: str = "split"
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``fractions`` maps name -> fraction (must sum to <= 1; any
    remainder becomes NULL).  Assignment depends only on (seed, key):
    stable across runs, engines, partitionings and row order; the same
    key always lands in the same split (doc-level dedup-safe)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = _bucket(F.col(key_col), seed)
    # CASE WHEN chain in declaration order; when the fractions sum to 1
    # the LAST range's upper bound becomes inclusive-of-everything ('g'
    # sorts above any hex digit) so the 1-in-4B key whose md5 prefix is
    # exactly 'ffffffff' cannot fall out of the split
    acc = 0.0
    conds = []
    for name, frac in fractions.items():
        lo, acc = acc, acc + frac
        hi = "g" if acc >= 1.0 - 1e-9 else _hex_cutoff(acc)
        conds.append((name, _hex_cutoff(lo), hi))
    out = F.lit(None).cast("string")
    for name, lo, hi in reversed(conds):
        out = F.when((b >= F.lit(lo)) & (b < F.lit(hi)), F.lit(name)).otherwise(out)
    return df.withColumn("split", out)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashed key —
    the engine-portable replacement for ``df.sample`` (whose output
    depends on partitioning)."""
    # rate >= 1: keep everything — same 'g' sentinel as hash_split so
    # the 1-in-2^32 key whose md5 prefix is 'ffffffff' is not dropped
    cutoff = "g" if rate >= 1.0 - 1e-9 else _hex_cutoff(rate)
    return df.where(_bucket(F.col(key_col), seed) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict, seed: str = "strat"
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value
    -> keep fraction (strata absent from the map are dropped).  The
    rate table enters the plan as literals — no join, no shuffle."""
    b = _bucket(F.col(key_col), seed)
    keep = F.lit(False)
    for value, rate in rates.items():
        cutoff = "g" if rate >= 1.0 - 1e-9 else _hex_cutoff(rate)
        keep = keep | ((F.col(stratum_col) == F.lit(value)) & (b < F.lit(cutoff)))
    return df.where(keep)


def split_oracle_sql(key_sql: str, fractions: dict[str, float], seed: str = "split") -> str:
    """The EXACT SQL equivalent of hash_split's assignment for any
    engine with md5 (DuckDB oracle helper)."""
    acc = 0.0
    whens = []
    for name, frac in fractions.items():
        lo, acc = acc, acc + frac
        hi = "g" if acc >= 1.0 - 1e-9 else _hex_cutoff(acc)
        whens.append(
            f"WHEN substr(md5('{seed}' || {key_sql}), 1, 8) >= '{_hex_cutoff(lo)}' "
            f"AND substr(md5('{seed}' || {key_sql}), 1, 8) < '{hi}' THEN '{name}'"
        )
    return "CASE " + " ".join(whens) + " ELSE NULL END"
