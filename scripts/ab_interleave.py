#!/usr/bin/env python
"""Interleaved A/B of two code trees on the SAME queries (the repo's
A/B protocol: rep-by-rep interleave, alternate order per rep, fresh
process per measurement, same-run cpu_control per rep so co-tenant
steal is visible in the record, clearCache irrelevant here because
every rep is a fresh JVM).

Used for VERDICT r6 item 3: adjudicate the small-query normalized
drift (cell_assign / geo_extract / point_sampling) between the r5
snapshot (a42007e, worktree) and the current tree.

Usage:
    python scripts/ab_interleave.py A_DIR B_DIR q1,q2,... reps

Prints one JSON line per measurement and a final summary with the
per-query best and the per-rep (sec, cpu_control, load1) triples.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PROBE = r"""
import json, os, sys, time
repo = sys.argv[1]
names = sys.argv[2].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
from pyspark.sql import functions as F
import __spark_entry__ as entrymod
from gdal_boots_spark.session import get_spark  # each tree's OWN config
spark = get_spark("ab-probe", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = entrymod.queries()
# warm: JVM, python workers, parquet footers, each query's plan once
ctl = spark.range(40_000_000).select(F.md5(F.col("id").cast("string")).alias("h"))
ctl.where(F.col("h") > "f").count()
for n in names:
    qs[n](spark, sf).count()
out = {"repo": repo, "queries": {}, "ctl": [], "load1": []}
for rep in range(2):
    t0 = time.perf_counter(); ctl.where(F.col("h") > "f").count()
    out["ctl"].append(round(time.perf_counter() - t0, 4))
    out["load1"].append(round(float(open("/proc/loadavg").read().split()[0]), 2))
    for n in names:
        t0 = time.perf_counter(); qs[n](spark, sf).count()
        out["queries"].setdefault(n, []).append(round(time.perf_counter() - t0, 4))
print(json.dumps(out))
spark.stop()
"""


def main() -> None:
    a_dir, b_dir, qlist, reps = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    results: dict[str, list] = {a_dir: [], b_dir: []}
    for rep in range(reps):
        order = (a_dir, b_dir) if rep % 2 == 0 else (b_dir, a_dir)
        for repo in order:
            p = subprocess.run(
                [sys.executable, "-c", PROBE, repo, qlist],
                capture_output=True, text=True, env=dict(os.environ),
            )
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                res = {"error": p.stderr[-500:]}
            res["rep"] = rep
            results[repo].append(res)
            print(json.dumps(res), flush=True)
    summary = {}
    for repo, rows in results.items():
        agg: dict[str, dict] = {}
        for row in rows:
            for q, secs in row.get("queries", {}).items():
                a = agg.setdefault(q, {"best": 1e9, "reps": []})
                a["best"] = min(a["best"], min(secs))
                a["reps"].append({"secs": secs, "ctl": row["ctl"], "load1": row["load1"]})
        summary[repo] = agg
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
