#!/usr/bin/env python
"""Interleaved executor-process scale-out A/B (north rule: N vs 4N
executors).  Alternates spark-submit runs of scripts/scaling_multiproc
between local-cluster[2,4,4096] and local-cluster[8,4,4096] (real
executor JVMs, 4 cores each), takes best-of per config, and reports
the flagship speedup vs the same-run single-JVM md5 control ceiling.

CLAUDE.md protocol: first run of a config can be a co-tenant outlier —
interleave configs, take best-of; never trust one window.

Usage: python scripts/scaling_multiproc_ab.py [passes]
Requires dist/gdal_boots_spark.zip (scripts/package.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = ("local-cluster[2,4,4096]", "local-cluster[8,4,4096]")


def run_one(master: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_DOCS=os.path.join(REPO, ".bench_cache", "docs_sf0.1_x12000.parquet"),
    )
    p = subprocess.run(
        [
            "spark-submit", "--master", master,
            "--py-files", os.path.join(REPO, "dist", "gdal_boots_spark.zip"),
            os.path.join(REPO, "scripts", "scaling_multiproc.py"),
        ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": p.stderr[-800:], "master": master}


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, list[dict]] = {c: [] for c in CONFIGS}
    for i in range(passes):
        order = CONFIGS if i % 2 == 0 else tuple(reversed(CONFIGS))
        for master in order:
            res = run_one(master)
            res["load1"] = float(open("/proc/loadavg").read().split()[0])
            results[master].append(res)
            print(json.dumps(res), flush=True)
    best = {}
    for master, rows in results.items():
        ok = [r for r in rows if "flagship" in r]
        if not ok:
            print(json.dumps({"error": f"no successful runs for {master}"}))
            return
        best[master] = {
            "flagship": min(r["flagship"] for r in ok),
            "cpu_control": min(r["cpu_control"] for r in ok),
            "docs": ok[0]["docs"],
        }
    b2, b8 = best[CONFIGS[0]], best[CONFIGS[1]]
    speedup = round(b2["flagship"] / b8["flagship"], 3)
    ctl_speedup = round(b2["cpu_control"] / b8["cpu_control"], 3)
    print(json.dumps({
        "best": best,
        "flagship_speedup_2to8": speedup,
        "control_speedup_2to8": ctl_speedup,
        "raw_efficiency": round(speedup / 4.0, 3),
        "fraction_of_process_ceiling": round(speedup / ctl_speedup, 3) if ctl_speedup else None,
    }))


if __name__ == "__main__":
    main()
