"""Time the DuckDB oracle suite at a given SF — the apples-to-apples
single-node comparison point for bench.py (the judge's
bench-vs-baseline ratio). Mirrors bench.py's protocol: warm pass, then
best-of-N per query, one JSON line on stdout (compact) plus the full
per-query dict to ORACLE_BENCH.local.json.

Usage: python tools/oracle_bench.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 1)
    from skripsi_mapreduce_spark.io import TABLES
    from skripsi_mapreduce_spark.plans import ORACLE

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    for name in sorted(ORACLE):  # warm: plans + file cache
        con.execute(ORACLE[name]).fetchall()

    timings: dict[str, float] = {}
    for name in sorted(ORACLE):
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            con.execute(ORACLE[name]).fetchall()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    full = {"metric": "oracle_suite_total_wall", "value": total, "unit": "sec",
            "queries": timings, "sf": sf_dir}
    local = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "ORACLE_BENCH.local.json")
    with open(local, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({"metric": "oracle_suite_total_wall", "value": total,
                      "unit": "sec", "queries": slowest,
                      "n_queries": len(timings), "sf": sf_dir}))


if __name__ == "__main__":
    main()
