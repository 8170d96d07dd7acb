"""Benchmark harness: runs the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

The stdout line is kept COMPACT (the driver captures only a fixed-size
output tail, and round 3's 90-query line outgrew it — the official perf
record was lost to truncation): ``queries`` carries only the slowest
entries, and the full per-query timing dict is written to
``BENCH.local.json`` next to this script.

Each query is executed twice conceptually: the timed run materializes the
full result via ``df.foreach`` semantics (``count`` after a no-op cache-free
plan) so we measure engine execution, not driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time


def compact_line(timings: dict[str, float], sf_val: float | str) -> str:
    """The ONE stdout JSON line, shaped to survive the driver's
    fixed-size output-tail capture no matter how large the registry
    grows (round 3 lost the official perf record to truncation when the
    full 90-query map outgrew the tail): total + the 10 slowest queries
    only. tests/test_bench_contract.py pins the <2 KB budget against
    the real registry's worst-case names."""
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    return json.dumps(
        {
            "metric": "declared_queries_total_wall",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "queries": slowest,
            "n_queries": len(timings),
            "queries_full": "BENCH.local.json",
            "sf": sf_val,
        }
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from skripsi_mapreduce_spark.plans import QUERIES
    from skripsi_mapreduce_spark.session import get_spark

    # showConsoleProgress off: stage progress bars write carriage-return
    # noise into the captured output stream and crowd the fixed-size tail
    # the driver keeps.
    spark = get_spark(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    # Untimed warm-up: JIT/codegen/classloading otherwise lands entirely
    # on whichever query happens to run first (alphabetically the heavy
    # dedup family). A full pass at the smallest SF exercises every plan
    # shape (window, HOF, BNLJ, collect_set, regexp) so the timed pass
    # measures steady-state engine execution, JMH-style.
    from skripsi_mapreduce_spark.io import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in sorted(QUERIES):
            try:
                QUERIES[name](spark, warm_dir).count()
            except Exception as exc:  # warm-up must never fail the bench
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)

    # Per-query time = MIN over n_runs materializations (JMH-style
    # steady-state: the min is the least-noise estimator on a shared box;
    # observed run-to-run swings of up to 5x on UNTOUCHED sub-second
    # queries in this environment — ambient VM load sits at 3-4 — so
    # best-of-3 is the default; a third ~60s pass buys materially more
    # faithful numbers. Override with SPARK_GRAFT_BENCH_RUNS=1 for
    # one-shot.
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 1)
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Materialize every output row engine-side (no driver collect).
            n = df.count()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    full = {
        "metric": "declared_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # Full per-query record -> artifact file (driver-independent).
    local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.local.json")
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Stdout: ONE compact JSON line that fits the driver's tail capture —
    # total + sf + the 10 slowest queries only (the actionable offenders).
    print(compact_line(timings, sf_val))
    spark.stop()


if __name__ == "__main__":
    main()
