"""Time a single registry entry bench-style: full sf0.001 warm pass of
the SAME entry plus a generic JVM warm-up, then best-of-N at the target
SF. Usage: python tools/time_entry.py kmeans_documents [n_runs]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    n_runs = int(next((a for a in sys.argv[1:] if a.isdigit()), "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm against the smallest sibling SF of the timed dir (falls back
    # to the timed dir itself) so a machine without /root/testdata still
    # runs — round-8 ADVICE: the hardcoded warm dir crashed elsewhere
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from skripsi_mapreduce_spark.plans import QUERIES
    from skripsi_mapreduce_spark.session import get_spark

    spark = get_spark(
        app_name="time_entry", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        for _ in range(2):
            QUERIES[name](spark, warm_dir).count()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: best={min(runs):.3f}s runs="
            + ",".join(f"{r:.2f}" for r in runs)
        )
    spark.stop()


if __name__ == "__main__":
    main()
