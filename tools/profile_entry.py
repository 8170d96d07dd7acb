"""Profile one registry entry via the Spark UI REST API: run it
bench-style (sf0.001 warm pass, then N timed runs at the target SF) with
the UI enabled, then dump the slowest STAGES (executor run time, shuffle
bytes, task count) and per-run job wall times so the expensive exchanges
/ python evals are attributable.

Usage: python tools/profile_entry.py <entry> [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from skripsi_mapreduce_spark.plans import QUERIES
    from skripsi_mapreduce_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile_{name}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = "/root/testdata/sf0.001"
    sc.setJobDescription(f"warm:{name}")
    for _ in range(2):
        QUERIES[name](spark, warm).count()

    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1/applications/{sc.applicationId}"
    mark_jobs = len(rest(base, "/jobs"))
    runs = []
    for i in range(n_runs):
        sc.setJobDescription(f"timed:{name}:run{i}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    print(f"{name}: runs=" + ",".join(f"{r:.3f}" for r in runs))

    jobs = [j for j in rest(base, "/jobs") if j["jobId"] >= 0]
    timed = [j for j in jobs if str(j.get("description", "")).startswith(f"timed:{name}")]
    print(f"\n== {len(timed)} timed jobs (of {len(jobs) - mark_jobs} new)")
    by_run: dict[str, list] = {}
    for j in timed:
        by_run.setdefault(j["description"], []).append(j)
    stage_ids = set()
    for d in sorted(by_run):
        js = by_run[d]
        tot = 0.0
        for j in js:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            tot += time.mktime(t1) - time.mktime(t0)
            stage_ids.update(j.get("stageIds", []))
        print(f"  {d}: {len(js)} jobs, ~{tot:.1f}s wall (1s-granularity)")

    stages = rest(base, "/stages?status=complete")
    mine = [s for s in stages if s["stageId"] in stage_ids]
    mine.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"\n== slowest stages (of {len(mine)} in timed jobs)")
    print(f"{'stage':>6} {'run_ms':>8} {'cpu_ms':>8} {'tasks':>5} {'in_MB':>7} "
          f"{'sh_r_MB':>8} {'sh_w_MB':>8}  name")
    for s in mine[:25]:
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0):>8} "
            f"{s.get('executorCpuTime', 0) // 1_000_000:>8} "
            f"{s.get('numCompleteTasks', 0):>5} "
            f"{s.get('inputBytes', 0) / 1e6:>7.1f} "
            f"{s.get('shuffleReadBytes', 0) / 1e6:>8.2f} "
            f"{s.get('shuffleWriteBytes', 0) / 1e6:>8.2f}  "
            f"{s.get('name', '')[:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
