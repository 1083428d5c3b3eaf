#!/usr/bin/env python
"""Stage-time attribution for ALL bench queries in one session.

For each bench query: one warm run, then ``runs`` measured runs
(min wall kept), then the per-stage task-time table of the measured
runs — guide §1's empirical loop without a browser UI.

    python scripts/profile_bench.py [sf_dir] [runs] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])

    from bench import BENCH_QUERIES

    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    app_id = spark.sparkContext.applicationId
    spark.range(1000).selectExpr("sum(id)").collect()

    for bench_name, query_name in BENCH_QUERIES.items():
        if only and bench_name not in only and query_name not in only:
            continue
        fn = registry[query_name]
        spark.sparkContext.setJobDescription(f"warm:{bench_name}")
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0

        before_ids = {s["stageId"]
                      for s in _rest(spark, f"applications/{app_id}/stages")}
        spark.sparkContext.setJobDescription(f"measure:{bench_name}")
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        stages = _rest(spark, f"applications/{app_id}/stages")
        new = [s for s in stages if s["stageId"] not in before_ids
               and s["status"] == "COMPLETE"]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum((s.get("executorRunTime") or 0) for s in new) / 1e3
        print(f"\n### {bench_name}  warm={warm:.3f}s best_of_{runs}="
              f"{best:.3f}s  n_stages={len(new)} "
              f"task_runtime_total={total_run:.2f}s (over {runs} runs)")
        for s in new[:10]:
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            run_t = (s.get("executorRunTime") or 0) / 1e3
            sr = (s.get("shuffleReadBytes") or 0) / 2**20
            sw = (s.get("shuffleWriteBytes") or 0) / 2**20
            ib = (s.get("inputBytes") or 0) / 2**20
            nm = (s.get("name") or "")[:70]
            print(f"  st{s['stageId']:>4} t={s['numCompleteTasks']:>3} "
                  f"run={run_t:>6.2f}s cpu={cpu:>6.2f}s "
                  f"shR={sr:>7.2f}M shW={sw:>7.2f}M in={ib:>7.2f}M  {nm}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
