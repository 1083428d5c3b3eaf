#!/usr/bin/env python
"""Per-stage time attribution for one bench/registered query.

Runs the query once to warm codegen, then once instrumented, and prints
every stage of the measured run with task-time totals and shuffle
bytes — the guide §1 empirical loop (which stage, and is it compute,
shuffle read, or Python) without a browser UI.

    python scripts/profile_query.py <query_name> [sf_dir] [runs]
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
    qname = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[qname]

    # warm run (codegen, fixture materialization, page cache)
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    before_ids = {s["stageId"] for s in _rest(spark, f"applications/{app_id}/stages")}

    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)

    stages = _rest(spark, f"applications/{app_id}/stages")
    new = [s for s in stages if s["stageId"] not in before_ids
           and s["status"] == "COMPLETE"]
    new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"\nquery={qname}  warm_first={warm:.3f}s  best_of_{runs}={best:.3f}s")
    print(f"{'stage':>6} {'tasks':>5} {'runTime':>9} {'cpuTime':>9} "
          f"{'shufR MB':>9} {'shufW MB':>9} {'in MB':>8}  name")
    for s in new:
        cpu = (s.get("executorCpuTime") or 0) / 1e9  # ns -> s
        run_t = (s.get("executorRunTime") or 0) / 1e3
        sr = (s.get("shuffleReadBytes") or 0) / 2**20
        sw = (s.get("shuffleWriteBytes") or 0) / 2**20
        ib = (s.get("inputBytes") or 0) / 2**20
        nm = (s.get("name") or "")[:60]
        print(f"{s['stageId']:>6} {s['numCompleteTasks']:>5} {run_t:>8.2f}s "
              f"{cpu:>8.2f}s {sr:>9.2f} {sw:>9.2f} {ib:>8.2f}  {nm}")
    total_run = sum((s.get("executorRunTime") or 0) for s in new) / 1e3
    print(f"total task runTime across measured run(s): {total_run:.2f}s "
          f"(over {runs} run(s))")


if __name__ == "__main__":
    main()
