#!/usr/bin/env python
"""r13 VERDICT #5: attribute the Python-DataSource scan floor.

Reads the sstable_scan fixture dir directly at several split sizes and
pulls per-stage task metrics from the REST API: if launch/scheduler
overhead dominates executorRunTime the floor is per-task (fewer splits
is the lever); if run time dominates and scales with bytes it's
parse/Arrow assembly (batch sizing is the lever).

Usage: python scripts/profile_r13_sstable.py [sf_dir] [rounds]
"""
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from sstable_hadoop_spark.plans import get_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def stage_metrics(sc, after_stage):
    url = (sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
           + "/stages?status=complete&details=false")
    data = json.load(urllib.request.urlopen(url))
    out = []
    for s in sorted(data, key=lambda s: s["stageId"]):
        if s["stageId"] <= after_stage:
            continue
        out.append((s["stageId"], s["numCompleteTasks"],
                    s["executorRunTime"], s["executorDeserializeTime"],
                    s.get("executorCpuTime", 0) // 1_000_000,
                    s["inputBytes"]))
    return out


def max_stage(sc):
    url = (sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
           + "/stages")
    data = json.load(urllib.request.urlopen(url))
    return max((s["stageId"] for s in data), default=-1)


def main():
    spark = get_session("profile_sstable")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from sstable_hadoop_spark.queries import _materialize_sstables

    path = _materialize_sstables(spark, SF_DIR)
    print("fixture:", path)

    import glob
    import os
    files = glob.glob(path + "/*Data.db")
    print(f"{len(files)} Data.db files, "
          f"{sum(os.path.getsize(f) for f in files)} bytes total")

    def rd(split):
        r = spark.read.format("sstable")
        if split:
            r = r.option("max_split_bytes", str(split))
        return r.load(path)

    for split in (None, 1 << 30, 65536, 16384):
        # warm
        rd(split).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            rd(split).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        before = max_stage(sc)
        t0 = time.perf_counter()
        rd(split).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        ms = stage_metrics(sc, before)
        print(f"\nsplit={split}: min wall={min(walls):.3f} "
              f"(profiled run {wall:.3f})")
        for sid, n, run, deser, cpu, inp in ms:
            print(f"  stage {sid}: tasks={n} runTime={run}ms "
                  f"deser={deser}ms cpu={cpu}ms input={inp}")


if __name__ == "__main__":
    main()
