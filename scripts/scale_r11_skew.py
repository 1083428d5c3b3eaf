"""r11 skew_join straggler evidence (VERDICT r10 #7): wall-clock
parity at local[32] hid the win (one hot task still fits a core), so
this script reads the PER-TASK metrics from Spark's REST API instead —
max single-task duration and max single-task shuffle-read bytes for
the plain sort-merge join vs the hot-key-split join over a power-law
key.  The skew path must cut both: the hot key's flood rides a
broadcast leg instead of landing on one SMJ task."""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _stage_extremes(spark, stage_ids) -> dict:
    """Max single-task duration (ms) and shuffle-read (bytes) across
    the given stages, from /stages/{id}/{attempt}/taskSummary."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    max_dur = 0.0
    max_read = 0.0
    for sid in stage_ids:
        try:
            s = _rest(f"{base}/api/v1/applications/{app}/stages/{sid}"
                      f"/0/taskSummary?quantiles=1.0")
        except Exception:
            continue  # skipped/empty stage
        max_dur = max(max_dur, s.get("executorRunTime", [0])[-1])
        rd = s.get("shuffleReadMetrics", {}).get("readBytes", [0])
        max_read = max(max_read, rd[-1])
    return {"max_task_ms": int(max_dur),
            "max_task_shuffle_read_mb":
                round(max_read / 1048576, 1)}


def main() -> None:
    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.skew import skew_join
    from sstable_hadoop_spark.plans.session import get_session

    spark = get_session("scale-r11-skew")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    n = int(os.environ.get("SKEW_ROWS", "20000000"))
    # power law: half the fact rows hit user 1, rest uniform over 1M
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
         .otherwise(F.col("id") % 1000000).alias("user_id"),
        (F.col("id") % 997).alias("v")).localCheckpoint()
    right = spark.range(1000000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("seg"))\
        .localCheckpoint()

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's own skew mitigation OFF for the baseline leg so the
    # measurement shows the raw SMJ straggler; the skew_join run
    # keeps session defaults (its broadcast leg needs no AQE help)
    try:
        def run(tag, df):
            before = set(
                s["stageId"] for s in _rest(
                    f"{sc.uiWebUrl}/api/v1/applications/"
                    f"{sc.applicationId}/stages"))
            t0 = time.monotonic()
            out = df.groupBy("seg").agg(
                F.count("*").alias("n"), F.sum("v").alias("sv"))
            rows = sorted(tuple(r) for r in out.collect())
            wall = time.monotonic() - t0
            after = [s["stageId"] for s in _rest(
                f"{sc.uiWebUrl}/api/v1/applications/"
                f"{sc.applicationId}/stages")]
            new = [s for s in after if s not in before]
            m = _stage_extremes(spark, new)
            print(json.dumps({"op": tag, "rows": len(rows),
                              "wall_sec": round(wall, 2), **m,
                              "checksum": hash(tuple(rows))}),
                  flush=True)
            return rows

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        a = run("plain_smj", left.join(right, "user_id"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        b = run("aqe_skew_smj", left.join(right, "user_id"))
        c = run("skew_join_split",
                skew_join(left, right, on="user_id", hot_keys=[1]))
        assert a == b == c, "result mismatch"
        print(json.dumps({"op": "equality", "equal": True}),
              flush=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


if __name__ == "__main__":
    main()
