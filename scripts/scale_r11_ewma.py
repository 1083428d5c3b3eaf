"""r11 EWMA fold vectorization evidence: ewma_smooth wall-clock at
sf1/sf10 after the cross-key lockstep rewrite (VERDICT r10 #3 — the
r10 numbers were 36 s at sf1 / ~110 s at sf10 with the per-row
Python-int fold)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, n=2) -> float:
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from sstable_hadoop_spark.operators.timeseries import ewma_smooth
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load, ts_us

    spark = get_session("scale-r11-ewma")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        ev = load(spark, sf_dir, "events")
        sec = timed(lambda: noop(ewma_smooth(
            ev, ts_us(ev, "ts"), "user_id", "value",
            shift=3, tie_cols=("event_id",))))
        print(json.dumps({"sf_dir": sf_dir, "op": "ewma_smooth",
                          "sec": round(sec, 3),
                          "rows": ev.count()}), flush=True)


if __name__ == "__main__":
    main()
