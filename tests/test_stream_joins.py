"""Stream-stream interval join (streaming/joins.py): batch mode equals
a brute-force reference, the streamed mode equals the batch mode
across micro-batch boundaries, left-outer semantics, and guards."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m, tzinfo=UTC)


CLICKS = [  # (user, click_id, ts)
    (1, 100, _t(10)), (1, 101, _t(15)), (2, 200, _t(12)),
    (3, 300, _t(9)),
]
VIEWS = [  # (user, view_id, ts)
    (1, 900, _t(8)), (1, 901, _t(10)),        # 901 at click instant
    (1, 902, _t(14, 30)), (2, 903, _t(1)),    # 903 too old for 2h
    (2, 904, _t(11, 30)), (4, 905, _t(10)),   # user 4 never clicks
]
DELAY_US = 2 * 3600 * 1_000_000


def _brute(how="inner"):
    out = []
    for u, cid, cts in CLICKS:
        hits = [(u, vid, vts) for (vu, vid, vts) in VIEWS
                if vu == u and 0 <= (cts - vts).total_seconds()
                * 1_000_000 <= DELAY_US]
        for _, vid, vts in hits:
            out.append((u, cid, vid))
        if not hits and how == "left":
            out.append((u, cid, None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] or -1))


def _frames(spark):
    c = spark.createDataFrame(CLICKS, "user_id long, click_id long, "
                                      "ts timestamp")
    v = spark.createDataFrame(VIEWS, "user_id long, view_id long, "
                                     "ts timestamp")
    return c, v


def _got(df):
    rows = df.select("user_id", "click_id", "view_id").collect()
    return sorted(((r[0], r[1], r[2]) for r in rows),
                  key=lambda r: (r[0], r[1], r[2] or -1))


def test_batch_inner_matches_bruteforce(spark):
    from sstable_hadoop_spark.streaming.joins import interval_join

    c, v = _frames(spark)
    j = interval_join(c, v, ["user_id"], max_delay="2 hours")
    assert _got(j) == _brute()
    # boundary semantics visible in the fixture: the at-instant view
    # (901) and the exactly-2h-old one join; the 11h-old (903) doesn't
    assert (1, 100, 901) in _got(j)


def test_batch_left_keeps_unmatched_clicks(spark):
    from sstable_hadoop_spark.streaming.joins import interval_join

    c, v = _frames(spark)
    j = interval_join(c, v, ["user_id"], max_delay="2 hours",
                      how="left")
    got = _got(j)
    assert got == _brute("left")
    assert (3, 300, None) in got  # user 3 has no views at all


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    from sstable_hadoop_spark.streaming.joins import interval_join

    c, v = _frames(spark)
    cdir, vdir = str(tmp_path / "c"), str(tmp_path / "v")
    # split each side into 2 files so pairs MUST cross micro-batches
    for df, d in ((c, cdir), (v, vdir)):
        df.filter(F.col("user_id") % 2 == 0).coalesce(1) \
          .write.parquet(os.path.join(d, "p0"))
        df.filter(F.col("user_id") % 2 == 1).coalesce(1) \
          .write.parquet(os.path.join(d, "p1"))
    cs = (spark.readStream.schema(c.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(os.path.join(cdir, "p*")))
    vs = (spark.readStream.schema(v.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(os.path.join(vdir, "p*")))
    j = interval_join(cs, vs, ["user_id"], max_delay="2 hours",
                      watermark="30 days")
    sink = str(tmp_path / "sink")
    q = (j.writeStream.format("parquet")
          .option("path", sink)
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        q.stop()
    assert _got(spark.read.parquet(sink)) == _brute()


def test_guards(spark):
    from sstable_hadoop_spark.streaming.joins import interval_join

    c, v = _frames(spark)
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(c, v, ["user_id"], how="full")
    with pytest.raises(ValueError, match="both sides"):
        interval_join(c, c, ["user_id"])
    with pytest.raises(ValueError, match="missing"):
        interval_join(c, v, ["nope"])


def test_nano_epoch_long_ts(spark):
    """The testdata shape: ts arrives as a nano-epoch BIGINT."""
    from sstable_hadoop_spark.streaming.joins import interval_join

    def nanos(rows):
        return [(u, i, int(t.timestamp() * 1_000_000) * 1000)
                for u, i, t in rows]

    c = spark.createDataFrame(nanos(CLICKS),
                              "user_id long, click_id long, ts long")
    v = spark.createDataFrame(nanos(VIEWS),
                              "user_id long, view_id long, ts long")
    j = interval_join(c, v, ["user_id"], max_delay="2 hours")
    assert _got(j) == _brute()
