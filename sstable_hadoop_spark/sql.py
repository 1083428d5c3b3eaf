"""Pure-SQL interface: register the engine's tables and views on a
SparkSession so users (the reference's Pig-script audience) can work
entirely in ``spark.sql``.

>>> from sstable_hadoop_spark.sql import create_temp_views
>>> create_temp_views(spark, "/root/testdata/sf0.01",
...                   sstable_dir="/data/sstables")
>>> spark.sql("SELECT key_str, count(*) FROM sstable_cells GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")


def create_temp_views(spark: SparkSession, sf_dir: str | None = None,
                      sstable_dir: str | None = None,
                      as_of_ms: int | None = None) -> list[str]:
    """Register temp views; returns the view names created.

    - one view per parquet table under ``sf_dir``;
    - for ``sstable_dir``: ``sstable_rows`` (nested scan),
      ``sstable_cells`` (exploded, with string-rendered key/name),
      ``sstable_index``, ``sstable_manifest``, ``sstable_merged``
      (per-cell LWW winners) and — when ``as_of_ms`` is given —
      ``sstable_live`` (winners minus tombstones minus expired).
    """
    from sstable_hadoop_spark.operators import explode_cells, live_view, lww_cell
    from sstable_hadoop_spark.queries import load
    from sstable_hadoop_spark.sources.datasource import register

    created: list[str] = []
    if sf_dir:
        for t in TESTDATA_TABLES:
            load(spark, sf_dir, t).createOrReplaceTempView(t)
            created.append(t)
    if sstable_dir:
        register(spark)
        rows = spark.read.format("sstable").load(sstable_dir)
        rows.createOrReplaceTempView("sstable_rows")
        cells = explode_cells(rows)
        rendered = cells.withColumns({
            "key_str": F.col("key").cast("string"),
            "name_str": F.col("name").cast("string"),
        })
        rendered.createOrReplaceTempView("sstable_cells")
        spark.read.format("sstable").option("kind", "index") \
            .load(sstable_dir).createOrReplaceTempView("sstable_index")
        spark.read.format("sstable").option("kind", "manifest") \
            .load(sstable_dir).createOrReplaceTempView("sstable_manifest")
        lww_cell(cells).createOrReplaceTempView("sstable_merged")
        created += ["sstable_rows", "sstable_cells", "sstable_index",
                    "sstable_manifest", "sstable_merged"]
        if as_of_ms is not None:
            live_view(cells, as_of_ms).createOrReplaceTempView("sstable_live")
            created.append("sstable_live")
    return created
