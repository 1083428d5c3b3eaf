"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §3.2: explode →
per-cell LWW merge) at sf0.001.  ``queries()`` / ``oracle_sql()`` map
every implemented operator from SURVEY.md §2 to a named DataFrame
callable and its DuckDB-checkable ANSI-SQL twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sstable_hadoop_spark import queries as q

    return q.flagship_lww_merge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sstable_hadoop_spark import queries as q

    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    from sstable_hadoop_spark import queries as q

    return q.all_oracles()
