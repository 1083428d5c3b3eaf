"""sstable_hadoop_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``eaceaser/sstable-hadoop``.

The reference is a Hadoop/Pig library for reading Apache Cassandra 1.x
SSTable files (``*-Data.db`` / ``*-Index.db`` / ``*-Summary.db`` /
``*-CompressionInfo.db``) off HDFS and reconciling multi-generation cell
data with last-write-wins semantics.  This package re-expresses that
capability Spark-first:

- ``sources``   — SSTable binary codec + a PySpark Python DataSource
                  (``spark.read.format("sstable")``) with chunk-aligned
                  partition planning (replaces the reference's three
                  chained split-planning MapReduce jobs).
- ``operators`` — last-write-wins reconciliation (per-cell and per-row),
                  tombstone suppression, TTL live views, dedup,
                  similarity search, text analysis.
- ``functions`` — scalar helpers (companion paths, msgpack sink, text
                  metrics).
- ``plans``     — session factory tuned for large-cluster execution
                  (AQE, adaptive shuffle partitions).
- ``streaming`` — Structured Streaming views of the same cell model.

Everything downstream of the scan is ordinary DataFrame/SQL on Catalyst;
no custom optimizer rules are required (SURVEY.md §4).
"""

__version__ = "0.1.0"
