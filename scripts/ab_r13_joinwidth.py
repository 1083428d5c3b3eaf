#!/usr/bin/env python
"""r13 VERDICT #6 prototype: final-aggregate width for the pre-agg
joins at sf1 (the 1-10 GiB "small shuffle bytes, heavy downstream"
gap).  Variants, interleaved in one session:

  stock      — AQE coalesces the pre-agg exchange by bytes (64 MiB
               advisory → few reducers at sf1)
  advisory8m — advisoryPartitionSizeInBytes=8m for the query only
               (cost-aware width via conf, parameterized not constant)
  keyed      — explicit repartition(N, key) before the pre-agg
               (same single shuffle, fixed width, AQE coalesce off)

Usage: python scripts/ab_r13_joinwidth.py [/tmp/testdata/sf1] [rounds]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sstable_hadoop_spark.plans import get_session  # noqa: E402
from sstable_hadoop_spark.queries import all_queries, load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def keyed_join_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = spark.sparkContext.defaultParallelism
    per_order = (li.repartition(n, "l_orderkey")
                 .groupBy("l_orderkey")
                 .agg(F.sum(F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))).alias("rev")))
    return (per_order.join(o, per_order.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment").agg(
                F.count("o_orderkey").alias("n_orders"),
                F.round(F.sum("rev"), 2).alias("revenue")))


def main():
    spark = get_session("ab_joinwidth")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(fn, advisory=None):
        if advisory:
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        try:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            if advisory:
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")

    for qname in ("join_agg_revenue", "five_way_join_region_revenue"):
        q = reg[qname]
        variants = {
            "stock": lambda q=q: run(lambda: q(spark, SF_DIR)),
            "advisory8m": lambda q=q: run(lambda: q(spark, SF_DIR), "8m"),
        }
        if qname == "join_agg_revenue":
            variants["keyed"] = lambda: run(
                lambda: keyed_join_agg(spark, SF_DIR))
        for fn in variants.values():  # warm
            fn()
        res = {k: [] for k in variants}
        for r in range(ROUNDS):
            for name, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{qname} {name} r{r}")
                res[name].append(fn())
        for k, v in res.items():
            print(f"{qname:30s} {k:10s} min={min(v):.3f} "
                  f"all={[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
