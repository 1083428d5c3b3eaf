#!/usr/bin/env python
"""Dump the formatted physical plan of every bench query — the
evidence behind PERF.md's plan-shape column.  Usage:

    python scripts/dump_plans.py [sf_dir]          # default sf0.01
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from bench import BENCH_QUERIES
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for bench_name, query_name in BENCH_QUERIES.items():
        print(f"\n{'=' * 72}\n== {bench_name} ({query_name})\n{'=' * 72}")
        df = registry[query_name](spark, SF)
        df.explain("formatted")


if __name__ == "__main__":
    main()
