#!/usr/bin/env python
"""Write plans/r12/<bench>_after.txt — formatted plans at sf0.1,
matching the _before.txt capture format."""
import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def main():
    from bench import BENCH_QUERIES
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("plans_r12")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for bench_name, query_name in BENCH_QUERIES.items():
        if ONLY and bench_name not in ONLY:
            continue
        df = registry[query_name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/r12/{bench_name}_after.txt", "w") as f:
            f.write(f"== {bench_name} ({query_name}) — sf0.1, after r12 "
                    f"optimization ==\n")
            f.write(buf.getvalue())
        print("wrote", bench_name)


if __name__ == "__main__":
    main()
