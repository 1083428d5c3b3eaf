import sys
sys.path.insert(0, "/root/repo")
from sstable_hadoop_spark.plans import get_session
import __spark_entry__ as e
spark = get_session("drive-queries")
qs = e.queries()
oracles = e.oracle_sql()
for name, fn in sorted(qs.items()):
    df = fn(spark, "/root/testdata/sf0.001")
    n = df.count()
    print(f"{name:35s} rows={n:6d} oracle={'yes' if name in oracles else 'ROWS-ONLY'}")
    assert n >= 0
print("ALL QUERIES DRIVE OK:", len(qs))
