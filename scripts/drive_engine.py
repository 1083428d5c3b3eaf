"""Drive the engine as a user would: public package imports only.

1. Write multi-generation SSTables (one gen compressed) with the codec.
2. spark.read.format("sstable") → explode → lww_cell → live_view.
3. Write the msgpack+base64 sink to disk; decode a line back.
4. Run the driver contract: __spark_entry__.entry(spark) on sf0.001.
5. Probes: empty dir scan, unknown kind, tiny max_split_bytes.
"""
import base64
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from sstable_hadoop_spark.plans import get_session
from sstable_hadoop_spark.sources.codec import Cell, Row, write_sstable
from sstable_hadoop_spark.operators import explode_cells, live_view, lww_cell, collect_rows
from sstable_hadoop_spark.functions import to_msgpack_base64_lines
from sstable_hadoop_spark.functions.msgpack_lite import unpackb

spark = get_session("drive")
d = tempfile.mkdtemp()

# gen1: two values; gen2 (compressed): tombstone for one, update for other
write_sstable(d, "demo", [
    Row(b"alice", [Cell(b"city", "NORMAL", b"SFO", 100),
                   Cell(b"plan", "NORMAL", b"free", 100)]),
    Row(b"bob", [Cell(b"city", "NORMAL", b"NYC", 100)]),
], generation=1)
write_sstable(d, "demo", [
    Row(b"alice", [Cell(b"city", "DELETED", None, 200),
                   Cell(b"plan", "NORMAL", b"pro", 200)]),
], generation=2, compressed=True)

df = spark.read.format("sstable").load(d)
print("== scan ==")
df.show(truncate=False)
cells = explode_cells(df)
print("== lww winners ==")
w = lww_cell(cells)
w.orderBy("key", "name").show(truncate=False)
print("== live view (tombstone suppressed) ==")
lv = live_view(cells, 10**15)
lv.orderBy("key", "name").show(truncate=False)
assert lv.count() == 2, f"expected 2 live cells, got {lv.count()}"
states = {(bytes(r['key']), bytes(r['name'])): r['state'] for r in w.collect()}
assert states[(b"alice", b"city")] == "DELETED", "tombstone must win"

print("== msgpack sink ==")
sink = to_msgpack_base64_lines(collect_rows(lv, by_generation=False))
line = sink.collect()[0]["value"]
print("line:", line[:60], "...")
decoded = unpackb(base64.b64decode(line))
print("decoded:", decoded)
assert isinstance(decoded[0], bytes) and isinstance(decoded[1], list)

out = tempfile.mkdtemp() + "/msgpack_out"
sink.write.mode("overwrite").text(out)
import glob
files = glob.glob(out + "/part-*")
print("sink files:", files)
assert files, "sink wrote no files"

print("== driver contract ==")
import __spark_entry__ as e
res = e.entry(spark)
n = res.count()
print(f"entry() rows={n}, schema={res.schema.simpleString()}")
assert n > 0
print("queries:", sorted(e.queries().keys()))
assert set(e.oracle_sql().keys()) <= set(e.queries().keys())

print("== probes ==")
empty = tempfile.mkdtemp()
c = spark.read.format("sstable").load(empty).count()
print("empty dir scan rows:", c)
assert c == 0
try:
    spark.read.format("sstable").option("kind", "bogus").load(d).count()
    print("PROBE FAIL: bogus kind accepted")
except Exception as ex:
    print("bogus kind rejected:", str(ex).splitlines()[0][:100])
tiny = spark.read.format("sstable").option("max_split_bytes", "64").load(d)
print("tiny-split partitions:", tiny.rdd.getNumPartitions(), "rows:", tiny.count())
assert tiny.count() == df.count()
# kind=cells flat twin: cell count equals sum(size(columns)) of kind=data
flat = spark.read.format("sstable").option("kind", "cells").load(d)
n_cells = df.selectExpr("sum(size(columns))").collect()[0][0]
print("kind=cells rows:", flat.count(), "expected:", n_cells)
assert flat.count() == n_cells
assert spark.read.format("sstable").option("kind", "cells") \
    .load(empty).count() == 0
# format=cassandra: empty dir is a clean zero-row scan too
assert spark.read.format("sstable").option("format", "cassandra") \
    .load(empty).count() == 0
try:
    spark.read.format("sstable").option("format", "bogus").load(d).count()
    print("PROBE FAIL: bogus format accepted")
except Exception as ex:
    print("bogus format rejected:", str(ex).splitlines()[0][:100])
print("ALL DRIVE CHECKS PASSED")

print("== pushdown drive ==")
big = tempfile.mkdtemp()
write_sstable(big, "big", [Row(f"k{i:05d}".encode(), [Cell(b"c", "NORMAL", b"v", i)]) for i in range(2000)], generation=1)
fdf = spark.read.format("sstable").option("max_split_bytes", "4096").load(big)
hit = fdf.filter(fdf.key == b"k01234").collect()
print("filtered rows:", len(hit), "key:", bytes(hit[0]['key']))
assert len(hit) == 1
fdf.filter(fdf.key == b"k01234").explain()
from sstable_hadoop_spark.functions import manifest_tsv
m = spark.read.format("sstable").option("kind", "manifest").option("max_split_bytes", "4096").load(big)
print(manifest_tsv(m).collect()[0]["value"][:80])
print("DRIVE 2 PASSED")

print("== streaming source drive ==")
sdir = tempfile.mkdtemp()
write_sstable(sdir, "s-cf", [Row(b"a", [Cell(b"c", "NORMAL", b"1", 1)])], generation=1)
ckpt = tempfile.mkdtemp()
sout = tempfile.mkdtemp() + "/out"
from pyspark.sql import functions as F
stream = spark.readStream.format("sstable").load(sdir)
q = (stream.select(F.col("key").cast("string").alias("k"), "generation")
     .writeStream.format("parquet").option("path", sout)
     .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
q.awaitTermination(60)
n1 = spark.read.parquet(sout).count()
write_sstable(sdir, "s-cf", [Row(b"b", [Cell(b"c", "NORMAL", b"2", 2)])], generation=2)
q = (spark.readStream.format("sstable").load(sdir)
     .select(F.col("key").cast("string").alias("k"), "generation")
     .writeStream.format("parquet").option("path", sout)
     .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
q.awaitTermination(60)
n2 = spark.read.parquet(sout).count()
print("stream rows after gen1:", n1, "after gen2:", n2)
assert (n1, n2) == (1, 2)

print("== write sink drive ==")
wdir = tempfile.mkdtemp()
from sstable_hadoop_spark.operators import collect_rows as _cr
cells2 = explode_cells(spark.read.format("sstable").load(sdir))
(_cr(cells2, by_generation=True).write.format("sstable")
 .option("path", wdir).mode("append").save())
back = spark.read.format("sstable").load(wdir)
print("sink round-trip rows:", back.count())
assert back.count() == 2
print("DRIVE 3 PASSED")

print("== compaction drive ==")
from sstable_hadoop_spark.operators.compaction import compact
cdir = tempfile.mkdtemp()
compact(spark, d, cdir)  # the demo dir from the first drive section
cback = spark.read.format("sstable").load(cdir)
print("compacted generations:", [r["generation"] for r in cback.select("generation").distinct().collect()],
      "rows:", cback.count())
assert cback.count() == 2  # alice + bob merged rows
print("DRIVE 4 PASSED")
