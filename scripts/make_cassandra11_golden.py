#!/usr/bin/env python
"""Produce a golden SSTable family serialized by REAL Apache
Cassandra 1.1 code (VERDICT r6 next-round #5).

The engine's ``format=cassandra`` reader is tested against (a)
fixtures written by its own sink and (b) a hand-assembled byte-golden
built from the public 1.1 serializer layouts
(tests/test_cassandra1x.py).  What neither proves is parity with
bytes emitted by Cassandra's own ``SSTableWriter``/``ColumnSerializer``
— the exact artifact the reference consumes through
scala-sstable-reader (pom.xml:73-77).  This script generates that
artifact.  It CANNOT run in the build container (no network, no
Cassandra jars); run it once on any machine with Java 7/8 and network,
then vendor the produced directory at
``tests/golden/cassandra11_real/`` — test_cassandra1x.py picks it up
automatically (the test skips, with a pointer here, while the
directory is absent).

Steps it automates:
  1. fetch apache-cassandra-1.1.12-bin.tar.gz from
     archive.apache.org/dist/cassandra/1.1.12/ and unpack it;
  2. compile the embedded ``WriteGolden.java`` against the unpacked
     jars — it builds a ColumnFamily containing a NORMAL column, a
     DELETED column (DeletedColumn: 4-byte localDeletionTime value)
     and an EXPIRING column (ExpiringColumn: ttl + localDeletionTime),
     across two rows, and flushes it through
     org.apache.cassandra.io.sstable.SSTableSimpleUnsortedWriter —
     Cassandra's public bulk-load writer, the same serializer path as
     a memtable flush;
  3. copy the resulting ``Keyspace1-golden-hf-1-*.db`` family plus a
     ``manifest.json`` of the expected cells (key, name, state, value,
     timestamp, ttl, localDeletionTime) into the output directory.

Usage:
    python scripts/make_cassandra11_golden.py [out_dir]
Default out_dir: tests/golden/cassandra11_real
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import urllib.request

MIRROR = ("https://archive.apache.org/dist/cassandra/1.1.12/"
          "apache-cassandra-1.1.12-bin.tar.gz")

# The expected logical cells, duplicated into manifest.json so the
# verifying test is self-contained.  Timestamps are µs (Cassandra
# convention for client timestamps), expiration seconds fixed.
MANIFEST = [
    {"key": "row1", "name": "alpha", "state": "NORMAL",
     "value": "v-alpha", "timestamp": 1000},
    {"key": "row1", "name": "dead", "state": "DELETED",
     "timestamp": 2000, "local_deletion_time": 1700000000},
    {"key": "row2", "name": "exp", "state": "EXPIRING",
     "value": "v-exp", "timestamp": 3000, "ttl": 3600,
     "local_deletion_time": 1700003600},
]

WRITE_GOLDEN_JAVA = r"""
import java.io.File;
import java.io.IOException;
import java.nio.ByteBuffer;
import org.apache.cassandra.db.DeletedColumn;
import org.apache.cassandra.db.marshal.BytesType;
import org.apache.cassandra.dht.ByteOrderedPartitioner;
import org.apache.cassandra.io.sstable.SSTableSimpleUnsortedWriter;

/** Writes the golden family with Cassandra 1.1's own serializers.
 *  1.1's AbstractSSTableSimpleWriter has no public tombstone call, so
 *  a one-method subclass routes a DeletedColumn through the protected
 *  addColumn(IColumn) — still Cassandra's own serializer path. */
public class WriteGolden {
    static class GoldenWriter extends SSTableSimpleUnsortedWriter {
        GoldenWriter(File dir) throws IOException {
            // ByteOrderedPartitioner keeps keys in lexical order,
            // matching the engine's sorted-key Index/Summary checks.
            super(dir, new ByteOrderedPartitioner(), "Keyspace1",
                  "golden", BytesType.instance, null, 64);
        }

        void addDeleted(ByteBuffer name, long ts, int localDeletionTime)
                throws IOException {
            addColumn(new DeletedColumn(name, localDeletionTime, ts));
        }
    }

    static ByteBuffer b(String s) {
        return ByteBuffer.wrap(s.getBytes());
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();
        GoldenWriter w = new GoldenWriter(dir);
        w.newRow(b("row1"));
        w.addColumn(b("alpha"), b("v-alpha"), 1000L);
        w.addDeleted(b("dead"), 2000L, 1700000000);
        w.newRow(b("row2"));
        w.addExpiringColumn(b("exp"), b("v-exp"), 3000L, 3600,
                            1700003600000L);
        w.close();
    }
}
"""


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "cassandra11_real")
    work = tempfile.mkdtemp(prefix="cassandra11_")
    tarball = os.path.join(work, "cassandra.tar.gz")
    print(f"fetching {MIRROR} ...")
    urllib.request.urlretrieve(MIRROR, tarball)
    with tarfile.open(tarball) as tf:
        tf.extractall(work)
    home = os.path.join(work, "apache-cassandra-1.1.12")
    cp = ":".join(
        os.path.join(home, "lib", j)
        for j in os.listdir(os.path.join(home, "lib"))
        if j.endswith(".jar"))
    src = os.path.join(work, "WriteGolden.java")
    with open(src, "w") as f:
        f.write(WRITE_GOLDEN_JAVA)
    subprocess.check_call(["javac", "-cp", cp, "-d", work, src])
    sst_out = os.path.join(work, "out", "Keyspace1", "golden")
    os.makedirs(sst_out, exist_ok=True)
    subprocess.check_call(
        ["java", "-cp", f"{cp}:{work}", "WriteGolden",
         os.path.join(work, "out", "Keyspace1", "golden")])
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(sst_out):
        if f.endswith(".db"):
            shutil.copy2(os.path.join(sst_out, f), out_dir)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(MANIFEST, f, indent=2)
    print(f"golden family + manifest written to {out_dir}")
    print("vendor that directory into the repo; "
          "tests/test_cassandra1x.py::test_real_cassandra11_golden "
          "will verify it")
    return 0


if __name__ == "__main__":
    sys.exit(main())
