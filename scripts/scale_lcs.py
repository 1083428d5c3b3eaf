#!/usr/bin/env python
"""Scale-step evidence for leveled compaction (operators/compaction.py
LCS): build the 4-generation SSTable fixture at sf1/sf10, copy it to a
working dir, and run compact_leveled to quiescence.  One JSON line per
(sf, op): planning cost (metadata-only) and the L0→L1 merge round.

Inputs: the scaled dirs from scripts/scale_testdata.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from sstable_hadoop_spark.operators.compaction import (
        compact_leveled,
        pick_leveled,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import _materialize_sstables

    spark = get_session("scale-lcs")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        src = _materialize_sstables(spark, sf_dir)
        work = tempfile.mkdtemp(prefix="lcs_scale_")
        for f in os.listdir(src):
            if f.endswith(".db"):
                shutil.copy2(os.path.join(src, f),
                             os.path.join(work, f))
        n_bytes = sum(os.path.getsize(os.path.join(work, f))
                      for f in os.listdir(work))
        t0 = time.perf_counter()
        task = pick_leveled(work, l0_threshold=4)
        plan_s = time.perf_counter() - t0
        print(json.dumps({"sf_dir": sf_dir, "op": "pick_leveled",
                          "sec": round(plan_s, 3),
                          "n_bytes": n_bytes,
                          "n_sources": len(task["sources"])}),
              flush=True)
        t0 = time.perf_counter()
        rounds = compact_leveled(spark, work, l0_threshold=4,
                                 target_partitions=8)
        print(json.dumps({"sf_dir": sf_dir,
                          "op": "compact_leveled_quiesce",
                          "sec": round(time.perf_counter() - t0, 3),
                          "rounds": rounds}), flush=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
