#!/usr/bin/env python
"""r13 interleaved A/B: minhash_dedup_pairs profile materialization —
OLD (r12: full-profile localCheckpoint incl. corpus-scale sh_set) vs
NEW (r13: fixed-width sig-table checkpoint, lazy verification sets).

Also A/Bs similarity_topk_bruteforce unchanged-code before/after the
dedup variants run, to expose any storage-pressure bleed-through (the
bench runs similarity immediately after dedup).

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_r13_dedup.py [rounds]
Interleaves variants within ONE session (host-drift protocol).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sstable_hadoop_spark.plans import get_session  # noqa: E402
from sstable_hadoop_spark.queries import all_queries, load  # noqa: E402
from sstable_hadoop_spark.operators import dedup  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def old_variant(spark, sf_dir):
    """The exact r12 pipeline: one fused profile, fully checkpointed."""
    docs = load(spark, sf_dir, "documents")
    profile = dedup.minhash_profiles(docs, n=4, num_perm=16,
                                     max_doc_freq=None)
    profile = profile.localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(
        profile.select("id", *[f"sig_{i}" for i in range(16)]), 4, 4)
    out = dedup._verify_pairs(cand, profile, 0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def new_variant(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (dedup.minhash_dedup_pairs(docs, n=4, num_perm=16, bands=4,
                                      min_jaccard=0.5, max_doc_freq=None)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    spark = get_session("ab_r13_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    sim = reg["similarity_topk_bruteforce"]
    # warm
    spark.range(1000).selectExpr("sum(id)").collect()
    timed(old_variant, spark); timed(new_variant, spark)

    res = {"old": [], "new": [], "sim_after_old": [], "sim_after_new": []}
    for r in range(ROUNDS):
        for name, fn in (("old", old_variant), ("new", new_variant)):
            spark.sparkContext.setJobDescription(f"dedup {name} r{r}")
            res[name].append(timed(fn, spark))
            spark.sparkContext.setJobDescription(f"sim after {name} r{r}")
            t0 = time.perf_counter()
            sim(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            res[f"sim_after_{name}"].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k:15s} min={min(v):.3f} all={[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
