#!/usr/bin/env python
"""r13 4-way interleaved A/B of minhash profile materialization shapes.

v_old       : r12 — fused profile (incl sh_set) fully checkpointed (1 ckpt job)
v_sig_lazy  : sig-only ckpt; verify = lazy full-corpus set profile (1 ckpt job)
v_sig_cand  : sig ckpt + cand ckpt + candidate-restricted verify (2 ckpt jobs)
v_cand_nock : sig ckpt + candidate-restricted verify, cand NOT ckpt (1 ckpt job,
              band join recomputed per consumer)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sstable_hadoop_spark.plans import get_session  # noqa: E402
from sstable_hadoop_spark.queries import load  # noqa: E402
from sstable_hadoop_spark.operators import dedup  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SIGS = [f"sig_{i}" for i in range(16)]


def _sh(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs, dedup._capped_shingles(docs, "text", "doc_id", 4, None)


def _post(out):
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def v_old(spark, sf_dir):
    docs, _ = _sh(spark, sf_dir)
    profile = dedup.minhash_profiles(docs, n=4, num_perm=16,
                                     max_doc_freq=None)
    profile = profile.localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(profile.select("id", *SIGS), 4, 4)
    return _post(dedup._verify_pairs(cand, profile, 0.5))


def v_sig_lazy(spark, sf_dir):
    docs, sh = _sh(spark, sf_dir)
    sigs = dedup.minhash_signatures(sh, 16).localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(sigs, 4, 4)
    vp = (sh.groupBy("id").agg(F.collect_set(dedup._sh_hash())
                               .alias("sh_set"))
            .withColumn("n_sh", F.size("sh_set")))
    return _post(dedup._verify_pairs(cand, vp, 0.5))


def _restricted(docs, cand):
    ids = (cand.select(F.col("id_a").alias("doc_id"))
               .union(cand.select(F.col("id_b").alias("doc_id")))
               .distinct())
    cdocs = docs.join(ids, "doc_id", "left_semi")
    vsh = dedup._capped_shingles(cdocs, "text", "doc_id", 4, None)
    return (vsh.groupBy("id").agg(F.collect_set(dedup._sh_hash())
                                  .alias("sh_set"))
               .withColumn("n_sh", F.size("sh_set")))


def v_sig_cand(spark, sf_dir):
    docs, sh = _sh(spark, sf_dir)
    sigs = dedup.minhash_signatures(sh, 16).localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(sigs, 4, 4).localCheckpoint(eager=True)
    return _post(dedup._verify_pairs(cand, _restricted(docs, cand), 0.5))


def v_cand_nock(spark, sf_dir):
    docs, sh = _sh(spark, sf_dir)
    sigs = dedup.minhash_signatures(sh, 16).localCheckpoint(eager=True)
    cand = dedup.lsh_candidate_pairs(sigs, 4, 4)
    return _post(dedup._verify_pairs(cand, _restricted(docs, cand), 0.5))


VARIANTS = [("old", v_old), ("sig_lazy", v_sig_lazy),
            ("sig_cand", v_sig_cand), ("cand_nock", v_cand_nock)]


def main():
    spark = get_session("ab_r13_dedup2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for _, fn in VARIANTS:  # warm codegen for each shape
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    res = {k: [] for k, _ in VARIANTS}
    for r in range(ROUNDS):
        for name, fn in VARIANTS:
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            res[name].append(time.perf_counter() - t0)
    for k, v in res.items():
        print(f"{k:12s} min={min(v):.3f} all={[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
