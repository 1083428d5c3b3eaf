"""E1-E5 extension operators: golden rules for dedup, recall bounds for
the approximate (LSH) paths vs their exact baselines, multimodal
plumbing shape + determinism."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from sstable_hadoop_spark.queries import load

    return load(spark, SF, "documents")


def test_exact_dedup_keeps_lowest_id(spark):
    from sstable_hadoop_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [1, 3]


def test_jaccard_pairs_identical_docs(spark):
    from sstable_hadoop_spark.operators.dedup import jaccard_pairs, word_shingles

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "z y x w v u t s")],
        "doc_id bigint, text string")
    pairs = jaccard_pairs(word_shingles(df, n=3)).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)
    assert pairs[0]["jaccard"] == 1.0


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH must find a healthy fraction of the true >=0.5-Jaccard pairs
    (recall) and never emit a below-threshold pair (precision=1 by
    re-verification)."""
    from sstable_hadoop_spark.operators.dedup import (
        jaccard_pairs,
        minhash_dedup_pairs,
        word_shingles,
    )

    docs = _docs(spark)
    exact = {(r["id_a"], r["id_b"])
             for r in jaccard_pairs(word_shingles(docs, n=4), 0.5,
                                    max_doc_freq=None).collect()}
    got = {(r["id_a"], r["id_b"])
           for r in minhash_dedup_pairs(docs, n=4, min_jaccard=0.5,
                                        max_doc_freq=None).collect()}
    assert exact, "fixture should contain near-dup pairs"
    assert got <= exact          # precision = 1
    assert len(got) / len(exact) >= 0.5  # banded-LSH recall at j>=0.5


def test_simhash_properties(spark):
    from sstable_hadoop_spark.operators.dedup import simhash64

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "the quick brown fox leaps over the lazy dog again and again"),
         (4, "completely different words entirely unrelated content here now")],
        "doc_id bigint, text string")
    fps = {r["id"]: r["simhash"] for r in simhash64(df).collect()}
    ham = lambda a, b: bin(fps[a] ^ fps[b]).count("1")
    assert ham(1, 2) == 0                # identical text → identical hash
    assert ham(1, 3) < ham(1, 4)         # near-dup closer than unrelated
    assert ham(1, 3) <= 20


def test_simhash_near_pairs_finds_duplicate(spark):
    from sstable_hadoop_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta"),
         (3, "one two three four five six seven eight")],
        "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_near_pairs(df, max_hamming=4, blocks=5).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_pigeonhole_invariant_enforced(spark):
    from sstable_hadoop_spark.operators.dedup import simhash_near_pairs_from_fps

    fps = spark.createDataFrame([(1, 0)], "id bigint, simhash bigint")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs_from_fps(fps, max_hamming=4, blocks=4)


def test_simhash_blockjoin_recall_at_exact_hamming(spark):
    """Pigeonhole recall guarantee: plant fingerprint pairs at EXACTLY
    max_hamming differing bits (the worst case the guarantee covers)
    in adversarial positions — spread across distinct blocks, and
    clumped inside one block — and assert the block-key candidate join
    finds every one of them."""
    import random

    from sstable_hadoop_spark.operators.dedup import simhash_near_pairs_from_fps

    rng = random.Random(7)
    bits, blocks, max_h = 60, 4, 3
    rows, expected = [], set()
    for g in range(40):
        base = rng.getrandbits(bits)
        if g % 2 == 0:  # spread: one flipped bit in each of max_h blocks
            flip_positions = [b * (bits // blocks) + rng.randrange(bits // blocks)
                              for b in rng.sample(range(blocks), max_h)]
        else:           # clumped: all flips inside a single block
            blk = rng.randrange(blocks)
            flip_positions = rng.sample(
                range(blk * (bits // blocks), (blk + 1) * (bits // blocks)),
                max_h)
        partner = base
        for p in flip_positions:
            partner ^= 1 << p
        a_id, b_id = 2 * g, 2 * g + 1
        rows += [(a_id, base), (b_id, partner)]
        expected.add((a_id, b_id))
    fps = spark.createDataFrame(rows, "id bigint, simhash bigint")
    found = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs_from_fps(
                 fps, max_hamming=max_h, bits=bits, blocks=blocks).collect()}
    missed = expected - set(found)
    assert not missed, f"planted pairs at Hamming={max_h} missed: {missed}"
    assert all(found[p] == max_h for p in expected if p in found)


def test_cosine_near_dup_lsh_no_cartesian(spark):
    """The bucketed near-dup plan must not contain a nested-loop /
    cartesian stage, and must find high-cosine planted near-dups."""
    from sstable_hadoop_spark.operators.similarity import cosine_near_dup_lsh
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    # plant an exact duplicate of vec 0 under a fresh id
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    df = cosine_near_dup_lsh(emb.unionAll(dup), threshold=0.99)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["id_a"], r["id_b"]) for r in df.collect()}
    assert (0, 100000) in pairs


def test_similarity_lsh_recall_vs_bruteforce(spark):
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in cosine_topk_lsh(emb, q, k=5).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_multimodal_plumbing(spark):
    from sstable_hadoop_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
        resize_images,
        sample_frames,
    )

    media = media_from_documents(_docs(spark)).limit(60).cache()
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # determinism: same payload → same features
    again = {r["media_id"]: r["features"] for r in feats.collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]

    imgs = resize_images(media, 224, 224)
    img_rows = imgs.collect()
    assert img_rows and all(r["meta"]["width"] == 224 for r in img_rows)
    assert set(imgs.columns) == {"media_id", "modality", "payload", "meta"}

    frames = sample_frames(media, every_ms=1000)
    f_rows = frames.collect()
    n_videos = media.filter(F.col("modality") == "video").count()
    assert len(f_rows) >= n_videos  # ≥1 frame per video
    assert {r["media_id"] for r in f_rows} == \
        {r["media_id"] for r in
         media.filter(F.col("modality") == "video").collect()}

    # text payloads are not decodable media: the real path must fail
    # inside the task naming the supported/missing formats
    with pytest.raises(Exception, match="BMP/PNG/JPEG|ffmpeg"):
        extract_features(media, fake=False).collect()


def test_multimodal_real_decode_bmp_wav(spark):
    """fake=False actually decodes: BMP mean-channel and WAV RMS land in
    the feature vector; nearest-neighbor resize really resizes."""
    import numpy as np

    from sstable_hadoop_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
        extract_features,
        resize_images,
    )

    # 6x5 image (odd row length exercises BMP 4-byte padding)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    t = np.arange(1600)
    pcm = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    rate, back = decode_wav(encode_wav(pcm, 16000))
    assert rate == 16000 and np.array_equal(back, pcm)

    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(img)),
          {"mime": "image/bmp", "width": 5, "height": 6,
           "duration_ms": None}),
         (2, "audio", bytearray(encode_wav(pcm, 16000)),
          {"mime": "audio/wav", "width": None, "height": None,
           "duration_ms": 100})],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:long,height:long,duration_ms:long>")

    feats = {r["media_id"]: r["features"]
             for r in extract_features(media, fake=False).collect()}
    # image: tag, w/4096, h/4096, mean RGB
    assert feats[1][0] == 1.0
    assert abs(feats[1][3] - img[:, :, 0].mean() / 255.0) < 1e-6
    assert abs(feats[1][5] - img[:, :, 2].mean() / 255.0) < 1e-6
    # audio: tag, rate, duration, rms
    x = pcm.astype(np.float64) / 32768.0
    assert feats[2][0] == 2.0
    assert abs(feats[2][1] - 16000 / 48000) < 1e-6
    assert abs(feats[2][3] - float(np.sqrt((x * x).mean()))) < 1e-5

    (out,) = resize_images(media, 3, 2, fake=False).collect()
    resized = decode_bmp(bytes(out["payload"]))
    assert resized.shape == (2, 3, 3)
    ys = (np.arange(2) * 6 // 2).clip(0, 5)
    xs = (np.arange(3) * 5 // 3).clip(0, 4)
    assert np.array_equal(resized, img[np.ix_(ys, xs)])
    assert out["meta"]["width"] == 3 and out["meta"]["height"] == 2


def test_dedup_components_clusters(spark):
    """Known graph: {1,2,3} near-dups (transitively), {4,5} near-dups,
    6 unique → clusters led by 1, 4, 6."""
    from sstable_hadoop_spark.operators.dedup import dedup_components

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, base),
         (4, "x1 x2 x3 x4 x5 x6 x7 x8"), (5, "x1 x2 x3 x4 x5 x6 x7 x8"),
         (6, "q1 q2 q3 q4 q5 q6 q7 q8")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_components(df, min_jaccard=0.4).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[4] == (4, True)
    assert got[5] == (4, False)
    assert got[6] == (6, True)


def test_similarity_ivf_recall_vs_bruteforce(spark):
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in cosine_topk_ivf(emb, q, k=5).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_salted_agg_matches_plain(spark):
    from sstable_hadoop_spark.operators.skew import salted_agg
    from sstable_hadoop_spark.queries import load

    li = load(spark, SF, "lineitem")
    plain = {(r["l_returnflag"],): (r["n"], r["s"], r["mx"])
             for r in li.groupBy("l_returnflag").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_quantity"), 4).alias("s"),
                 F.max("l_extendedprice").alias("mx")).collect()}
    salted = {(r["l_returnflag"],): (r["n"], round(r["s"], 4), r["mx"])
              for r in salted_agg(
                  li, ["l_returnflag"],
                  {"n": ("*", "count"), "s": ("l_quantity", "sum"),
                   "mx": ("l_extendedprice", "max")}).collect()}
    salted = {k: (n, s, mx) for k, (n, s, mx) in salted.items()}
    for k in plain:
        pn, ps, pmx = plain[k]
        sn, ss, smx = salted[k]
        assert pn == sn and pmx == smx
        assert abs(ps - ss) < 1e-6


def test_salted_lww_matches_plain(spark, sstable_dir):
    from sstable_hadoop_spark.operators import explode_cells, lww_cell
    from sstable_hadoop_spark.operators.skew import salted_lww_cell

    cells = explode_cells(spark.read.format("sstable").load(sstable_dir))
    plain = {(bytes(r["key"]), bytes(r["name"])): (r["state"], r["timestamp"])
             for r in lww_cell(cells).collect()}
    salted = {(bytes(r["key"]), bytes(r["name"])): (r["state"], r["timestamp"])
              for r in salted_lww_cell(cells, n_salts=8).collect()}
    assert plain == salted


def test_lww_cell_skew_modes_agree(spark, sstable_dir):
    import pytest

    from sstable_hadoop_spark.operators import explode_cells, lww_cell

    cells = explode_cells(spark.read.format("sstable").load(sstable_dir))

    def snap(df):
        return {(bytes(r["key"]), bytes(r["name"])):
                (r["state"], r["timestamp"], r["generation"])
                for r in df.collect()}

    plain = snap(lww_cell(cells))
    assert snap(lww_cell(cells, skew="always", n_salts=8)) == plain
    assert snap(lww_cell(cells, skew="auto")) == plain
    with pytest.raises(ValueError, match="skew"):
        lww_cell(cells, skew="sometimes")


def test_detect_group_skew(spark):
    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.skew import detect_group_skew

    # uniform: 10k rows over 1k keys → no group dominates
    uniform = spark.range(10000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v"))
    assert not detect_group_skew(uniform, ["k"])
    # skewed: half of all rows share one key
    skewed = spark.range(10000).select(
        F.when(F.col("id") % 2 == 0, F.lit(-1))
         .otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"))
    assert detect_group_skew(skewed, ["k"])
    # empty input never flags
    assert not detect_group_skew(uniform.filter("k < 0"), ["k"])


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    from sstable_hadoop_spark.queries import load
    from sstable_hadoop_spark.streaming.dedup import dedup_events_stream

    events = load(spark, SF, "events")
    dup = events.union(events)  # every event twice
    # batch twin
    assert dedup_events_stream(dup).count() == events.count()

    src = str(tmp_path / "dup_events")
    dup.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(dup.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    out = dedup_events_stream(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert not q.isActive
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_sink").collect()[0]
    # no duplicate event may survive within the watermark horizon
    assert n["c"] == n["n"]


def test_sql_interface_views(spark, sstable_dir):
    from tests.conftest import AS_OF_MS

    from sstable_hadoop_spark.sql import create_temp_views

    created = create_temp_views(spark, SF, sstable_dir=sstable_dir,
                                as_of_ms=AS_OF_MS)
    assert "lineitem" in created and "sstable_merged" in created
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0
    merged = spark.sql("""
        SELECT count(*) AS n FROM sstable_merged WHERE state = 'DELETED'
    """).collect()[0]["n"]
    assert merged > 0
    live_tomb = spark.sql("""
        SELECT count(*) AS n FROM sstable_live WHERE state = 'DELETED'
    """).collect()[0]["n"]
    assert live_tomb == 0
    # joinable: sstable cells against a parquet dimension via SQL only
    joined = spark.sql("""
        SELECT c.key_str, count(*) AS n
        FROM sstable_cells c JOIN sstable_index i
          ON c.key = i.key AND c.generation = i.generation
        GROUP BY c.key_str ORDER BY n DESC LIMIT 5
    """).collect()
    assert joined


def test_approx_distinct_within_rsd_of_exact(spark):
    """approx_count_distinct has no SQL oracle (engine-specific HLL
    sketches) — pin its accuracy against the exact count instead:
    rsd=0.01 must land within 5% at this cardinality."""
    from sstable_hadoop_spark.queries import approx_distinct_users, load

    approx = approx_distinct_users(spark, SF).collect()[0]["approx_users"]
    exact = (load(spark, SF, "events")
             .select("user_id").distinct().count())
    assert abs(approx - exact) <= max(0.05 * exact, 2)


def test_curation_pipeline_plan_is_join_free(spark):
    """The curation pipeline chains stats and lang-ID as projections
    via column pass-through — a regression here (someone re-joining on
    doc_id) doubles the shuffle count at 100 TB."""
    from sstable_hadoop_spark.queries import corpus_curation_pipeline

    df = corpus_curation_pipeline(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_size_tiered_bucketing(tmp_path):
    """STCS semantics on a synthetic size distribution: similar-size
    files bucket together, buckets below min_threshold are not due,
    smallest-average bucket comes first."""
    from sstable_hadoop_spark.operators.compaction import pick_size_tiered

    sizes = {  # 4 small ~1 KiB, 4 big ~1 MiB, 1 outlier
        1: 1000, 2: 1100, 3: 950, 4: 1050,
        5: 1_000_000, 6: 1_050_000, 7: 980_000, 8: 1_020_000,
        9: 50_000_000,
    }
    for g, n in sizes.items():
        (tmp_path / f"ks-cf-{g}-Data.db").write_bytes(b"\0" * n)

    buckets = pick_size_tiered(str(tmp_path), min_threshold=4)
    assert len(buckets) == 2  # outlier bucket has 1 file → not due
    small, big = buckets  # smallest average first
    assert {int(p.rsplit("-", 2)[-2]) for p in small} == {1, 2, 3, 4}
    assert {int(p.rsplit("-", 2)[-2]) for p in big} == {5, 6, 7, 8}
    # raising the threshold empties the due list
    assert pick_size_tiered(str(tmp_path), min_threshold=5) == []


def test_compact_files_merges_only_the_bucket(spark, sstable_dir,
                                              tmp_path):
    """Incremental STCS compaction: compacting an explicit generation
    subset equals batch lww_cell over just those files."""
    import glob

    from sstable_hadoop_spark.operators import explode_cells, lww_cell
    from sstable_hadoop_spark.operators.compaction import compact_files

    files = sorted(glob.glob(str(tmp_path / "nothing")) + [
        f for f in glob.glob(sstable_dir + "/*-Data.db")
        if f.endswith(("-1-Data.db", "-2-Data.db"))])
    assert len(files) == 2
    want = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"])
            for r in lww_cell(explode_cells(
                spark.read.format("sstable").load(sstable_dir)
                .filter("generation <= 2"))).collect()}

    out = str(tmp_path / "tiered")
    compact_files(spark, files, out, generation=7)
    back = explode_cells(spark.read.format("sstable").load(out))
    got = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"])
           for r in back.collect()}
    assert got == want
    gens = {r["generation"] for r in back.select("generation")
            .distinct().collect()}
    assert gens == {7}


def test_compaction_roundtrip_and_gc(spark, sstable_dir, tmp_path):
    """Major compaction: merged output dir scans back to exactly the
    pre-compaction winners; GC purges old tombstones + expired cells
    but retains newer tombstones."""
    from tests.conftest import AS_OF_MS

    from sstable_hadoop_spark.operators import explode_cells, lww_cell
    from sstable_hadoop_spark.operators.compaction import compact

    cells = explode_cells(spark.read.format("sstable").load(sstable_dir))
    want = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"])
            for r in lww_cell(cells).collect()}

    out = str(tmp_path / "compacted")
    compact(spark, sstable_dir, out)
    back = explode_cells(spark.read.format("sstable").load(out))
    got = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"])
           for r in back.collect()}
    assert got == want
    # single generation, newer than all inputs
    gens = {r["generation"] for r in back.select("generation").distinct().collect()}
    assert gens == {5}

    # GC: purge everything tombstoned/expired before AS_OF
    out2 = str(tmp_path / "compacted_gc")
    compact(spark, sstable_dir, out2, gc_before_ms=AS_OF_MS)
    back2 = explode_cells(spark.read.format("sstable").load(out2))
    rows2 = back2.collect()
    # every fixture timestamp predates AS_OF → no tombstones survive GC
    assert all(r["state"] != "DELETED" for r in rows2)
    assert all(r["expiration"] is None or r["expiration"] > AS_OF_MS
               for r in rows2)
    # and GC only ever removes rows, never changes surviving winners
    got2 = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"])
            for r in rows2}
    assert got2 <= want


def _dim32_embeddings(spark, n=40):
    """Deterministic 32-dim vectors — exercises the non-default width."""
    import math

    rows = [(i, [math.sin(i * 31 + d) for d in range(32)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_vector_ops_dim_mismatch_raises(spark):
    """dim=64 hyperplanes against 32-wide vectors must raise a clear
    per-row error, never silently null-pad (zip_with) into wrong
    buckets."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_near_dup_lsh,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    emb = _dim32_embeddings(spark)
    q = emb.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id")
    for df in (cosine_near_dup_lsh(emb, threshold=0.9),
               cosine_topk_lsh(emb, q, k=3),
               cosine_topk_ivf(emb, q, k=3)):
        with pytest.raises(Exception, match="dim mismatch"):
            df.collect()


def test_vector_ops_dim_derived_from_data(spark):
    """dim=None derives the width from the data; LSH/IVF then run
    cleanly on 32-dim vectors and find the planted duplicate."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_near_dup_lsh,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    emb = _dim32_embeddings(spark)
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    pairs = {(r["id_a"], r["id_b"])
             for r in cosine_near_dup_lsh(emb.unionAll(dup), threshold=0.99,
                                          dim=None).collect()}
    assert (0, 1000) in pairs

    q = emb.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id")
    assert cosine_topk_lsh(emb, q, k=3, dim=None).count() > 0
    assert cosine_topk_ivf(emb, q, k=3, dim=None).count() > 0


def test_vector_ops_dim_derive_empty_raises(spark):
    from sstable_hadoop_spark.operators.similarity import cosine_near_dup_lsh

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="cannot derive"):
        cosine_near_dup_lsh(empty, dim=None)


def test_png_codec_roundtrip_and_filters():
    """Pure-codec checks: encode→decode identity; an externally-crafted
    IDAT using every scanline filter type (0/1/2/3/4) unfilters
    correctly; grayscale expands to RGB and RGBA drops alpha."""
    import struct
    import zlib

    import numpy as np

    from sstable_hadoop_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def png_with_filters(px, ctype, ch, filters):
        h, w = px.shape[0], px.shape[1]
        flat = px.reshape(h, w * ch).astype(np.int32)
        raw = bytearray()
        prev = np.zeros(w * ch, np.int32)
        for y, ftype in zip(range(h), filters):
            rec = flat[y]
            if ftype == 0:
                enc = rec
            elif ftype == 1:  # Sub
                a = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
                enc = (rec - a) & 0xFF
            elif ftype == 2:  # Up
                enc = (rec - prev) & 0xFF
            elif ftype == 3:  # Average
                a = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
                enc = (rec - (a + prev) // 2) & 0xFF
            else:  # Paeth
                a = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
                c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
                b = prev
                pp = a + b - c
                pa, pb, pc = np.abs(pp - a), np.abs(pp - b), np.abs(pp - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                enc = (rec - pred) & 0xFF
            raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
            prev = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    payload = png_with_filters(px, ctype=2, ch=3, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), px)

    gray = rng.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    got = decode_png(png_with_filters(gray, ctype=0, ch=1,
                                      filters=[4, 3, 2, 1]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    rgba = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    got = decode_png(png_with_filters(rgba, ctype=6, ch=4,
                                      filters=[1, 4, 3]))
    assert np.array_equal(got, rgba[:, :, :3])

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK")
    interlaced = (_PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)))
    with _pytest.raises(NotImplementedError, match="interlace"):
        decode_png(interlaced)


def test_multimodal_real_decode_png(spark):
    """fake=False decodes PNG payloads through the Spark kernel: feature
    means match the pixels, and resize re-encodes as PNG."""
    import numpy as np

    from sstable_hadoop_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(img)),
          {"mime": "image/png", "width": 5, "height": 6,
           "duration_ms": None})],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:long,height:long,duration_ms:long>")

    (row,) = extract_features(media, fake=False).collect()
    assert row["features"][0] == 1.0
    assert abs(row["features"][3] - img[:, :, 0].mean() / 255.0) < 1e-6
    assert abs(row["features"][5] - img[:, :, 2].mean() / 255.0) < 1e-6

    (out,) = resize_images(media, 3, 2, fake=False).collect()
    payload = bytes(out["payload"])
    assert payload[:8] == _PNG_SIG  # stays PNG
    resized = decode_png(payload)
    ys = (np.arange(2) * 6 // 2).clip(0, 5)
    xs = (np.arange(3) * 5 // 3).clip(0, 4)
    assert np.array_equal(resized, img[np.ix_(ys, xs)])


def test_corpus_hash_split_deterministic_and_complete(spark):
    """Every row gets exactly one split; assignment is identical across
    invocations and row orders; proportions land near the weights."""
    from sstable_hadoop_spark.operators.corpus import hash_split
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    a = {r["doc_id"]: r["split"]
         for r in hash_split(docs).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs.orderBy(F.desc("doc_id")))
         .select("doc_id", "split").collect()}
    assert a == b
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] / n > 0.8          # 0.9 nominal
    assert 0.0 < c["val"] / n < 0.15     # 0.05 nominal
    assert 0.0 < c["test"] / n < 0.15


def test_corpus_stratified_sample_rates(spark):
    """Per-stratum keep rates track the requested fractions; the kept
    set is a deterministic subset (re-run identical)."""
    from sstable_hadoop_spark.operators.corpus import stratified_sample
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = stratified_sample(docs, {"en": 0.5, "de": 0.25},
                             default_fraction=0.0)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {"en", "de"}  # default 0 drops other strata
    assert 0.2 < got.get("en", 0) / totals["en"] < 0.8
    assert got.get("de", 0) / totals["de"] < 0.6
    again = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert again == {r["doc_id"] for r in kept.select("doc_id").collect()}


def test_corpus_token_chunks_reassemble(spark):
    """Chunks tile each document exactly: sizes ≤ chunk_size, indices
    contiguous from 0, and re-joining chunk texts restores the
    lowercased token stream."""
    from sstable_hadoop_spark.operators.corpus import token_chunks

    df = spark.createDataFrame(
        [(1, "A b c d e f g"), (2, "x"), (3, "one two three four five")],
        "doc_id bigint, text string")
    rows = sorted(((r["doc_id"], r["chunk_idx"], r["n_tokens"],
                    r["chunk_text"])
                   for r in token_chunks(df, chunk_size=3).collect()))
    by_doc = {}
    for did, idx, n, txt in rows:
        by_doc.setdefault(did, []).append((idx, n, txt))
    assert [i for i, _, _ in by_doc[1]] == [0, 1, 2]
    assert [n for _, n, _ in by_doc[1]] == [3, 3, 1]
    assert " ".join(t for _, _, t in by_doc[1]) == "a b c d e f g"
    assert by_doc[2] == [(0, 1, "x")]
    assert [n for _, n, _ in by_doc[3]] == [3, 2]


def test_corpus_tfidf_known_example(spark):
    """Hand-checkable corpus: a term unique to one doc outranks terms
    shared by all docs."""
    from sstable_hadoop_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple banana banana"), (2, "apple cherry"),
         (3, "apple date")],
        "doc_id bigint, text string")
    rows = {(r["id"], r["rk"]): (r["term"], r["tfidf"])
            for r in tfidf_top_terms(df, k=2).collect()}
    # 'apple' appears in every doc → idf ln(4/4)=0 → never rank 1,
    # tfidf exactly 0 wherever it does appear
    assert rows[(1, 1)][0] == "banana"
    assert rows[(2, 1)][0] == "cherry"
    assert rows[(3, 1)][0] == "date"
    for key, (term, score) in rows.items():
        if term == "apple":
            assert key[1] == 2 and score == 0.0
    # banana tf=2, idf=ln(2) → 2·ln(2)
    import math
    assert abs(rows[(1, 1)][1] - round(2 * math.log(2), 6)) < 1e-9


def test_repetition_signals_known_docs(spark):
    """Hand-built docs: clean text scores low; a boilerplate doc with
    duplicated lines and a dominating 2-gram scores high."""
    from sstable_hadoop_spark.operators.text import repetition_signals

    clean = "alpha beta gamma delta\nepsilon zeta eta theta"
    spam = ("click here\nclick here\nclick here\nbuy now")
    one_tok = "single"
    df = spark.createDataFrame(
        [(1, clean), (2, spam), (3, one_tok)],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}

    assert got[1]["dup_line_frac"] == 0.0
    # clean: all 7 bigrams distinct -> modal covers 2/8 tokens
    assert abs(got[1]["top_bigram_frac"] - 0.25) < 1e-9
    assert got[1]["distinct_token_ratio"] == 1.0

    # spam: 4 lines, 2 duplicates of 'click here' -> 2/4
    assert abs(got[2]["dup_line_frac"] - 0.5) < 1e-9
    # tokens: click here x3 buy now = 8 tokens; 'click here' occurs 3x
    # as a bigram -> covers min(6/8, 1)
    assert abs(got[2]["top_bigram_frac"] - 0.75) < 1e-9
    assert abs(got[2]["distinct_token_ratio"] - 0.5) < 1e-9

    # degenerate single-token doc: no bigrams, nothing divides by zero
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[3]["distinct_token_ratio"] == 1.0


def test_pack_sequences_invariants(spark):
    """Every doc assigned exactly once; no bin exceeds the budget
    except a dedicated oversized-doc bin; bin_fill is consistent;
    assignment is deterministic across row orders; packing beats the
    one-doc-per-bin baseline."""
    from sstable_hadoop_spark.operators.corpus import pack_sequences
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    budget = 256
    out = pack_sequences(docs, budget=budget, n_groups=8).collect()
    n_docs = docs.count()
    assert len(out) == n_docs
    assert len({r["id"] for r in out}) == n_docs

    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for bin_id, rows in by_bin.items():
        fill = sum(r["n_tokens"] for r in rows)
        assert all(r["bin_fill"] == fill for r in rows)
        if fill > budget:  # only a single oversized doc may overflow
            assert len(rows) == 1 and rows[0]["n_tokens"] > budget
    # packing actually packs: fewer bins than docs
    assert len(by_bin) < n_docs
    # determinism under input reordering
    again = pack_sequences(docs.orderBy(F.desc("doc_id")), budget=budget,
                           n_groups=8).collect()
    assert {(r["id"], r["bin_id"]) for r in again} == \
        {(r["id"], r["bin_id"]) for r in out}


def test_pack_sequences_best_fit_exact(spark):
    """Hand-checkable: sizes 6,5,4,3,2 with budget 9 best-fit-decreasing
    → bins {6,3} {5,4} {2}."""
    from sstable_hadoop_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         enumerate([6, 5, 4, 3, 2])],
        "doc_id bigint, text string")
    out = pack_sequences(docs, budget=9, n_groups=1).collect()
    bins = {}
    for r in out:
        bins.setdefault(r["bin_id"], set()).add(r["n_tokens"])
    assert sorted(sorted(v) for v in bins.values()) == \
        [[2], [3, 6], [4, 5]]


# Exact per-group BFD bin counts for the driver query's parameters
# (budget=256, n_groups=16) on both test corpora.  These literals used
# to live in the corpus_pack_sequences oracle as a CASE whose unmatched
# keys went silently NULL under the driver's DuckDB (the r5 red row);
# the driver projection now checks only re-derivable columns + the
# lb <= n_bins <= n_docs invariant, and the sequential-state output is
# pinned HERE, where a mismatch names the group that moved.
_PACK_EXPECTED = {
    "sf0.001": {0: (8, 2013), 1: (8, 1874), 2: (6, 1363), 3: (7, 1645),
                4: (7, 1603), 5: (8, 1962), 6: (6, 1389), 7: (6, 1495),
                8: (8, 1819), 9: (11, 2608), 10: (7, 1696), 11: (7, 1747),
                12: (5, 1222), 13: (7, 1687), 14: (6, 1485), 15: (10, 2331)},
    "sf0.01": {0: (9, 2035), 1: (7, 1650), 2: (5, 1119), 3: (8, 1905),
               4: (6, 1395), 5: (10, 2289), 6: (6, 1282), 7: (6, 1399),
               8: (8, 1806), 9: (8, 1944), 10: (7, 1752), 11: (8, 1923),
               12: (6, 1443), 13: (6, 1522), 14: (7, 1672), 15: (9, 2029)},
}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_pack_sequences_exact_bin_counts(spark, sf):
    """Pin the exact best-fit-decreasing bin count and token total per
    pack group on the driver corpora — the sequential-state quantity
    the SQL oracle cannot re-derive."""
    from sstable_hadoop_spark.operators.corpus import pack_sequences
    from sstable_hadoop_spark.queries import load

    docs = load(spark, f"/root/testdata/{sf}", "documents")
    packed = pack_sequences(docs, budget=256, n_groups=16)
    rows = (packed.groupBy("pack_group")
            .agg(F.count_distinct("bin_id").alias("n_bins"),
                 F.sum("n_tokens").alias("total_tokens"))
            .collect())
    got = {r["pack_group"]: (r["n_bins"], r["total_tokens"]) for r in rows}
    assert got == _PACK_EXPECTED[sf]


def test_redact_pii_crafted(spark):
    from sstable_hadoop_spark.operators.corpus import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io and 4111 1111 1111 1111 now"),
         (2, "call +44 20 7946 0958 from 192.168.0.1"),
         (3, "clean text only")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "<EMAIL>" in got[1]["text"] and "a.b+c@" not in got[1]["text"]
    assert "<CARD>" in got[1]["text"] and "4111" not in got[1]["text"]
    assert got[1]["n_email"] == 1 and got[1]["n_card"] == 1
    assert "<PHONE>" in got[2]["text"]
    assert "<IPV4>" in got[2]["text"] and "192.168" not in got[2]["text"]
    assert got[2]["n_ipv4"] == 1
    assert got[3]["text"] == "clean text only"
    assert got[3]["n_email"] == got[3]["n_phone"] == 0


def test_decontaminate_drops_overlaps_only(spark):
    """Planted contamination: the benchmark doc, its verbatim copy, and
    a doc embedding one benchmark 8-gram are dropped; clean docs
    survive."""
    from sstable_hadoop_spark.operators.corpus import decontaminate

    bench_text = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    docs = spark.createDataFrame(
        [(1, bench_text),                                  # the benchmark doc
         (2, bench_text),                                  # verbatim dup
         (3, "intro " + " ".join(f"q{i}" for i in range(1, 9)) + " outro"),
         (4, "totally unrelated words one two three four five six seven"),
         (5, "short doc")],
        "doc_id bigint, text string")
    bench = docs.filter(F.col("doc_id") == 1)
    kept = {r["doc_id"]
            for r in decontaminate(docs, bench, n=8).collect()}
    assert kept == {4, 5}
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_contamination_scores_hand_computed(spark):
    """Planted overlap: a doc embedding exactly half of a 16-token
    benchmark doc's distinct 8-grams scores the hand-computed hit
    count and integer basis points; clean and short docs score 0.
    Repeated grams within a doc count ONCE (distinct-gram basis)."""
    from sstable_hadoop_spark.operators.corpus import contamination_scores

    bench_text = " ".join(f"q{i}" for i in range(1, 17))  # 16 toks → 9 grams
    half = " ".join(f"q{i}" for i in range(1, 13))        # 12 toks → 5 grams
    docs = spark.createDataFrame(
        [(1, bench_text),
         (2, half),                         # 5/5 grams hit → 10000 bp
         (3, ("clean words " * 8).strip()),  # repeated grams, 0 hits
         (4, "tiny")],                      # whole-text fallback gram
        "doc_id bigint, text string")
    bench = docs.filter(F.col("doc_id") == 1)
    rows = {r["doc_id"]: r for r in
            contamination_scores(docs, bench, n=8).collect()}
    assert rows[1]["n_grams"] == 9 and rows[1]["hits"] == 9
    assert rows[1]["overlap_bp"] == 10000
    assert rows[2]["n_grams"] == 5 and rows[2]["hits"] == 5
    assert rows[2]["overlap_bp"] == 10000
    # "clean words" × 8 → 16 tokens, all 8-grams are one of two
    # rotations of the repeating pair → array_distinct collapses them
    assert rows[3]["n_grams"] == 2 and rows[3]["hits"] == 0
    assert rows[3]["overlap_bp"] == 0
    assert rows[4]["n_grams"] == 1 and rows[4]["hits"] == 0
    # partial overlap: embed 3 benchmark grams among foreign tokens
    partial = spark.createDataFrame(
        [(9, " ".join(f"q{i}" for i in range(1, 11)) + " zzz yyy xxx")],
        "doc_id bigint, text string")
    r9 = contamination_scores(partial, bench, n=8).collect()[0]
    # 13 toks → 6 distinct grams, grams q1..q8, q2..q9, q3..q10 hit
    assert r9["n_grams"] == 6 and r9["hits"] == 3
    assert r9["overlap_bp"] == 3 * 10000 // 6
    plan = contamination_scores(docs, bench, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def _bpe_reference_train(texts, n_merges, min_freq):
    """Independent pure-Python classic BPE (greedy left-to-right
    non-overlapping merge per iteration) — the semantics
    operators/tokenizer.py must reproduce via string replace."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            wf[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        cand = [(c, l, r) for (l, r), c in pc.items() if c >= min_freq]
        if not cand:
            break
        cand.sort(key=lambda x: (-x[0], x[1], x[2]))
        c, l, r = cand[0]
        merges.append((rank, l, r, l + r, c))
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l \
                        and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def test_bpe_train_matches_reference(spark):
    """The distributed trainer reproduces classic BPE exactly on a
    corpus with the adversarial cases: repeated-char runs (where a
    shared-delimiter string replace would under-merge — the
    per-symbol wrapping regression this pins), rank ties, and a
    below-min_freq tail."""
    from sstable_hadoop_spark.operators.tokenizer import train_bpe

    texts = ["low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest",
             "the cat sat on the mat the cat",
             "aaaa aaaa aa aaaaaa baab",
             "singleton"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    exp = _bpe_reference_train(texts, 14, 2)
    got = [tuple(r) for r in train_bpe(df, n_merges=14,
                                       min_freq=2).collect()]
    assert got == exp
    # the (a,a) merge over runs is present and counted overlapping
    assert (1, "a", "a", "aa", 13) in got
    # early stop: a huge budget ends when no pair reaches min_freq
    full = train_bpe(df, n_merges=500, min_freq=3).collect()
    assert 0 < len(full) < 500


def test_bpe_local_trainer_matches_spark_trainer(spark):
    """train_bpe_local (driver-local merge loop, the production path
    — VERDICT r9 #4) must be ROW-IDENTICAL to train_bpe (the
    per-merge-Spark-job oracle harness) on the same adversarial
    corpus, including tie-breaks, overlapping-run counts, and the
    early stop."""
    from sstable_hadoop_spark.operators.tokenizer import (
        train_bpe,
        train_bpe_local,
    )

    texts = ["low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest",
             "the cat sat on the mat the cat",
             "aaaa aaaa aa aaaaaa baab",
             "singleton"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    for n, mf in ((16, 2), (500, 3)):
        exp = [tuple(r) for r in
               train_bpe(df, n_merges=n, min_freq=mf).collect()]
        got = [tuple(r) for r in
               train_bpe_local(df, n_merges=n, min_freq=mf).collect()]
        assert got == exp, (n, mf)
    # max_words guard is loud
    with pytest.raises(ValueError, match="max_words"):
        train_bpe_local(df, n_merges=2, max_words=3)


def test_bpe_local_trainer_scales_to_production_merges(spark):
    """1k+ merges must train in seconds driver-side (the whole point
    of the local path: no per-merge Spark job), and the result must
    replay cleanly through the fast tokenizer."""
    import time

    from sstable_hadoop_spark.operators.tokenizer import (
        bpe_tokenize_fast,
        train_bpe_local,
    )

    # a corpus rich enough to sustain >1000 merges at min_freq=2:
    # number words spelled as digit sequences give deep merge chains
    texts = [" ".join(f"w{i:04d}" for i in range(600)) * 3,
             " ".join(f"x{i * 7 % 997:03d}" for i in range(900)) * 2]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    t0 = time.monotonic()
    merges = train_bpe_local(df, n_merges=1200, min_freq=2)
    got = merges.collect()
    elapsed = time.monotonic() - t0
    assert len(got) >= 1000
    # ranks are contiguous from 1 and counts respect min_freq
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(r["pair_count"] >= 2 for r in got)
    # generous bound: includes the one Spark word-count job; the
    # driver loop itself is sub-second — a per-merge-job path would
    # take minutes here
    assert elapsed < 60, f"local trainer took {elapsed:.1f}s"
    toks = bpe_tokenize_fast(df, merges).select("n_tokens").collect()
    assert all(r["n_tokens"] > 0 for r in toks)


def test_bpe_tokenize_paths_agree(spark):
    """Declarative replace-chain tokenizer == Arrow-batched fast path
    == per-word reference replay, on adversarial and empty docs."""
    from sstable_hadoop_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_fast,
        train_bpe,
    )

    texts = ["low low low lower newest aaaa aaaa baab",
             "the cat sat on the mat",
             "",
             "   ",
             None,                       # NULL text → [] on BOTH paths
             "low\u00a0lower",          # NBSP: Java \s does NOT split
             "low\x0blower"]             # VT: Java \s DOES split
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    merges = train_bpe(df, n_merges=10, min_freq=2)
    ranked = [(r["lhs"], r["rhs"])
              for r in merges.orderBy("rank").collect()]

    def ref_doc(t):
        import re

        toks = []
        # the engines split on JAVA \s (ASCII) — Python str.split()
        # would also split NBSP/U+2028 and mask the r8 ADVICE bug
        for w in re.split(r"[ \t\n\x0b\f\r]+", (t or "").lower()):
            if not w:
                continue
            syms = list(w) + ["</w>"]
            for lhs, rhs in ranked:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs \
                            and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            toks.extend(syms)
        return toks

    slow = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize(df, merges).collect()}
    fast = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize_fast(df, merges).collect()}
    exp = {i: ref_doc(t) for i, t in enumerate(texts)}
    assert slow == exp
    assert fast == exp
    # n_tokens is non-increasing as the merge budget grows
    n5 = {r["doc_id"]: r["n_tokens"] for r in
          bpe_tokenize(df, train_bpe(df, n_merges=5,
                                     min_freq=2)).collect()}
    n10 = {r["doc_id"]: r["n_tokens"] for r in
           bpe_tokenize(df, merges).collect()}
    assert all(n10[d] <= n5[d] for d in n5)


def test_bpe_randomized_tiny_alphabet(spark):
    """Seeded random corpus over {a,b,c} — maximal repeated-run and
    rank-tie density.  Trainer must equal the fold reference through
    30 merges, and both tokenize paths must agree on every doc."""
    import random

    from sstable_hadoop_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_fast,
        train_bpe,
    )

    rng = random.Random(80801)
    texts = [" ".join("".join(rng.choice("abc")
                              for _ in range(rng.randint(1, 9)))
                      for _ in range(rng.randint(3, 25)))
             for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    exp = _bpe_reference_train(texts, 30, 2)
    m = train_bpe(df, n_merges=30, min_freq=2)
    got = [tuple(r) for r in m.collect()]
    assert got == exp
    slow = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize(df, m).collect()}
    fast = {r["doc_id"]: list(r["tokens"])
            for r in bpe_tokenize_fast(df, m).collect()}
    assert slow == fast
    # round-trip: stripping </w> and re-joining reproduces the text
    for i, t in enumerate(texts):
        detok = "".join(slow[i]).replace("</w>", " ").strip()
        assert detok == t


def test_similarity_ivf_trained_recall(spark):
    """The trained-codebook IVF must reach at least the recall of the
    fixed md5 codebook on the testdata corpus (data-adaptive cells)
    and be deterministic under its seed."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_ivf_trained,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 20).withColumnRenamed(
        "vec_id", "query_id")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    fixed = {(r["query_id"], r["vec_id"])
             for r in cosine_topk_ivf(emb, q, k=5).collect()}
    trained = {(r["query_id"], r["vec_id"])
               for r in cosine_topk_ivf_trained(emb, q, k=5).collect()}
    r_fixed = len(fixed & exact) / len(exact)
    r_trained = len(trained & exact) / len(exact)
    assert r_trained >= 0.3
    assert r_trained >= r_fixed - 0.1, \
        f"trained recall {r_trained} far below fixed {r_fixed}"
    again = {(r["query_id"], r["vec_id"])
             for r in cosine_topk_ivf_trained(emb, q, k=5).collect()}
    assert again == trained


def test_ivf_stored_partition_pruning(spark, tmp_path):
    """The cell-clustered store must prune unprobed cells at PLAN time:
    the parquet scan's partition filters name _cell, and results equal
    the unstored IVF exactly."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_stored,
        write_ivf_clustered,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    path = str(tmp_path / "ivfstore")
    write_ivf_clustered(emb, path)
    import os
    cells = [d for d in os.listdir(path) if d.startswith("_cell=")]
    assert len(cells) > 1  # corpus actually spread over cells

    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id")
    stored = cosine_topk_ivf_stored(spark, path, q, k=5)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan

    got = {(r["query_id"], r["vec_id"], r["rk"])
           for r in stored.collect()}
    want = {(r["query_id"], r["vec_id"], r["rk"])
            for r in cosine_topk_ivf(emb, q, k=5, dim=None).collect()}
    assert got == want


def test_ivfpq_stored_probe_and_rerank(spark, tmp_path):
    """r8 combined IVF+PQ index: the store holds ONLY (id, codes)
    partitioned by coarse cell plus a codebook sidecar; the stored
    probe prunes unprobed cells at PLAN time and is bit-identical to
    the inline probe with the same codebooks; the exact-cosine rerank
    stage recovers recall the 4x16 quantization loses (deterministic
    corpus, so the inequality is a fixed fact, not a statistical
    hope)."""
    import json
    import os

    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivfpq,
        cosine_topk_ivfpq_stored,
        train_pq_codebooks,
        write_ivfpq_index,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    books = train_pq_codebooks(emb, m=4, k_codes=16)
    path = str(tmp_path / "ivfpqstore")
    out_books = write_ivfpq_index(emb, path, codebooks=books)
    assert out_books == books
    cells = [d for d in os.listdir(path) if d.startswith("_cell=")]
    assert len(cells) > 1
    meta = json.loads(open(os.path.join(path, "_ivfpq_meta.json"),
                           "rb").read())
    assert meta["codebooks"] == books and meta["n_centroids"] == 16
    # the store is codes-only: no raw vector column survives
    stored_schema = spark.read.parquet(path).schema.fieldNames()
    assert set(stored_schema) == {"id", "codes", "_cell"}

    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id")
    stored = cosine_topk_ivfpq_stored(spark, path, q, k=5)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan

    srows = [tuple(r) for r in stored.orderBy("query_id", "rk").collect()]
    irows = [tuple(r) for r in
             cosine_topk_ivfpq(emb, q, k=5, codebooks=books)
             .orderBy("query_id", "rk").collect()]
    assert srows == irows  # bit-identical incl. ADC scores

    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    adc_hits = sum(1 for r in srows if (r[0], r[1]) in exact)
    rr = cosine_topk_ivfpq_stored(spark, path, q, k=5, rerank_factor=4,
                                  embeddings=emb).collect()
    assert rr and "cos" in rr[0].asDict()
    rr_hits = sum(1 for r in rr
                  if (r["query_id"], r["vec_id"]) in exact)
    assert rr_hits >= adc_hits  # rerank never loses on this corpus

    # rerank without vectors must fail loudly, not silently degrade
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rerank_factor"):
        cosine_topk_ivfpq_stored(spark, path, q, k=5,
                                 rerank_factor=4).collect()


def test_ivfsq8_stored_probe_and_rerank(spark, tmp_path):
    """r10 combined IVF+SQ8 index (VERDICT r9 #5): the store holds
    ONLY (id, int8 codes) partitioned by coarse cell plus a params
    sidecar; the stored probe prunes unprobed cells at PLAN time and
    is bit-identical to the inline probe with the same params; within
    probed cells the decoded-dot order matches the full-scan SQ8
    order (the tier's fine-order fidelity); rerank recovers exact
    cosine."""
    import json
    import os

    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_ivfsq8,
        cosine_topk_ivfsq8_stored,
        cosine_topk_sq8,
        train_sq8,
        write_ivfsq8_index,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    params = train_sq8(emb)
    path = str(tmp_path / "ivfsq8store")
    out = write_ivfsq8_index(emb, path, params=params)
    assert out == params
    cells = [d for d in os.listdir(path) if d.startswith("_cell=")]
    assert len(cells) > 1
    meta = json.loads(open(os.path.join(path, "_ivfsq8_meta.json"),
                           "rb").read())
    assert meta["mins"] == params[0] and meta["n_centroids"] == 16
    # the store is codes-only: no raw vector column survives
    stored_schema = spark.read.parquet(path).schema.fieldNames()
    assert set(stored_schema) == {"id", "codes", "_cell"}

    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id")
    stored = cosine_topk_ivfsq8_stored(spark, path, q, k=5)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan

    srows = [tuple(r) for r in stored.orderBy("query_id", "rk").collect()]
    irows = [tuple(r) for r in
             cosine_topk_ivfsq8(emb, q, k=5, params=params)
             .orderBy("query_id", "rk").collect()]
    assert srows == irows  # bit-identical incl. decoded-dot scores

    # probed scores equal the full-scan SQ8 scores on shared pairs —
    # the same fixed-order chain, only the candidate set differs
    full = {(r["query_id"], r["vec_id"]): r["sq"]
            for r in cosine_topk_sq8(emb, q, k=50,
                                     params=params).collect()}
    shared = [(r[0], r[1], r[3]) for r in srows if (r[0], r[1]) in full]
    assert shared
    assert all(full[(qid, vid)] == sq for qid, vid, sq in shared)

    rr = cosine_topk_ivfsq8_stored(spark, path, q, k=5,
                                   rerank_factor=4,
                                   embeddings=emb).collect()
    assert rr and "cos" in rr[0].asDict()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rerank_factor"):
        cosine_topk_ivfsq8_stored(spark, path, q, k=5,
                                  rerank_factor=4).collect()


def test_hash_split_fraction_one_keeps_ffffffff_bucket(spark):
    """ADVICE r4: fraction ≥ 1.0 must be a trivially-true predicate,
    not a clamped 'ffffffff' threshold under strict '<' — every row
    lands in the stratum / the sample, including a bucket of exactly
    'ffffffff'."""
    from sstable_hadoop_spark.operators.corpus import (
        _hex_threshold,
        hash_split,
        stratified_sample,
    )

    assert _hex_threshold(1.0) == "g" and "ffffffff" < "g"
    docs = spark.createDataFrame(
        [(i, "en", "text") for i in range(200)],
        "doc_id bigint, lang string, text string")
    # single 1.0-weight split: every row must be assigned to it
    only = hash_split(docs, weights={"train": 1.0})
    assert only.filter(F.col("split") == "train").count() == 200
    # 1.0-fraction stratum keeps every row
    assert stratified_sample(docs, {"en": 1.0}).count() == 200
    # cumulative weights summing to exactly 1.0 still cover all rows
    full = hash_split(docs, weights={"a": 0.5, "b": 0.5})
    assert full.count() == 200
    assert full.filter(F.col("split").isNull()).count() == 0


def test_pack_sequences_string_ids(spark):
    """ADVICE r4: pack_sequences must accept non-integer id columns
    like every other corpus operator."""
    from sstable_hadoop_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [("doc-a", "one two three"), ("doc-b", "four five"),
         ("doc-c", "six")],
        "doc_id string, text string")
    out = pack_sequences(docs, budget=4, n_groups=2).collect()
    assert {r["id"] for r in out} == {"doc-a", "doc-b", "doc-c"}
    assert all(isinstance(r["id"], str) for r in out)


def test_sink_overwrite_spares_nested_subdirectories(spark, tmp_path):
    """ADVICE r4: overwrite replaces the table AT the path; sstables in
    nested subdirectories must survive the sweep."""
    import os

    from sstable_hadoop_spark.sources import codec
    from sstable_hadoop_spark.sources.codec import Cell, Row
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    top = str(tmp_path)
    nested = os.path.join(top, "other_table")
    os.makedirs(nested)
    codec.write_sstable(top, "tbl", [Row(b"k1", [Cell(b"c", "NORMAL",
                                                      b"v", 1)])])
    codec.write_sstable(nested, "tbl", [Row(b"k2", [Cell(b"c", "NORMAL",
                                                         b"v", 1)])])
    nested_before = sorted(os.listdir(nested))
    assert nested_before  # fixture sanity

    rows = spark.createDataFrame(
        [(b"k9", [(b"c", "NORMAL", b"v9", 9, None, None)], 5)],
        "key binary, columns array<struct<name:binary,state:string,"
        "data:binary,timestamp:long,ttl:long,expiration:long>>, "
        "generation int")
    (rows.write.format("sstable").option("path", top)
         .option("name", "tbl").mode("overwrite").save())

    # nested table untouched by the sweep
    assert sorted(os.listdir(nested)) == nested_before
    # top level: generation-1 files swept, the new write's files remain
    top_data = [f for f in os.listdir(top) if f.endswith("-Data.db")]
    assert top_data and all("-1-" not in f for f in top_data)
    # the nested table still reads back (scan is recursive by design)
    got = (spark.read.format("sstable").load(nested)
           .select("key").collect())
    assert {bytes(r["key"]) for r in got} == {b"k2"}


def test_minhash_incremental_matches_batch(spark):
    """Incremental dedup (new batch vs stored profiles) must agree
    with the batch pipeline run over the full corpus, restricted to
    pairs touching the new batch — same candidates, same Jaccard —
    and must never emit stored×stored pairs."""
    from sstable_hadoop_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_dedup_pairs,
        minhash_profiles,
    )
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    split = 400
    stored = minhash_profiles(docs.filter(F.col("doc_id") < split),
                              num_perm=16, max_doc_freq=None)
    inc = minhash_dedup_incremental(
        docs.filter(F.col("doc_id") >= split), stored,
        num_perm=16, bands=4, min_jaccard=0.5, max_doc_freq=None)
    got = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6)
           for r in inc.collect()}
    # orientation contract: id_a is always new
    assert all(a >= split for a, _ in got)

    batch = minhash_dedup_pairs(docs, num_perm=16, bands=4,
                                min_jaccard=0.5, max_doc_freq=None)
    want = {}
    for r in batch.collect():
        a, b = r["id_a"], r["id_b"]
        if a >= split or b >= split:   # touching the new batch
            # re-orient to new-first as the incremental contract does
            if a >= split:
                want[(a, b)] = round(r["jaccard"], 6)
            else:
                want[(b, a)] = round(r["jaccard"], 6)
    assert got == want and got  # equal and non-trivial


def test_shuffle_shards_deterministic_balanced(spark):
    """Shard assignment and within-shard order are pure functions of
    the id (row-order independent), shards are reasonably balanced,
    and positions are a dense 1..n_k sequence per shard."""
    from collections import Counter

    from sstable_hadoop_spark.operators.corpus import shuffle_shards
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shuffle_shards(docs, n_shards=8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in shuffle_shards(docs.orderBy(F.desc("doc_id")),
                                 n_shards=8).collect()}
    assert a == b                      # row-order independence
    counts = Counter(s for s, _ in a.values())
    n = len(a)
    assert len(counts) == 8
    assert max(counts.values()) < 2 * n / 8   # md5 balance
    for shard, k in counts.items():
        poss = sorted(p for s, p in a.values() if s == shard)
        assert poss == list(range(1, k + 1))  # dense ranks
    # the shuffle decorrelates source order: adjacent ids rarely stay
    # adjacent (same shard AND consecutive positions)
    adjacent = sum(
        1 for i in sorted(a)[:-1]
        if i + 1 in a and a[i][0] == a[i + 1][0]
        and abs(a[i][1] - a[i + 1][1]) == 1)
    assert adjacent < n * 0.05


def test_zorder_key_matches_reference_and_bounds(spark):
    from sstable_hadoop_spark.operators.layout import zorder_key

    df = spark.range(0, 512).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % 512).alias("y"))
    rows = df.withColumn("z", zorder_key("x", "y", bits=9)).collect()

    def morton(x, y, bits=9):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert all(r["z"] == morton(r["x"], r["y"]) for r in rows)
    # clamping: negatives floor to 0, overflow saturates
    one = spark.createDataFrame([(-5, 1 << 40)], "x long, y long") \
        .select(zorder_key("x", "y", bits=9).alias("z")).collect()[0]["z"]
    assert one == morton(0, (1 << 9) - 1)
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key("x", "y", bits=32)
    with pytest.raises(ValueError, match="two columns"):
        zorder_key("x")


def test_zorder_layout_prunes_on_every_column(spark, tmp_path):
    """The clustered layout's row-group stats must prune scans for
    predicates on EITHER z-ordered column; a single-column sort only
    prunes its leading column (full scan on the other).  Metrics come
    from the scan node itself, so this measures real parquet
    row-group pruning, not plan shape."""
    from sstable_hadoop_spark.operators.layout import write_zordered

    df = spark.range(0, 4096).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % 4096).alias("y"))
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(df, zdir, ["x", "y"], n_files=16, bits=12)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.parquet(xdir))

    def scan_rows(path, pred):
        sdf = spark.read.parquet(path).filter(pred)
        sdf.collect()
        return (sdf._jdf.queryExecution().executedPlan()
                .collectLeaves().apply(0)
                .metrics().apply("numOutputRows").value())

    x_pred = "x BETWEEN 1000 AND 1200"
    y_pred = "y BETWEEN 2000 AND 2200"
    # z-order: meaningful pruning on both columns individually
    assert scan_rows(zdir, x_pred) <= 4096 / 2
    assert scan_rows(zdir, y_pred) <= 4096 / 2
    # x-sort: optimal on x, useless on y — the 100 TB failure mode
    assert scan_rows(xdir, x_pred) <= 4096 / 4
    assert scan_rows(xdir, y_pred) == 4096


def test_minhash_incremental_overlap_replay_safe(spark):
    """An id present in BOTH the new batch and the stored profiles
    (crash-replay state) must not produce jaccard-1.0 self-pairs or
    doubled rows — replay output equals first-run output."""
    from sstable_hadoop_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_profiles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "p q r s t u v w"), (4, "z y x w v u t s")],
        "doc_id bigint, text string")
    new = docs.filter(F.col("doc_id") <= 2)
    clean_store = minhash_profiles(docs.filter(F.col("doc_id") >= 3),
                                   num_perm=16, max_doc_freq=None)
    # replayed store: the batch's own profiles already landed in it
    dirty_store = clean_store.unionByName(
        minhash_profiles(new, num_perm=16, max_doc_freq=None))

    def pairs(store):
        return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 6))
                      for r in minhash_dedup_incremental(
                          new, store, num_perm=16, bands=4,
                          min_jaccard=0.5, max_doc_freq=None).collect())

    first = pairs(clean_store)
    replay = pairs(dirty_store)
    assert first == replay == [(1, 2, 1.0)]


def test_pq_adc_recall_and_code_shape(spark):
    """PQ/ADC top-k (r6): codes have m entries in [0, k_codes); the
    ADC ranking's top-5 overlaps the exact cosine top-5 (recall on the
    test corpus); pre-encoded codes give the identical result without
    touching vectors (the production encode-once path)."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_pq,
        pq_encode,
        train_pq_codebooks,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id")
    books = train_pq_codebooks(emb, m=4, k_codes=16)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    assert all(len(c) == 16 for b in books for c in b)

    codes = pq_encode(emb, books)
    crows = codes.collect()
    assert all(len(r["codes"]) == 4 for r in crows)
    assert all(0 <= c < 16 for r in crows for c in r["codes"])

    got = cosine_topk_pq(emb, q, k=5, codebooks=books).collect()
    # ADC scores must equal dot(q_unit, PQ reconstruction) exactly —
    # verified independently in numpy (the scoring math, not recall:
    # the test embeddings are near-random, where PQ recall is
    # legitimately weak; recall is asserted on clustered data below)
    import numpy as np

    V = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    C = {r["id"]: r["codes"] for r in crows}
    B = [np.array(b) for b in books]
    for r in got[:10]:
        qv = V[r["query_id"]]
        qu = qv / np.linalg.norm(qv)
        rec = np.concatenate([B[j][C[r["vec_id"]][j]] for j in range(4)])
        assert abs(r["adc"] - float(np.dot(qu, rec))) < 1e-9

    # encode-once path: searching the stored codes table is identical
    again = cosine_topk_pq(emb, q, k=5, codebooks=books,
                           codes=codes).collect()
    assert {(r["query_id"], r["vec_id"], r["rk"]) for r in again} == \
        {(r["query_id"], r["vec_id"], r["rk"]) for r in got}


def test_pq_training_deterministic(spark):
    """Two trainings on reshuffled input produce bitwise-identical
    codebooks (the property the pinned oracle rests on)."""
    from sstable_hadoop_spark.operators.similarity import (
        train_pq_codebooks,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding",
                              lambda x: x.cast("double")).alias("embedding"))
    b1 = train_pq_codebooks(emb, m=4, k_codes=8, n_iter=3)
    b2 = train_pq_codebooks(emb.orderBy(F.desc("vec_id")).repartition(7),
                            m=4, k_codes=8, n_iter=3)
    assert b1 == b2


def test_duplicate_ngram_spans_hand_checked(spark):
    """Three docs: A and B share one 4-gram run, C is disjoint."""
    from sstable_hadoop_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a very quick brown fox jumps over me today"),
         (3, "completely different words in this document here now")],
        "doc_id bigint, text string")
    out = {r["id"]: (r["n_grams"], r["n_dup_grams"],
                     float(r["dup_fraction"]))
           for r in duplicate_ngram_spans(docs, n=4, min_df=2).collect()}
    # doc1: 6 grams; shared with doc2: 'quick brown fox jumps',
    # 'brown fox jumps over' => 2 dup grams
    assert out[1] == (6, 2, round(2 / 6, 6))
    assert out[2] == (6, 2, round(2 / 6, 6))
    assert out[3] == (5, 0, 0.0)


def test_remove_duplicate_spans_hand_checked(spark):
    """r7 acting half: covered positions are deleted, order preserved,
    short and disjoint docs untouched, null text tolerated."""
    from sstable_hadoop_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "X the quick brown fox jumps over the lazy dog Y"),
         (3, "completely different words in this document here now"),
         (4, "tiny"),
         (5, None)],
        "doc_id bigint, text string")
    out = {r["id"]: r for r in
           remove_duplicate_spans(docs, n=9, min_df=2).collect()}
    # the whole 9-word run is one shared 9-gram: doc1 vanishes, doc2
    # keeps only its unique frame words (lower-cased rebuild)
    assert out[1]["text"] == "" and out[1]["n_removed"] == 9
    assert out[2]["text"] == "x y" and out[2]["n_removed"] == 9
    assert out[2]["n_words"] == 11
    assert out[3]["text"].startswith("completely different")
    assert out[3]["n_removed"] == 0
    assert out[4]["text"] == "tiny" and out[4]["n_removed"] == 0
    assert out[5]["text"] == "" and out[5]["n_removed"] == 0

    # row-order invariance (same set regardless of partitioning)
    again = {r["id"]: r["text"] for r in remove_duplicate_spans(
        docs.orderBy(F.desc("doc_id")).repartition(5),
        n=9, min_df=2).collect()}
    assert again == {i: out[i]["text"] for i in out}


def test_winner_diff_hand_checked(spark):
    """Divergence classes: only_b (cell exists only in the later
    epoch), differs (later generation won), and equal winners dropped."""
    from sstable_hadoop_spark.operators.lww import winner_diff

    schema = ("key binary, name binary, state string, data binary, "
              "timestamp long, ttl int, expiration long, generation int")
    a = spark.createDataFrame([
        (b"k1", b"c1", "NORMAL", b"v1", 100, None, None, 1),
        (b"k1", b"c2", "NORMAL", b"same", 50, None, None, 1),
    ], schema)
    b = spark.createDataFrame([
        (b"k1", b"c1", "NORMAL", b"v2", 200, None, None, 2),  # differs
        (b"k1", b"c2", "NORMAL", b"same", 50, None, None, 1),  # equal
        (b"k2", b"c1", "DELETED", None, 300, None, None, 2),   # only_b
    ], schema)
    got = {(r["key"], r["name"]): r["status"]
           for r in winner_diff(a, b).collect()}
    assert got == {(b"k1", b"c1"): "differs", (b"k2", b"c1"): "only_b"}
    # symmetric: swapping sides flips only_b to only_a
    rev = {(r["key"], r["name"]): r["status"]
           for r in winner_diff(b, a).collect()}
    assert rev == {(b"k1", b"c1"): "differs", (b"k2", b"c1"): "only_a"}


def test_pq_recall_on_clustered_data(spark):
    """Where PQ is supposed to shine — clustered vectors: top-5 ADC
    neighbors of a cluster member are (almost all) from its own
    cluster, matching the exact ranking."""
    import numpy as np

    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_pq,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 64)) * 3
    rows = []
    for ci, c in enumerate(centers):
        for i in range(12):
            v = c + rng.normal(size=64) * 0.2
            rows.append((ci * 100 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = (emb.filter(F.col("vec_id") % 100 == 0)
         .withColumnRenamed("vec_id", "query_id"))
    got = cosine_topk_pq(emb, q, k=5, m=4, k_codes=16).collect()
    exact = cosine_topk(emb, q, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_ex = {}
    for r in exact:
        by_ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    overlaps = []
    for qid, ids in by_q.items():
        # all ADC top-5 from the query's own cluster (the coarse
        # structure PQ must never miss)...
        assert all(v // 100 == qid // 100 for v in ids), (qid, ids)
        overlaps.append(len(ids & by_ex[qid]))
    # raw ADC: fine order inside a tight cluster is near-tied, so a
    # coarse mean-agreement bar only
    assert sum(overlaps) / len(overlaps) >= 2.0, overlaps
    # the production two-stage path (ADC shortlist -> exact re-rank of
    # k*4 candidates) must recover the exact top-5 exactly
    rr = cosine_topk_pq(emb, q, k=5, m=4, k_codes=16,
                        rerank_factor=4).collect()
    by_rr = {}
    for r in rr:
        by_rr.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert by_rr == by_ex, (by_rr, by_ex)


def test_mixture_sample_budget_and_greedy_prefix(spark):
    """Every admitted doc's running total stays within its shard
    budget; the admitted set is exactly a priority-order prefix per
    (source, shard); unbudgeted sources are dropped."""
    from sstable_hadoop_spark.operators.corpus import mixture_sample

    docs = _docs(spark)
    budgets = {"src0": 200, "src1": 120}
    out = mixture_sample(docs, budgets, n_shards=4).collect()
    assert out, "budgets should admit at least one doc"
    assert {r["source"] for r in out} <= set(budgets)
    per_shard: dict = {}
    for r in out:
        k = (r["source"], r["shard"])
        per_shard.setdefault(k, []).append(r)
    for (src, shard), rows in per_shard.items():
        b = budgets[src] // 4 + (1 if shard < budgets[src] % 4 else 0)
        tot = sum(r["n_tokens"] for r in rows)
        assert tot <= b
        assert max(r["cum_tokens"] for r in rows) == tot

    # greedy prefix: recompute priorities for ALL docs of a budgeted
    # source-shard; admitted ids must be the maximal prefix fitting b
    import hashlib

    rows = [(r["doc_id"],
             len(str(r["text"]).lower().split()),
             r["source"]) for r in docs.collect()
            if r["source"] in budgets]
    for (src, shard), admitted in per_shard.items():
        pool = []
        for did, ntok, s in rows:
            if s != src:
                continue
            h = hashlib.md5(f"mix:{did}".encode()).hexdigest()[:8]
            if int(h, 16) % 4 == shard:
                pool.append((h, did, ntok))
        pool.sort()
        b = budgets[src] // 4 + (1 if shard < budgets[src] % 4 else 0)
        expect, cum = [], 0
        for h, did, ntok in pool:
            if cum + ntok > b:
                break
            cum += ntok
            expect.append(did)
        assert sorted(r["id"] for r in admitted) == sorted(expect)


def test_mixture_summary_underfilled_source(spark):
    """VERDICT r6 #8: a source whose corpus underfills its budget must
    be visible in the delivery report — including a budgeted source
    with NO corpus rows at all."""
    from sstable_hadoop_spark.operators.corpus import (
        mixture_sample,
        mixture_summary,
    )

    docs = _docs(spark)
    # src0 exists and its corpus far exceeds 10_000 tokens is unlikely
    # at this fixture size → underfilled; "ghost" has zero corpus rows.
    budgets = {"src0": 10_000_000, "src1": 120, "ghost": 500}
    rep = {r["source"]: r for r in
           mixture_summary(docs, budgets, n_shards=4).collect()}
    assert set(rep) == set(budgets)  # absent sources still reported
    g = rep["ghost"]
    assert (g["admitted_docs"], g["admitted_tokens"]) == (0, 0)
    assert g["underfilled"]
    # src0's whole corpus fits under the huge budget → everything is
    # admitted, yet tokens < budget → flagged underfilled
    corpus_tokens = sum(len(str(r["text"]).lower().split())
                        for r in docs.collect() if r["source"] == "src0")
    s0 = rep["src0"]
    assert s0["admitted_tokens"] == corpus_tokens
    assert s0["underfilled"]
    # a filled source agrees with mixture_sample's admitted rows
    adm = mixture_sample(docs, budgets, n_shards=4).collect()
    s1_tokens = sum(r["n_tokens"] for r in adm if r["source"] == "src1")
    assert rep["src1"]["admitted_tokens"] == s1_tokens
    assert rep["src1"]["budget"] == 120


def test_mixture_sample_row_order_invariant(spark):
    from sstable_hadoop_spark.operators.corpus import mixture_sample

    docs = _docs(spark)
    budgets = {"src2": 150, "src3": 90}
    a = {(r["id"], r["cum_tokens"])
         for r in mixture_sample(docs, budgets).collect()}
    b = {(r["id"], r["cum_tokens"])
         for r in mixture_sample(
             docs.orderBy(F.desc("doc_id")).repartition(7),
             budgets).collect()}
    assert a == b and a


def test_sessionize_hand_checked(spark):
    """30-min gap boundaries, first-event session open, tied
    timestamps share a session, per-user independence."""
    from sstable_hadoop_spark.operators.sessions import (
        session_rollup,
        sessionize,
    )

    m = 60 * 1_000_000  # one minute in µs
    df = spark.createDataFrame(
        [(1, 0 * m, 1.0),        # u1 s1
         (1, 10 * m, 2.0),       # u1 s1 (10 min gap)
         (1, 41 * m, 4.0),       # u1 s2 (31 min gap > 30)
         (1, 41 * m, 8.0),       # u1 s2 (tied ts)
         (1, 71 * m, 16.0),      # u1 s2 (exactly 30 min: NOT new)
         (2, 500 * m, 1.5)],     # u2 s1
        "user_id bigint, t long, value double")
    s = sessionize(df, F.col("t"), gap_us=30 * m)
    got = {(r["user_id"], r["t"], r["session_seq"]) for r in s.collect()}
    assert got == {(1, 0, 1), (1, 10 * m, 1), (1, 41 * m, 2),
                   (1, 71 * m, 2), (2, 500 * m, 1)} | {(1, 41 * m, 2)}
    roll = {(r["user_id"], r["session_seq"]):
            (r["n_events"], r["span_us"], r["sum_value"])
            for r in session_rollup(df, F.col("t"),
                                    gap_us=30 * m).collect()}
    assert roll == {(1, 1): (2, 10 * m, 3.0),
                    (1, 2): (3, 30 * m, 28.0),
                    (2, 1): (1, 0, 1.5)}


def test_bucketed_layout_redeclare_roundtrip(spark, tmp_path):
    """write_bucketed leaves plain parquet + bucket-suffixed names;
    bucketed_table re-declares the catalog entry over the same files
    (as a fresh session must) and the declared table both matches the
    data and plans aggregation without an Exchange."""
    from sstable_hadoop_spark.operators.layout import (
        bucketed_table,
        write_bucketed,
    )

    df = spark.range(1000).selectExpr(
        "id % 37 AS k", "id AS v").repartition(5)
    d = str(tmp_path / "bkt")
    write_bucketed(df, d, "bkt_t", bucket_by=("k",), n_buckets=4,
                   sort_by=("k",))
    # writer's throwaway catalog entries are gone, files remain
    assert not [t.name for t in spark.catalog.listTables()
                if t.name.startswith("bkt_t_writer")]
    spark.sql("DROP TABLE IF EXISTS bkt_t")  # simulate a new session
    t = bucketed_table(spark, "bkt_t", d, "k BIGINT, v BIGINT",
                       bucket_by=("k",), n_buckets=4, sort_by=("k",))
    assert t.count() == 1000
    agg = t.groupBy("k").sum("v")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    got = {(r["k"], r["sum(v)"]) for r in agg.collect()}
    want = {(k, sum(range(k, 1000, 37))) for k in range(37)}
    assert got == want
    # IF NOT EXISTS: re-declaring in the same session is a no-op
    bucketed_table(spark, "bkt_t", d, "k BIGINT, v BIGINT",
                   bucket_by=("k",), n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS bkt_t")


def test_bucket_id_matches_spark_writer(spark, tmp_path):
    """layout.bucket_id must compute EXACTLY the bucket Spark's
    bucketed writer assigned each row to (pmod(murmur3-seed-42, n) ==
    the _NNNNN file-name infix) — the invariant every selective-rewrite
    claim rests on.  Checked for a bigint key and a binary key."""
    from sstable_hadoop_spark.operators.layout import (
        bucket_files,
        bucket_id,
        write_bucketed,
    )

    for expr, dt in (("id", "bigint"), ("encode(cast(id AS string), "
                                        "'UTF-8')", "binary")):
        df = spark.range(500).selectExpr(f"{expr} AS k", "id AS v")
        d = str(tmp_path / f"b_{dt}")
        write_bucketed(df, d, f"bid_{dt}", bucket_by=("k",), n_buckets=7)
        by_bucket = bucket_files(d)
        got = spark.read.parquet(d).select(
            "k", bucket_id(7, "k").alias("b"),
            F.input_file_name().alias("f")).collect()
        assert len(got) == 500
        for r in got:
            owner = [b for b, fs in by_bucket.items()
                     if any(r["f"].endswith(os.path.basename(p))
                            for p in fs)]
            assert owner == [r["b"]], (dt, r["k"], owner, r["b"])


def test_bucketed_upsert_selective_and_idempotent(spark, tmp_path):
    """bucketed_upsert rewrites ONLY the buckets containing delta keys
    (untouched bucket files stay byte-identical under the same names),
    the read-back equals a full re-merge, and re-applying the same
    delta is a no-op on content."""
    import hashlib

    from sstable_hadoop_spark.operators.layout import (
        bucket_files,
        bucket_id,
        bucketed_upsert,
        write_bucketed,
    )
    from sstable_hadoop_spark.operators.lww import lww_cell, lww_refresh

    def cells(rows):
        return spark.createDataFrame(
            rows, "key binary, name binary, state string, data binary, "
                  "timestamp long, ttl long, expiration long, "
                  "generation int")

    base_rows = [(f"k{i:03d}".encode(), b"c", "NORMAL",
                  f"v{i}".encode(), 100 + i, None, None, 1)
                 for i in range(200)]
    delta_keys = [f"k{i:03d}".encode() for i in (3, 7)]
    delta_rows = [(k, b"c", "NORMAL", b"new", 10_000, None, None, 2)
                  for k in delta_keys] + [
                 (b"brand_new", b"c", "DELETED", None, 10_001, None,
                  None, 2)]

    d = str(tmp_path / "ups")
    write_bucketed(lww_cell(cells(base_rows)), d, "ups_t",
                   bucket_by=("key",), n_buckets=8,
                   sort_by=("key", "name"))

    def digest():
        return {f: hashlib.md5(open(f, "rb").read()).hexdigest()
                for fs in bucket_files(d).values() for f in fs}

    before = digest()
    delta = cells(delta_rows)
    expect = sorted(r[0] for r in delta.select(
        bucket_id(8, "key").alias("b")).distinct().collect())
    affected = bucketed_upsert(spark, d, delta, lww_refresh,
                               bucket_by=("key",), n_buckets=8,
                               sort_by=("key", "name"))
    assert affected == expect and 0 < len(affected) < 8
    after = digest()
    untouched_b = set(range(8)) - set(affected)
    by_bucket = bucket_files(d)
    for b in untouched_b:  # same files, same bytes
        for f in by_bucket.get(b, ()):
            assert after[f] == before[f], (b, f)
    assert any(f not in before for f in after)  # affected replaced

    got = {(bytes(r["key"]), r["timestamp"], bytes(r["data"] or b""))
           for r in spark.read.parquet(d).collect()}
    want = {(bytes(r["key"]), r["timestamp"], bytes(r["data"] or b""))
            for r in lww_cell(
                cells(base_rows).unionByName(delta)).collect()}
    assert got == want
    # tombstone winner for the new key is STORED (not suppressed)
    assert (b"brand_new", 10_001, b"") in got

    bucketed_upsert(spark, d, delta, lww_refresh, bucket_by=("key",),
                    n_buckets=8, sort_by=("key", "name"))
    got2 = {(bytes(r["key"]), r["timestamp"])
            for r in spark.read.parquet(d).collect()}
    assert got2 == {(k, t) for k, t, _ in got}


def test_bucketed_upsert_rejects_out_of_bucket_merge(spark, tmp_path):
    """A merge() that manufactures keys outside the delta's buckets
    must fail loudly BEFORE any file is touched, not corrupt the
    untouched buckets' invariant."""
    import pytest as _pytest

    from sstable_hadoop_spark.operators.layout import (
        bucket_files,
        bucketed_upsert,
        write_bucketed,
    )

    df = spark.range(100).selectExpr("id AS k", "id AS v")
    d = str(tmp_path / "oob")
    write_bucketed(df, d, "oob_t", bucket_by=("k",), n_buckets=8)
    before = {f for fs in bucket_files(d).values() for f in fs}
    delta = spark.range(1).selectExpr("3 AS k", "999 AS v")
    from sstable_hadoop_spark.operators.layout import bucket_id
    delta_b = delta.select(bucket_id(8, "k")).head()[0]
    outside = next(  # first key hashing OUTSIDE the delta's bucket
        r["k"] for r in spark.range(100).selectExpr("id AS k")
        .withColumn("b", bucket_id(8, "k")).collect()
        if r["b"] != delta_b)

    def bad_merge(stored, dl):
        return stored.unionByName(dl).unionByName(
            spark.range(1).selectExpr(f"{outside}L AS k", "0L AS v"))

    with _pytest.raises(ValueError, match="unaffected buckets"):
        bucketed_upsert(spark, d, delta, bad_merge,
                        bucket_by=("k",), n_buckets=8)
    assert {f for fs in bucket_files(d).values() for f in fs} == before


def test_bucketed_upsert_file_uri(spark, tmp_path):
    """VERDICT r6 #4: the merge-on-write swap runs over a scheme'd
    ``file://`` table — listing, staging upload, removes and renames
    all route through sources/fs instead of os/shutil."""
    from sstable_hadoop_spark.operators.layout import (
        bucket_files,
        bucketed_upsert,
        write_bucketed,
    )

    d = str(tmp_path / "upsfs")
    base = spark.range(100).selectExpr("id AS k", "id AS v")
    write_bucketed(base, d, "upsfs_t", bucket_by=("k",), n_buckets=4)
    uri = f"file://{d}"
    assert bucket_files(uri), "scheme'd listing must see the table"
    delta = spark.range(5).selectExpr("id AS k", "id + 1000 AS v")

    def newest(stored, dl):
        from pyspark.sql import functions as FF

        return (stored.unionByName(dl).groupBy("k")
                .agg(FF.max("v").alias("v")))

    affected = bucketed_upsert(spark, uri, delta, newest,
                               bucket_by=("k",), n_buckets=4)
    assert affected
    got = {r["k"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert got == {k: (k + 1000 if k < 5 else k) for k in range(100)}


def test_bucketed_upsert_crash_recovery(spark, tmp_path):
    """The marker protocol: a table torn after the commit marker rolls
    FORWARD (marker's removes+renames replayed), a torn stage without
    a marker rolls BACK, and bucket_files refuses to serve a torn
    table silently (ADVICE r6)."""
    import json
    import os
    import shutil

    import pytest as _pytest

    from sstable_hadoop_spark.operators.layout import (
        UPSERT_MARKER,
        bucket_files,
        recover_upsert,
        write_bucketed,
    )

    d = str(tmp_path / "rec")
    write_bucketed(spark.range(50).selectExpr("id AS k", "id AS v"),
                   d, "rec_t", bucket_by=("k",), n_buckets=4)
    clean = {r["k"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert recover_upsert(d) == "clean"

    # -- crash AFTER the commit marker: final file hidden under its
    #    dot-name + marker present → roll forward restores it
    victim = next(f for fs2 in bucket_files(d).values() for f in fs2)
    dot = os.path.join(d, "." + os.path.basename(victim))
    os.replace(victim, dot)
    with open(os.path.join(d, UPSERT_MARKER), "w") as f:
        json.dump({"removes": [], "renames": [[dot, victim]]}, f)
    with _pytest.raises(RuntimeError, match="interrupted"):
        bucket_files(d)
    assert recover_upsert(d) == "rolled_forward"
    assert os.path.exists(victim) and not os.path.exists(dot)
    assert {r["k"]: r["v"]
            for r in spark.read.parquet(d).collect()} == clean

    # -- crash MID-STAGE (no marker): orphan dot copy → rolled back
    shutil.copyfile(victim, dot)
    with _pytest.raises(RuntimeError, match="interrupted"):
        bucket_files(d)
    assert recover_upsert(d) == "rolled_back"
    assert not os.path.exists(dot)
    assert {r["k"]: r["v"]
            for r in spark.read.parquet(d).collect()} == clean

    # -- TORN marker (unreadable JSON at the marker name): since r8's
    #    atomic publish our writer cannot produce one, so it signals a
    #    pre-r8 power loss where the removes may have persisted and
    #    the dots may be the only copies — rolled back, but the dots
    #    are QUARANTINED (renamed aside, hidden) instead of deleted
    shutil.copyfile(victim, dot)
    with open(os.path.join(d, UPSERT_MARKER), "w") as f:
        f.write('{"removes": ["' + victim)  # truncated mid-write
    assert recover_upsert(d) == "rolled_back"
    assert not os.path.exists(os.path.join(d, UPSERT_MARKER))
    assert not os.path.exists(dot)
    assert os.path.exists(dot + ".quarantined")  # copy preserved
    assert os.path.exists(victim)
    assert {r["k"]: r["v"]
            for r in spark.read.parquet(d).collect()} == clean
    # quarantined files are invisible to the torn-table check (the
    # table reads normally) but table_health surfaces them
    from sstable_hadoop_spark.operators.layout import table_health

    bucket_files(d)  # no raise
    note = [r["note"] for r in table_health(spark, d, 4).collect()
            if r["bucket"] == "_table"][0]
    assert "quarantined" in note
    os.remove(dot + ".quarantined")

    # -- stranded atomic-publish temp (crash between the marker temp's
    #    write and its rename): reaped by recovery, nothing else moves
    tmp = os.path.join(d, "." + UPSERT_MARKER + ".tmp-deadbeef")
    with open(tmp, "w") as f:
        f.write('{"removes": []')
    assert recover_upsert(d) == "clean"
    assert not os.path.exists(tmp)
    assert {r["k"]: r["v"]
            for r in spark.read.parquet(d).collect()} == clean


def test_bucketed_upsert_single_writer_lease(spark, tmp_path):
    """r7: the single-writer contract is enforced — a live lease makes
    a second writer fail loudly (TableLockedError) before touching any
    file; a stale lease (crashed writer) is stolen; success releases
    the lease."""
    import json
    import os
    import time

    import pytest as _pytest

    from pyspark.sql import functions as FF

    from sstable_hadoop_spark.operators.layout import (
        UPSERT_LOCK,
        TableLockedError,
        bucket_files,
        bucketed_upsert,
        write_bucketed,
    )

    d = str(tmp_path / "lease")
    write_bucketed(spark.range(40).selectExpr("id AS k", "id AS v"),
                   d, "lease_t", bucket_by=("k",), n_buckets=4)
    delta = spark.range(3).selectExpr("id AS k", "id + 100 AS v")

    def newest(stored, dl):
        return (stored.unionByName(dl).groupBy("k")
                .agg(FF.max("v").alias("v")))

    # live foreign lease → loud failure, table untouched.  The lease
    # is a SIBLING of the table dir (in-table would be wiped by the
    # bootstrap CTAS overwrite — review r7)
    from sstable_hadoop_spark.operators.layout import _lock_path

    lock = _lock_path(d)
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "other",
                   "acquired_at": time.time()}, f)
    before = {f for fs2 in bucket_files(d).values() for f in fs2}
    with _pytest.raises(TableLockedError, match="locked by"):
        bucketed_upsert(spark, d, delta, newest,
                        bucket_by=("k",), n_buckets=4)
    assert {f for fs2 in bucket_files(d).values() for f in fs2} == before

    # same-host holder whose pid is provably dead → stolen even while
    # fresh (a crash-restart must not block for the whole ttl)
    import socket
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()  # reaped → the pid no longer exists
    dead_pid = proc.pid
    with open(lock, "w") as f:
        json.dump({"pid": dead_pid, "host": socket.gethostname(),
                   "acquired_at": time.time()}, f)
    bucketed_upsert(spark, d, delta, newest,
                    bucket_by=("k",), n_buckets=4)
    assert not os.path.exists(lock)

    # stale lease (older than ttl) → stolen, upsert proceeds, lease
    # released afterwards
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "other",
                   "acquired_at": time.time() - 10_000}, f)
    affected = bucketed_upsert(spark, d, delta, newest,
                               bucket_by=("k",), n_buckets=4)
    assert affected
    assert not os.path.exists(lock)
    got = {r["k"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert got == {k: (k + 100 if k < 3 else k) for k in range(40)}


def test_lease_steal_arbitration_single_winner(tmp_path):
    """r8: stale-lease steals are flock-serialized — N thieves racing
    the SAME stale lease produce exactly one winner; the losers see
    the winner's fresh payload inside the critical section and back
    off with TableLockedError (the r7 replace+settle+read-back let two
    healthy thieves both pass verification)."""
    import json
    import os
    import threading
    import time

    from sstable_hadoop_spark.operators.layout import (
        TableLockedError,
        _acquire_table_lock,
        _lock_path,
    )

    d = str(tmp_path / "t")
    os.makedirs(d)
    lock = _lock_path(d)
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "other",
                   "acquired_at": time.time() - 10_000}, f)

    results: list[tuple[str, object]] = []
    barrier = threading.Barrier(6)

    def thief():
        barrier.wait()
        try:
            results.append(("won", _acquire_table_lock(d, 600.0)[1]))
        except TableLockedError:
            results.append(("lost", None))

    threads = [threading.Thread(target=thief) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [tok for kind, tok in results if kind == "won"]
    assert len(winners) == 1, f"expected one winner, got {results}"
    # the lock on disk carries the winner's token
    with open(lock) as f:
        assert json.load(f)["token"] == winners[0]


def test_write_bytes_atomic_publish(tmp_path):
    """write_bytes_atomic: content lands whole, overwrites atomically,
    and leaves no temp siblings behind."""
    import os

    from sstable_hadoop_spark.sources import fs as fsmod

    target = str(tmp_path / "dir" / "state.json")
    os.makedirs(os.path.dirname(target))
    fsmod.write_bytes_atomic(target, b"v1")
    assert fsmod.read_bytes(target) == b"v1"
    fsmod.write_bytes_atomic(target, b"v2-longer")
    assert fsmod.read_bytes(target) == b"v2-longer"
    leftovers = [n for n in os.listdir(os.path.dirname(target))
                 if n != "state.json"]
    assert leftovers == []


def test_table_health_reports_buckets_and_torn_state(spark, tmp_path):
    """table_health: per-bucket files/bytes, empty flags, and torn-swap
    notes — read-only (the torn table is NOT repaired by reporting)."""
    import json
    import shutil

    from sstable_hadoop_spark.operators.layout import (
        UPSERT_MARKER,
        bucket_files,
        recover_upsert,
        table_health,
        write_bucketed,
    )

    d = str(tmp_path / "health")
    write_bucketed(spark.range(60).selectExpr("id AS k", "id AS v"),
                   d, "health_t", bucket_by=("k",), n_buckets=4)
    rep = {r["bucket"]: r for r in table_health(spark, d, 4).collect()}
    assert set(rep) == {"0", "1", "2", "3", "_table"}
    assert rep["_table"]["note"] == ""
    assert rep["_table"]["n_files"] == sum(
        rep[str(b)]["n_files"] for b in range(4))
    assert rep["_table"]["n_bytes"] > 0 and not rep["_table"]["empty"]

    # tear the table: hide one bucket file + leave a marker
    victim = next(f for fs2 in bucket_files(d).values() for f in fs2)
    dot = os.path.join(d, "." + os.path.basename(victim))
    shutil.move(victim, dot)
    with open(os.path.join(d, UPSERT_MARKER), "w") as f:
        json.dump({"removes": [], "renames": [[dot, victim]]}, f)
    notes = {r["bucket"]: r["note"]
             for r in table_health(spark, d, 4).collect()}["_table"]
    assert "commit-marker" in notes and "dot-staged" in notes
    assert os.path.exists(dot)  # read-only: nothing repaired
    assert recover_upsert(d) == "rolled_forward"
    assert table_health(spark, d, 4).collect()  # clean again
    assert {r["bucket"]: r["note"] for r in
            table_health(spark, d, 4).collect()}["_table"] == ""


def test_lease_release_and_assert_are_ownership_checked(tmp_path):
    """r7 review: release must never delete a thief's lease, and the
    pre-commit assertion must fail loudly when the lease was lost."""
    import json

    import pytest as _pytest

    from sstable_hadoop_spark.operators.layout import (
        UPSERT_LOCK,
        TableLockedError,
        _assert_lease_held,
        _release_table_lock,
    )

    d = tmp_path / "own"
    d.mkdir()
    lock = str(d / UPSERT_LOCK)
    with open(lock, "w") as f:
        json.dump({"token": "thief"}, f)
    _release_table_lock(lock, "mine")      # not ours → left in place
    assert os.path.exists(lock)
    with _pytest.raises(TableLockedError, match="lease .* was lost"):
        _assert_lease_held(lock, "mine", "the commit marker write")
    _assert_lease_held(lock, "thief", "x")  # holder passes
    _release_table_lock(lock, "thief")      # ours → removed
    assert not os.path.exists(lock)


def test_bucket_files_custom_scheme_not_silent_empty(spark, tmp_path):
    """ADVICE r6: on a remote (mounted-scheme) table dir bucket_files
    must see the files — the old os.listdir path returned {} and the
    streaming sink would have re-bootstrapped mode('overwrite') over
    every prior batch."""
    from pyarrow import fs as pafs

    from sstable_hadoop_spark.operators.layout import bucket_files
    from sstable_hadoop_spark.operators.layout import (
        write_bucketed,
    )
    from sstable_hadoop_spark.sources import fs

    root = tmp_path / "memroot"
    root.mkdir()
    write_bucketed(spark.range(20).selectExpr("id AS k", "id AS v"),
                   str(root / "tbl"), "memtbl_t",
                   bucket_by=("k",), n_buckets=4)
    fs.register_scheme("mem3", pafs.SubTreeFileSystem(
        str(root), pafs.LocalFileSystem()))
    by_bucket = bucket_files("mem3://tbl")
    assert by_bucket, "remote listing silently empty"
    assert all(f.startswith("mem3://") for fs2 in by_bucket.values()
               for f in fs2)
    # absent table still lists empty (bootstrap case), not an error
    assert bucket_files("mem3://nope") == {}


def test_profile_table_modes_and_edges(spark):
    """profile_table: exact mode vs hand-computed stats on a table
    with NULLs, an all-NULL column, and an unrenderable (binary)
    column; approx mode matches exact within HLL tolerance and shares
    every non-cardinality column."""
    from sstable_hadoop_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", b"x", 1.5), (2, "bb", b"y", None),
         (2, None, b"z", 9.25), (7, "bb", b"w", None)],
        "k int, s string, b binary, v double")
    df = df.withColumn("all_null", F.lit(None).cast("int"))

    exact = {r["col_name"]: r for r in
             profile_table(df, exact=True).collect()}
    assert set(exact) == {"k", "s", "b", "v", "all_null"}
    k = exact["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_val"], k["max_val"]) == ("1.000000", "7.000000")
    assert k["total_len"] == 4 * len("1.000000")
    s = exact["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_val"], s["max_val"]) == ("a", "bb")
    assert s["total_len"] == 1 + 2 + 2
    v = exact["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (2, 2)
    assert (v["min_val"], v["max_val"]) == ("1.500000", "9.250000")
    b = exact["b"]  # unrenderable: range NULL, length over NULL = 0
    assert (b["n_distinct"], b["min_val"], b["max_val"],
            b["total_len"]) == (4, None, None, 0)
    an = exact["all_null"]
    assert (an["n_nulls"], an["n_distinct"], an["min_val"],
            an["total_len"]) == (4, 0, None, 0)

    approx = {r["col_name"]: r for r in profile_table(df).collect()}
    for c in exact:
        for f in ("n_rows", "n_nulls", "min_val", "max_val",
                  "total_len", "data_type"):
            assert approx[c][f] == exact[c][f], (c, f)
        # tiny cardinalities: HLL++ is exact at this scale
        assert approx[c]["n_distinct"] == exact[c]["n_distinct"]


def test_profile_plan_single_scan_no_join(spark):
    """Both modes profile in ONE scan of the table — no join, no
    cartesian, and the only exchange(s) are the global-aggregation
    shuffle (plus Expand's, in exact mode)."""
    from sstable_hadoop_spark.operators.profile import profile_table
    from sstable_hadoop_spark.queries import load

    for exact in (False, True):
        df = profile_table(load(spark, "/root/testdata/sf0.001",
                                "orders"),
                           ["o_orderkey", "o_orderstatus"],
                           exact=exact)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, plan
        assert plan.count("Scan parquet") + plan.count(
            "BatchScan") == 1, plan


def test_quality_filter_rank_vs_threshold(spark):
    """quality_filter: rank mode keeps exactly ceil(frac·n) per group
    (a hand-checkable subset ordered by quality), threshold mode
    approximates the same selection WITHOUT sorting the corpus (no
    per-group Sort under the filter; thresholds broadcast), and both
    agree on clearly-above-threshold docs."""
    from sstable_hadoop_spark.operators.corpus import quality_filter
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    frac = 0.3
    rank = quality_filter(docs, frac, method="rank")
    got = rank.collect()
    sizes = {r["lang"]: r["cnt"] for r in
             docs.groupBy("lang").agg(
                 F.count("*").alias("cnt")).collect()}
    kept = {}
    for r in got:
        kept.setdefault(r["lang"], []).append(r)
    import math
    for lang, n in sizes.items():
        assert len(kept.get(lang, [])) == math.ceil(frac * n), lang
    # rank selection = top quality values of the group
    worst_kept = {lg: min(r["quality"] for r in rs)
                  for lg, rs in kept.items()}
    all_q = {}
    from sstable_hadoop_spark.operators.text import text_stats
    for r in text_stats(docs, keep=("lang",)).collect():
        all_q.setdefault(r["lang"], []).append(r["quality"])
    for lg, qs in all_q.items():
        qs = sorted(qs, reverse=True)
        assert worst_kept[lg] == qs[math.ceil(frac * len(qs)) - 1]

    thr = quality_filter(docs, frac, method="threshold")
    plan = thr._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # no per-group sort of the corpus anywhere in the threshold plan
    assert "Sort " not in plan.replace("SortAggregate", ""), plan
    tgot = {(r["doc_id"], r["lang"]) for r in thr.collect()}
    rgot = {(r["doc_id"], r["lang"]) for r in got}
    # approximate at the boundary, but within ±15% of the target size
    # per group, and every kept doc scores >= its group threshold
    tk = {}
    for d, lg in tgot:
        tk[lg] = tk.get(lg, 0) + 1
    for lg, n in sizes.items():
        assert abs(tk.get(lg, 0) - math.ceil(frac * n)) <= max(
            2, 0.15 * n), (lg, tk.get(lg), n)
    # docs strictly above every group's boundary are in BOTH
    for lg, rs in kept.items():
        for r in rs:
            if r["quality"] > worst_kept[lg]:
                assert (r["doc_id"], lg) in tgot


def test_quality_filter_validations(spark):
    from sstable_hadoop_spark.operators.corpus import quality_filter
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="method"):
        quality_filter(docs, 0.5, method="nope")
    with pytest.raises(ValueError, match="top_fraction"):
        quality_filter(docs, 0.0)
    with pytest.raises(ValueError, match="top_fraction"):
        quality_filter(docs, 1.5)


def test_build_vocab_and_oov_hand_checked(spark):
    """build_vocab: deterministic (count DESC, term ASC) ranking,
    min_count cutoff, per-term doc counts; oov_rate: exact occurrence
    accounting against that vocab, broadcast probe in the plan."""
    from sstable_hadoop_spark.operators.corpus import build_vocab, oov_rate

    docs = spark.createDataFrame(
        [(1, "en", "a b a c"), (2, "en", "b a d"), (3, "de", "d e B")],
        "doc_id long, lang string, text string")
    v = build_vocab(docs, top_n=3, min_count=2)
    got = [(r["term"], r["term_count"], r["doc_count"], r["rank"])
           for r in v.orderBy("rank").collect()]
    # a:3(2 docs) b:3(3 docs, lowercased B) d:2(2) — c,e cut by min_count
    assert got == [("a", 3, 2, 1), ("b", 3, 3, 2), ("d", 2, 2, 3)]

    rates = oov_rate(docs, v)
    plan = rates._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    by_lang = {r["lang"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
               for r in rates.collect()}
    # en: 7 tokens, 1 oov (c); de: 3 tokens, 1 oov (e)
    assert by_lang == {"en": (7, 1, round(1 / 7, 6)),
                       "de": (3, 1, round(1 / 3, 6))}


def test_build_vocab_topn_no_global_sort(spark):
    """The top-N cut plans as TakeOrderedAndProject (heap + driver
    merge of N), never a full global Sort+Exchange of the term
    counts."""
    from sstable_hadoop_spark.operators.corpus import build_vocab
    from sstable_hadoop_spark.queries import load

    v = build_vocab(load(spark, "/root/testdata/sf0.001", "documents"),
                    top_n=100, min_count=5)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_ensure_parallelism_sees_through_row_groups(spark, tmp_path):
    """A big parquet file written as ONE row group presents many
    byte-range partitions that are all empty but one; the effective-
    splits probe must catch it and repartition.  A multi-row-group
    file of the same shape must be left alone (no added shuffle)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sstable_hadoop_spark.operators._util import (
        _parquet_effective_splits,
        ensure_parallelism,
    )

    tbl = pa.table({"x": list(range(200_000)),
                    "s": ["pad" * 20] * 200_000})
    one = str(tmp_path / "one.parquet")
    many = str(tmp_path / "many.parquet")
    pq.write_table(tbl, one, row_group_size=1 << 21)
    pq.write_table(tbl, many, row_group_size=4096)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
        df1 = spark.read.parquet(one)
        assert df1.rdd.getNumPartitions() > 2  # LOOKS parallel
        assert _parquet_effective_splits(df1) == 1  # is not
        fixed = ensure_parallelism(df1)
        assert fixed.rdd.getNumPartitions() == \
            spark.sparkContext.defaultParallelism

        dfm = spark.read.parquet(many)
        assert _parquet_effective_splits(dfm) >= 16
        assert ensure_parallelism(dfm) is dfm  # untouched: no shuffle
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # non-file plans: probe answers None, repartition logic unaffected
    assert _parquet_effective_splits(
        spark.range(10).groupBy().count()) is None


def test_review_fixes_round6(spark):
    """Edge cases from the r6 self-review: decimal-exact rank cut
    (0.07·100 must keep 7, not double-ceil's 8), NULL group keys kept
    by BOTH quality_filter modes, duplicate vocab terms not inflating
    OOV denominators, and map columns profiling without crashing."""
    import math

    from sstable_hadoop_spark.operators.corpus import (
        build_vocab,
        oov_rate,
        quality_filter,
    )
    from sstable_hadoop_spark.operators.profile import profile_table

    # decimal-exact ceil: 100 docs, fraction 0.07 → exactly 7
    docs = spark.createDataFrame(
        [(i, "en", ("word " * (i + 1)).strip()) for i in range(100)],
        "doc_id long, lang string, text string")
    # note math.ceil(0.07 * 100) is 8 in doubles — the exact bug
    assert quality_filter(docs, 0.07, method="rank").count() == 7

    # NULL lang: a real group in rank mode AND threshold mode
    with_null = docs.union(spark.createDataFrame(
        [(1000 + i, None, "null lang doc " + "x " * i)
         for i in range(10)],
        "doc_id long, lang string, text string"))
    r = quality_filter(with_null, 0.5, method="rank")
    t = quality_filter(with_null, 0.5, method="threshold")
    assert r.filter(F.col("lang").isNull()).count() == 5
    assert t.filter(F.col("lang").isNull()).count() >= 5  # ties kept

    # duplicate vocab rows must not double-count matched tokens
    v = build_vocab(docs, top_n=5, min_count=1)
    dup_v = v.union(v)
    base = {(r["lang"], r["n_tokens"], r["n_oov"])
            for r in oov_rate(docs, v).collect()}
    assert {(r["lang"], r["n_tokens"], r["n_oov"])
            for r in oov_rate(docs, dup_v).collect()} == base

    # map column: n_distinct degrades to NULL instead of raising
    m = spark.range(5).selectExpr(
        "id", "map('k', cast(id AS string)) AS props")
    for exact in (False, True):
        rows = {r["col_name"]: r for r in
                profile_table(m, exact=exact).collect()}
        assert rows["props"]["n_distinct"] is None
        assert rows["props"]["n_rows"] == 5
        assert rows["id"]["n_distinct"] == 5


def test_upsert_swap_atomic_under_every_crash_point(spark, tmp_path):
    """Exhaustive crash-point sweep of the swap protocol: kill the
    writer at EVERY table-mutating fs operation (upload, marker write,
    remove, rename) in turn, run recovery, and assert the table reads
    as exactly the pre-delta or post-delta state — never a torn mix.
    Crashes strictly before the commit marker must recover BEFORE;
    crashes at-or-after it must recover AFTER."""
    import shutil

    from pyspark.sql import functions as FF

    from sstable_hadoop_spark.operators import layout
    from sstable_hadoop_spark.operators.layout import (
        _lock_path,
        bucketed_upsert,
        recover_upsert,
        write_bucketed,
    )
    from sstable_hadoop_spark.sources import fs as fsmod

    class Crash(BaseException):
        """Hard-kill simulation: not OSError, so no cleanup path
        swallows it — every later fs op in this 'process' fails too."""

    base = spark.range(80).selectExpr("id AS k", "id AS v")
    delta = spark.range(6).selectExpr("id AS k", "id + 500 AS v")

    def newest(stored, dl):
        return (stored.unionByName(dl).groupBy("k")
                .agg(FF.max("v").alias("v")))

    proto = str(tmp_path / "proto")
    write_bucketed(base, proto, "proto_t", bucket_by=("k",), n_buckets=4)
    before = {k: k for k in range(80)}
    after = {k: (k + 500 if k < 6 else k) for k in range(80)}

    mutators = ("put_file", "write_bytes", "remove", "rename")
    real = {m: getattr(fsmod, m) for m in mutators}

    def run_with_crash_at(d, crash_at):
        """Returns (crashed, marker_was_written)."""
        count = [0]
        marker_written = [False]

        def wrap(name):
            def op(*a, **kw):
                # only table-dir mutations count (stage-dir traffic and
                # the lease live elsewhere / are recovery-neutral)
                target = a[-1] if name == "rename" else a[-1] \
                    if name == "put_file" else a[0]
                counted = (isinstance(target, str) and d in target
                           and not target.endswith(".upsert-lock.json"))
                if counted:
                    if count[0] >= crash_at:
                        raise Crash(f"{name} #{count[0]}")
                    count[0] += 1
                out = real[name](*a, **kw)
                # r8: the marker is published atomically (fsync'd temp
                # + rename) — the RENAME to the marker name is the
                # commit point, not the temp's write_bytes
                if (counted and name == "rename"
                        and target.endswith(layout.UPSERT_MARKER)):
                    marker_written[0] = True
                return out
            return op

        for m in mutators:
            setattr(fsmod, m, wrap(m))
        try:
            bucketed_upsert(spark, d, delta, newest,
                            bucket_by=("k",), n_buckets=4)
            return False, marker_written[0]
        except Crash:
            return True, marker_written[0]
        finally:
            for m in mutators:
                setattr(fsmod, m, real[m])

    crash_at = 0
    while True:
        d = str(tmp_path / f"run{crash_at}")
        shutil.copytree(proto, d)
        crashed, committed = run_with_crash_at(d, crash_at)
        # the crashed writer's lease survives; expire it like a real
        # dead process before recovery takes over
        if os.path.exists(_lock_path(d)):
            os.remove(_lock_path(d))
        recover_upsert(d)
        got = {r["k"]: r["v"] for r in spark.read.parquet(d).collect()}
        if not crashed:
            assert got == after, f"clean run at K={crash_at}"
            break  # K exceeded the op count: protocol fully swept
        want = after if committed else before
        assert got == want, (
            f"crash point {crash_at} (committed={committed}) "
            f"recovered to a torn state")
        crash_at += 1
        assert crash_at < 120, "runaway op count"


def test_similarity_recall_report_floors(spark):
    """r8: the recall-vs-cost report (driver row
    `similarity_recall_report`) must certify, per ANN method, recall@5
    against brute force at or above a pinned floor — the number a user
    tunes — and the trained-codebook IVF must beat the fixed md5
    codebook (the point of training).  PQ's floor is deliberately low:
    the testdata embeddings are near-random, where 4x16 product codes
    legitimately lose most ranking signal (the clustered-data test
    above pins its real behavior)."""
    from sstable_hadoop_spark.queries import similarity_recall_report

    rep = {r["method"]: r for r in
           similarity_recall_report(spark, "/root/testdata/sf0.001")
           .collect()}
    assert set(rep) == {"lsh", "ivf", "ivf_trained", "pq", "ivfpq",
                        "sq8", "ivfsq8"}
    floors_bp = {"lsh": 6000, "ivf": 2000, "ivf_trained": 3500, "pq": 500,
                 "ivfpq": 500,
                 # 256 levels/dim keeps fine order almost exactly —
                 # int8 is the "cheap compression, full recall" tier
                 "sq8": 9500,
                 # bounded by the coarse probe (same cells as ivf),
                 # near-exact within them — so the ivf floor applies
                 "ivfsq8": 2000}
    for method, floor in floors_bp.items():
        row = rep[method]
        assert row["n_exact"] == 40 and row["n_returned"] == 40
        assert row["recall_bp"] >= floor, (
            f"{method}: recall {row['recall_bp']}bp below pinned "
            f"floor {floor}bp")
    assert rep["ivf_trained"]["recall_bp"] >= rep["ivf"]["recall_bp"], (
        "trained codebook must not lose to the md5 pseudo-codebook")


def test_mixture_holdout_partitions_corpus(spark):
    """include_holdout: admitted + holdout exactly partition the
    budgeted-source corpus, and filter(admitted) equals the default
    mode's output row-for-row."""
    from sstable_hadoop_spark.operators.corpus import mixture_sample
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    budgets = {"src0": 300, "src1": 150}
    both = mixture_sample(docs, budgets, n_shards=4,
                          include_holdout=True).cache()
    default = mixture_sample(docs, budgets, n_shards=4)
    key = lambda r: (r["id"], r["source"], r["shard"],
                     r["n_tokens"], r["cum_tokens"])
    admitted = {key(r) for r in both.filter("admitted").collect()}
    holdout = {key(r) for r in both.filter("NOT admitted").collect()}
    assert admitted == {key(r) for r in default.collect()}
    assert admitted.isdisjoint(holdout)
    n_budgeted = docs.filter(docs.source.isin(*budgets)).count()
    assert len(admitted) + len(holdout) == n_budgeted
    assert holdout, "budgets must bite for the holdout to be non-empty"
    both.unpersist()


def test_semantic_dedup_keeps_lowest_id_per_neighborhood(spark):
    import math

    from sstable_hadoop_spark.operators.dedup import semantic_dedup

    th = math.acos(0.95)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [math.cos(th), math.sin(th), 0.0, 0.0]),      # cos(1,2)=0.95
        (3, [math.cos(2 * th), math.sin(2 * th), 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),                        # distant
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    one_cell = [[1.0, 0.0, 0.0, 0.0]]  # single centroid: all rows pair
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(df, tau=0.9,
                                          cents=one_cell).collect())
    # Declarative rule: 2 dies to 1, 3 dies to 2 (even though 2 died —
    # cos(1,3)=cos(2*acos .95)=.805 < tau, but cos(2,3)=.95 >= tau).
    assert kept == [1, 4]


def test_semantic_dedup_flag_view_matches_filtered(spark):
    from sstable_hadoop_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [1.0, 0.0]), (12, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>")
    flagged = semantic_dedup(df, tau=0.99, flag_only=True).collect()
    kept_ids = sorted(r["vec_id"] for r in flagged if r["kept"] == 1)
    filt_ids = sorted(r["vec_id"]
                      for r in semantic_dedup(df, tau=0.99).collect())
    assert kept_ids == filt_ids
    assert sorted(r["vec_id"] for r in flagged) == [10, 11, 12]
    dead = [r["vec_id"] for r in flagged if r["kept"] == 0]
    # 11 is an exact copy of 10 -> same cell by construction, dropped.
    assert dead == [11]


def test_semantic_dedup_below_tau_pairs_survive(spark):
    from sstable_hadoop_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6])],  # cos = 0.8
        "vec_id bigint, embedding array<double>")
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(df, tau=0.9,
                                          cents=[[1.0, 0.0]]).collect())
    assert kept == [1, 2]


def test_ngram_lm_scores_hand_model(spark):
    import math

    from sstable_hadoop_spark.operators.text import ngram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: (r["n_grams"], r["lm_micro_nats"])
           for r in ngram_lm_scores(df).collect()}

    # Self-trained: c(a,b)=3 (x2 from doc1 + doc2), c(b,a)=1, c(b,c)=1;
    # ctx totals a:3, b:2; V=4 ({a,b,c,x}).
    def lp(c, ct, V=4):
        return math.floor(math.log((c + 1) / (ct + V)) * 1e6)

    assert out[1] == (3, lp(3, 3) + lp(1, 2) + lp(3, 3))
    assert out[2] == (2, lp(3, 3) + lp(1, 2))
    assert out[3] == (0, 0)  # shorter than n: unscorable, not an error


def test_ngram_lm_scores_reference_mode_fallbacks(spark):
    import math

    from sstable_hadoop_spark.operators.text import ngram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (9, "z z")],
        "doc_id bigint, text string")
    ref = df.filter("doc_id = 2")  # pairs (a,b),(b,c); V=3
    out = {r["doc_id"]: (r["n_grams"], r["lm_micro_nats"])
           for r in ngram_lm_scores(df, lm_df=ref).collect()}

    def lp(c, ct, V=3):
        return math.floor(math.log((c + 1) / (ct + V)) * 1e6)

    # doc1: seen (a,b) twice + unseen pair with SEEN ctx b (c=0, ct=1)
    assert out[1] == (3, 2 * lp(1, 1) + lp(0, 1))
    # doc9: fully-unseen ctx z -> p = 1/V
    assert out[9] == (1, math.floor(math.log(1 / 3) * 1e6))


def test_ngram_lm_scores_trigram_and_keep(spark):
    from sstable_hadoop_spark.operators.text import ngram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "a b", "de")],
        "doc_id bigint, text string, lang string")
    out = {r["doc_id"]: r for r in
           ngram_lm_scores(df, n=3, keep=("lang",)).collect()}
    assert out[1]["n_grams"] == 2          # (a b -> c), (b c -> d)
    assert out[2]["n_grams"] == 0          # 2 tokens < n=3
    assert out[1]["lang"] == "en" and out[2]["lang"] == "de"
    assert out[1]["lm_micro_nats"] < 0


def test_ngram_lm_scores_rejects_unigram(spark):
    import pytest as _pytest

    from sstable_hadoop_spark.operators.text import ngram_lm_scores

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="n >= 2"):
        ngram_lm_scores(df, n=1)


def test_bloom_decontaminate_no_false_negatives(spark):
    from sstable_hadoop_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    # even a saturated tiny bloom may only ever drop MORE, never less
    for m_bits in (1 << 17, 256):
        got = {r["doc_id"]
               for r in decontaminate_bloom(docs, bench,
                                            m_bits=m_bits).collect()}
        assert got <= exact, f"m_bits={m_bits} admitted a dirty doc"
    # at the real size there is headroom: bloom == exact on this corpus
    full = {r["doc_id"] for r in decontaminate_bloom(docs, bench).collect()}
    assert full == exact


def test_bloom_decontaminate_scan_local_plan(spark):
    from sstable_hadoop_spark.operators.corpus import decontaminate_bloom

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plan = decontaminate_bloom(docs, bench)._jdf.queryExecution() \
                                              .executedPlan().toString()
    assert "Join" not in plan, "bloom probe must be a scan-local filter"


def test_bloom_prebuilt_words_roundtrip(spark):
    from sstable_hadoop_spark.operators.corpus import (
        build_ngram_bloom,
        decontaminate_bloom,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    words = build_ngram_bloom(bench)
    assert len(words) == (1 << 17) // 64
    a = sorted(r["doc_id"] for r in
               decontaminate_bloom(docs, bench).collect())
    b = sorted(r["doc_id"] for r in
               decontaminate_bloom(docs, bloom_words=words).collect())
    assert a == b
    with pytest.raises(ValueError, match="m_bits"):
        decontaminate_bloom(docs, bloom_words=words, m_bits=256)
    with pytest.raises(ValueError, match="benchmark"):
        decontaminate_bloom(docs)


def test_bloom_build_guards(spark):
    from sstable_hadoop_spark.operators.corpus import build_ngram_bloom

    docs = _docs(spark)
    with pytest.raises(ValueError, match="multiple of 64"):
        build_ngram_bloom(docs, m_bits=100)
    with pytest.raises(ValueError, match="literal-bitmap bound"):
        build_ngram_bloom(docs, m_bits=1 << 21)


def test_merge_list_shapes(spark):
    """_merge_list accepts DataFrames, named Rows (including narrow
    projections — Rows subclass tuple, so named access must win over
    positional), dicts, bare pairs, and full 5-tuples; ambiguous
    widths raise instead of guessing (ADVICE r8)."""
    from pyspark.sql import Row

    from sstable_hadoop_spark.operators.tokenizer import _merge_list

    full = [(1, "a", "b", "ab", 7), (2, "ab", "c", "abc", 3)]
    exp = [("a", "b"), ("ab", "c")]
    assert _merge_list(full) == exp
    assert _merge_list([("a", "b"), ("ab", "c")]) == exp
    assert _merge_list(
        [Row(rank=1, lhs="a", rhs="b"),
         Row(rank=2, lhs="ab", rhs="c")]) == exp      # 3-wide Row
    assert _merge_list(
        [{"lhs": "a", "rhs": "b"}, {"lhs": "ab", "rhs": "c"}]) == exp
    df = spark.createDataFrame(
        full, "rank int, lhs string, rhs string, merged string, "
              "pair_count bigint")
    assert _merge_list(df) == exp
    with pytest.raises(ValueError, match="ambiguous"):
        _merge_list([(1, "a", "b")])                  # bare 3-tuple


def test_py_gram_digests_match_sql_path(spark):
    """The pure-Python gram-digest replica == the SQL/codegen path
    (`_word_gram_hashes`) on real corpus text + adversarial rows —
    the parity the bloom/decontamination basis depends on."""
    from sstable_hadoop_spark.operators.corpus import (
        _collect_bench_digests,
        _py_gram_digests,
        _word_gram_hashes,
    )
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(80)
    extra = spark.createDataFrame(
        [(9001, "short"), (9002, "a\x0bb c\td  e\r\nf g h i j"),
         (9003, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    docs = docs.select("doc_id", "text").unionByName(extra)
    for n in (3, 8):
        sql_side = {
            r["doc_id"]: [bytes.fromhex(h) for h in r["g"]]
            for r in docs.select(
                "doc_id",
                _word_gram_hashes(F.col("text"), n).alias("g")).collect()}
        py_side = {r["doc_id"]: list(_py_gram_digests(r["text"], n))
                   for r in docs.collect()}
        assert sql_side == py_side
    # the driver-collected distinct digest set == the union of per-doc
    # digests (what the broadcast path ships)
    got = _collect_bench_digests(extra, "text", 3)
    exp = frozenset(d for r in extra.collect()
                    for d in _py_gram_digests(r["text"], 3))
    assert got == exp


def test_html_extraction_pinned(spark):
    """strip_html/extract_html_text against hand-computed expected
    text (not just cross-engine parity): boilerplate containers drop,
    block closers break lines, entities decode in the safe order,
    whitespace collapses; plus the documented regex-tier limits."""
    from sstable_hadoop_spark.operators.html import (
        escape_html_text,
        extract_html_text,
        strip_html,
    )

    cases = [
        # (html, expected_text, expected_title, n_links)
        ("<html><head><title>T &amp; t</title><style>b{}</style>"
         "</head><body><p>hello</p></body></html>",
         "hello", "T & t", 0),
        ("<ul><li>a</li><li>b</li></ul>", "a\nb", "", 0),
        ("x<br>y<br/>z", "x\ny\nz", "", 0),
        ("<script>if(1<2)alert('&')</script>after", "after", "", 0),
        ("<NAV><a href=q>l1</a></NAV>body <A NAME=x>l2</A>",
         "body l2", "", 2),                  # case-insensitive
        ("&amp;lt; stays", "&lt; stays", "", 0),  # && order safe
        ("a   b\t\tc", "a b c", "", 0),
        ("<p>one</p><!--<p>two</p>--><p>three</p>", "one\nthree", "", 0),
        ("<header>hdr</header><h1>t</h1>", "t", "", 0),
        ("", "", "", 0),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, *_ ) in enumerate(cases)],
        "doc_id int, html string")
    got = {r["doc_id"]: r for r in
           extract_html_text(df, "html").collect()}
    for i, (h, text, title, n_links) in enumerate(cases):
        r = got[i]
        assert r["text"] == text, (i, h, r["text"])
        assert r["title"] == title, (i, r["title"])
        assert r["n_links"] == n_links, (i, r["n_links"])
    # escape → embed → extract round-trips single-line text exactly
    tricky = "5 < 6 && x > y &amp; <not-a-tag>"
    rt = spark.createDataFrame([(1, tricky)], "doc_id int, t string") \
        .select(strip_html(F.concat(F.lit("<p>"),
                                    escape_html_text(F.col("t")),
                                    F.lit("</p>"))).alias("x")) \
        .collect()[0]["x"]
    assert rt == tricky


def test_url_domain_and_caps(spark):
    from sstable_hadoop_spark.operators.corpus import (
        cap_per_domain,
        url_host,
        url_registrable_domain,
    )

    rows = [
        (1, "https://www.news.site7.com/a/b?q=1", "www.news.site7.com",
         "site7.com"),
        (2, "http://SITE7.com:8080/x", "site7.com", "site7.com"),
        (3, "ftp://files.example.org/f", "files.example.org",
         "example.org"),
        (4, "no-scheme.com/path", "", ""),        # documented: no host
        (5, "https://bbc.co.uk/news", "bbc.co.uk", "co.uk"),  # PSL gap
    ]
    df = spark.createDataFrame([(i, u) for i, u, *_ in rows],
                               "doc_id int, url string")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", url_host("url").alias("h"),
        url_registrable_domain("url").alias("d")).collect()}
    for i, _, h, d in rows:
        assert got[i]["h"] == h and got[i]["d"] == d, (i, dict(got[i]))

    many = spark.createDataFrame(
        [(i, f"https://www.dom{i % 3}.com/{i}") for i in range(30)],
        "doc_id int, url string")
    kept = cap_per_domain(many, "url", cap=4,
                          order_by=F.col("doc_id")).collect()
    assert len(kept) == 12
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert set(by_dom) == {"dom0.com", "dom1.com", "dom2.com"}
    for dom, ids in by_dom.items():
        k = int(dom[3])
        assert sorted(ids) == [k, k + 3, k + 6, k + 9]
    norank = cap_per_domain(many, "url", 4, F.col("doc_id"),
                            keep_rank=False)
    assert "rank" not in norank.columns


def test_sq8_encode_and_search(spark):
    """Scalar quantization: codes live in [0,255] hitting both ends,
    params/codes reuse skips retraining, constant dimensions don't
    divide by zero, and exact rerank restores true cosine order."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_sq8,
        sq8_encode,
        train_sq8,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.transform(
            "embedding", lambda x: x.cast("double")).alias("embedding"))
    mins, scales = train_sq8(emb)
    assert len(mins) == len(scales) == 64
    codes = sq8_encode(emb, mins, scales)
    stats = codes.select(F.explode("codes").alias("c")).agg(
        F.min("c"), F.max("c")).collect()[0]
    assert stats[0] == 0 and stats[1] == 255  # min/max rows hit ends
    q = emb.filter(F.col("vec_id") < 4).withColumnRenamed(
        "vec_id", "query_id")
    a = cosine_topk_sq8(emb, q, k=5).collect()
    b = cosine_topk_sq8(emb, q, k=5, params=(mins, scales),
                        codes=codes).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # constant dimension: scale falls back to 1.0, no NaN/err
    const = emb.select("vec_id", F.transform(
        "embedding", lambda x: F.lit(0.5)).alias("embedding"))
    cm, cs = train_sq8(const)
    assert all(s == 1.0 for s in cs)
    assert cosine_topk_sq8(const, q.limit(1), k=2).count() == 2
    # rerank against exact cosine: top-5 sets coincide on this corpus
    rr = {(r["query_id"], r["vec_id"], r["rk"])
          for r in cosine_topk_sq8(emb, q, k=5,
                                   rerank_factor=4).collect()}
    ex = {(r["query_id"], r["vec_id"], r["rk"])
          for r in cosine_topk(emb, q, k=5).collect()}
    assert rr == ex


def test_resample_gapfill_hand_checked(spark):
    """resample_gapfill on a tiny crafted series: bucket math, dense
    grid bounds, locf carry across multi-bucket gaps, milli-unit
    integer averages, and the n_obs/filled flags."""
    from sstable_hadoop_spark.operators.timeseries import (
        resample_gapfill,
    )

    step = 10
    rows = [  # (key, ts_us, value)
        ("a", 0, 1.00), ("a", 4, 2.00),    # bucket 0: avg 1.5
        ("a", 25, 0.10),                   # bucket 20: avg 0.1
        ("a", 52, 3.335),                  # bucket 50 (gap 30,40)
        ("b", 11, 7.00),                   # single-bucket key
    ]
    df = spark.createDataFrame(rows, "k string, us long, v double")
    got = {(r["k"], r["bucket_us"]):
           (r["n_obs"], r["avg_milli"], r["filled"])
           for r in resample_gapfill(df, "us", "k", "v", step)
           .collect()}
    assert got == {
        ("a", 0): (2, 1500, False),
        ("a", 10): (0, 1500, True),       # locf from bucket 0
        ("a", 20): (1, 100, False),
        ("a", 30): (0, 100, True),        # locf spans...
        ("a", 40): (0, 100, True),        # ...multiple gap buckets
        ("a", 50): (1, 3340, False),      # 3.335*100 rounds up in
                                          # binary: floor(333.500…06
                                          # + 0.5) = 334 → 3340
        ("b", 10): (1, 7000, False),
    }


def test_resample_linear_interpolation(spark):
    """fill='linear': gap rows lerp between surrounding observed
    averages with truncating integer DIV; trailing gaps locf."""
    from sstable_hadoop_spark.operators.timeseries import (
        resample_gapfill,
    )

    step = 10
    rows = [("a", 0, 1.00),          # bucket 0:  1000 milli
            ("a", 31, 4.00),         # bucket 30: 4000 milli
            ("a", 45, 1.00),         # bucket 40: 1000
            ("a", 61, 2.00)]         # bucket 60: 2000
    df = spark.createDataFrame(rows, "k string, us long, v double")
    got = {r["bucket_us"]: (r["avg_milli"], r["filled"]) for r in
           resample_gapfill(df, "us", "k", "v", step,
                            fill="linear").collect()}
    assert got == {
        0: (1000, False),
        10: (2000, True),    # 1000 + 3000*10 DIV 30
        20: (3000, True),
        30: (4000, False),
        40: (1000, False),
        50: (1500, True),    # 1000 + 1000*10 DIV 20
        60: (2000, False),
    }
    with pytest.raises(ValueError, match="fill mode"):
        resample_gapfill(df, "us", "k", "v", step, fill="spline")


def test_resample_chunked_grid_spans_chunk_boundaries(spark):
    """The two-stage chunked grid explode (VERDICT r9 #2) must emit
    the identical dense grid as a single sequence: a key spanning
    several _GRID_CHUNK windows gets every bucket exactly once, with
    correct locf fill across the chunk seams."""
    from sstable_hadoop_spark.operators.timeseries import (
        _GRID_CHUNK,
        resample_gapfill,
    )

    step = 10
    n = 3 * _GRID_CHUNK + 17  # 3 full chunks + a partial tail
    hi = (n - 1) * step
    df = spark.createDataFrame(
        [("k", 0, 5.0), ("k", hi, 9.0)], "k string, us long, v double")
    rows = resample_gapfill(df, "us", "k", "v", step).collect()
    assert len(rows) == n
    got = {r["bucket_us"]: (r["avg_milli"], r["n_obs"]) for r in rows}
    assert sorted(got) == [i * step for i in range(n)]
    assert got[0] == (5000, 1)
    assert got[hi] == (9000, 1)
    # every interior bucket is a gap row carrying the first value
    assert all(got[i * step] == (5000, 0) for i in range(1, n - 1))


def test_resample_grid_guard_raises_not_ooms(spark):
    """A key spanning ~10⁹ buckets must fail LOUDLY at the declared
    max_buckets_per_key bound (never materialize the grid), and the
    same span must pass when the caller raises the bound enough to
    admit a plan (proving the guard, not the explode, is what
    fired)."""
    from pyspark.errors import SparkRuntimeException

    from sstable_hadoop_spark.operators.timeseries import (
        resample_gapfill,
    )

    df = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 10_000_000_000, 2.0)],
        "k string, us long, v double")
    with pytest.raises(SparkRuntimeException,
                       match="max_buckets_per_key"):
        resample_gapfill(df, "us", "k", "v", 10).collect()
    # a modest span under a small bound still raises; over it, passes
    small = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 1000, 2.0)],
        "k string, us long, v double")
    with pytest.raises(SparkRuntimeException,
                       match="max_buckets_per_key"):
        resample_gapfill(small, "us", "k", "v", 10,
                         max_buckets_per_key=50).collect()
    ok = resample_gapfill(small, "us", "k", "v", 10,
                          max_buckets_per_key=101).collect()
    assert len(ok) == 101


def test_dedup_paragraphs_hand_checked(spark):
    from sstable_hadoop_spark.operators.dedup import dedup_paragraphs

    boiler = "subscribe now"
    rows = [
        (1, f"{boiler}\n\nunique one\n\nfooter x"),
        (2, f"{boiler}\n\nunique two\n\nfooter x"),
        (3, "all alone here"),
        (4, f"{boiler}\n\n{boiler}\n\nunique four"),  # dup WITHIN doc
        (5, ""),                                      # empty
        (6, None),                                    # NULL
        (7, f"  {boiler}  \n\n\n\nunique seven"),     # trim + empties
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["text"], r["n_paragraphs"], r["n_removed"])
           for r in dedup_paragraphs(df, min_df=2).collect()}
    assert got[1] == ("unique one", 3, 2)
    assert got[2] == ("unique two", 3, 2)
    assert got[3] == ("all alone here", 1, 0)
    # within-doc repetition counts ONE distinct doc — df for boiler is
    # docs {1,2,4,7} ≥ 2, so both copies in doc 4 are removed
    assert got[4] == ("unique four", 3, 2)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("", 0, 0)
    assert got[7] == ("unique seven", 2, 1)
    # min_df high enough keeps everything
    keep = {r["doc_id"]: r["n_removed"]
            for r in dedup_paragraphs(df, min_df=99).collect()}
    assert set(keep.values()) == {0}


def test_canonicalize_url_rules(spark):
    from sstable_hadoop_spark.operators.corpus import canonicalize_url

    cases = {
        # case folding + default port + tracking drop + sort + fragment
        "HTTP://WWW.Ex.COM:80/Page/1?utm_source=x&b=2&a=1#frag":
            "http://www.ex.com/Page/1?a=1&b=2",
        # https default port, query emptied -> '?' dropped
        "https://Ex.com:443/?gclid=zz": "https://ex.com/",
        # non-default port kept; params sorted
        "https://ex.com:8443/p?z=1&y=2": "https://ex.com:8443/p?y=2&z=1",
        # empty path -> '/'
        "http://ex.com": "http://ex.com/",
        # schemeless falls through untouched
        "relative/path?a=1": "relative/path?a=1",
        # all params tracking -> no query at all
        "https://h/p?utm_a=1&fbclid=2&msclkid=3&ref=4": "https://h/p",
        # path case PRESERVED (paths are case-sensitive)
        "https://Ex.com/CaseSensitive": "https://ex.com/CaseSensitive",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_url("url").alias("c")).collect()}
    assert got == cases
    # canonical form is idempotent
    df2 = spark.createDataFrame([(v,) for v in cases.values()],
                                "url string")
    got2 = {r["url"]: r["c"] for r in df2.select(
        "url", canonicalize_url("url").alias("c")).collect()}
    assert got2 == {v: v for v in cases.values()}


def test_canonicalize_url_percent_and_dot_segments(spark):
    """r10 (VERDICT r9 #9): percent-encoding normalization (uppercase
    hex, decode unreserved) and RFC 3986 dot-segment resolution —
    including the %2E%2E escape that only BECOMES a dot segment after
    decoding — plus idempotence over the new shapes."""
    from sstable_hadoop_spark.operators.corpus import canonicalize_url

    cases = {
        # unreserved escapes decode; hex of kept escapes uppercases
        "https://ex.com/%7euser/f%2Dile%2e?n=%41%42&m=%c3%a9":
            "https://ex.com/~user/f-ile.?m=%C3%A9&n=AB",
        # dot segments: ./ and ../ resolve; %2E%2E becomes ../ first
        "https://ex.com/a/b/../c/./d/%2E%2E/e":
            "https://ex.com/a/c/e",
        # .. at root cannot climb above /
        "https://ex.com/../a": "https://ex.com/a",
        # stacked ..
        "https://ex.com/a/b/c/../../d": "https://ex.com/a/d",
        # trailing /. and /segment/..
        "https://ex.com/a/.": "https://ex.com/a/",
        "https://ex.com/a/b/..": "https://ex.com/a/",
        # all-dot segment (not . or ..) is an ordinary segment and is
        # NOT collapsed into its neighbor (documented RE2-tier limit)
        "https://ex.com/.../x/../y": "https://ex.com/.../y",
        # %25 (the escape for %) is reserved: never decoded, so no
        # double-decode cascade
        "https://ex.com/100%25?x=%2541": "https://ex.com/100%25?x=%2541",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_url("url").alias("c")).collect()}
    assert got == cases
    df2 = spark.createDataFrame([(v,) for v in cases.values()],
                                "url string")
    got2 = {r["url"]: r["c"] for r in df2.select(
        "url", canonicalize_url("url").alias("c")).collect()}
    assert got2 == {v: v for v in cases.values()}


def test_url_registrable_domain_psl(spark):
    """r10 (VERDICT r9 #6): PSL-backed registrable domains — longest
    match against the vendored snapshot; the heuristic stays the
    default and the two must agree on single-label suffixes."""
    from sstable_hadoop_spark.operators.corpus import (
        url_registrable_domain,
    )

    cases = {
        "https://shop.example.co.uk/p": ("co.uk", "example.co.uk"),
        "https://www.site.com.au/x": ("com.au", "site.com.au"),
        "https://a.school.nsw.edu.au/y":
            ("edu.au", "school.nsw.edu.au"),
        # plain gTLD: psl == heuristic
        "https://www.news.site7.com/z": ("site7.com", "site7.com"),
        # host IS a public suffix: returns itself (pragmatic key)
        "https://co.uk/": ("co.uk", "co.uk"),
        # bare two-label host on a psl suffix
        "https://example.co.uk": ("co.uk", "example.co.uk"),
        # wildcard TLD (*.ck): any second-level label is a suffix
        "https://www.shop.site.ck/p": ("site.ck", "shop.site.ck"),
        "https://site.ck/": ("site.ck", "site.ck"),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: (r["h"], r["p"]) for r in df.select(
        "url",
        url_registrable_domain("url").alias("h"),
        url_registrable_domain("url", psl=True).alias("p")).collect()}
    assert got == cases
    # caller-supplied suffix tables override the snapshot: declaring
    # site7.com itself a public suffix pushes the registrable domain
    # one label left
    custom = df.select(
        "url", url_registrable_domain(
            "url", psl=True,
            suffixes=(("site7.com",), ())).alias("d")).collect()
    by_url = {r["url"]: r["d"] for r in custom}
    assert by_url["https://www.news.site7.com/z"] == "news.site7.com"
    # and the snapshot's co.uk rule is gone under the custom table
    assert by_url["https://shop.example.co.uk/p"] == "co.uk"


def test_weighted_sample_properties(spark):
    import math

    from sstable_hadoop_spark.operators.corpus import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 100).otherwise(1).alias("w"))
    out = weighted_sample(df, 100, "w").collect()
    assert len(out) == 100
    # keys are ordered desc with id tie-break, sample is unique
    keys = [(r["key_milli"], -r["doc_id"]) for r in out]
    assert keys == sorted(keys, reverse=True)
    assert len({r["doc_id"] for r in out}) == 100
    # 100x-weighted ids dominate the sample (deterministic input)
    heavy = sum(1 for r in out if r["doc_id"] < 100)
    assert heavy > 60, heavy
    # deterministic across invocations
    again = weighted_sample(df, 100, "w").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    # key matches the documented formula on one hand-computed row
    import hashlib

    r0 = out[0]
    h = int(hashlib.md5(f"wsample:{r0['doc_id']}".encode())
            .hexdigest()[:15], 16)
    lnm = math.floor(math.log((h + 1) / float(1 << 60)) * 1e6)
    assert r0["key_milli"] == math.floor(lnm / r0["w"] * 1000.0)


def test_weighted_sample_excludes_nonpositive_and_guards(spark):
    from sstable_hadoop_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None)],
        "doc_id long, w int")
    out = weighted_sample(df, 10, "w").collect()
    assert [r["doc_id"] for r in out] == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, 0, "w")


def test_mixture_epochs_regimes(spark):
    from sstable_hadoop_spark.operators.corpus import (
        mixture_epochs,
        mixture_sample,
    )

    rows = [(i, "s1" if i < 10 else "s2", "tok " * 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # each doc is 11 tokens ("tok "*10 splits to 10 toks + trailing '')
    # s1 corpus = 110 tokens; budget 250 -> ~2 epochs + partial
    # s2 corpus = 110 tokens; budget 50  -> partial only
    out = mixture_epochs(df, {"s1": 250, "s2": 50}, n_shards=2)
    rows_out = out.collect()
    by_src = {}
    for r in rows_out:
        by_src.setdefault(r["source"], []).append(r)
    # s1: some docs appear in multiple epochs
    s1_epochs = {r["epoch"] for r in by_src["s1"]}
    assert max(s1_epochs) >= 2
    # every (id, epoch) pair unique
    pairs = [(r["id"], r["epoch"]) for r in rows_out]
    assert len(pairs) == len(set(pairs))
    # s2: partial only -> all epoch 0, token mass <= budget
    assert {r["epoch"] for r in by_src["s2"]} == {0}
    assert sum(r["n_tokens"] for r in by_src["s2"]) <= 50
    # downsampling degenerate case == mixture_sample's admitted set
    ms = {(r["id"],) for r in
          mixture_sample(df, {"s2": 50}, n_shards=2).collect()}
    me = {(r["id"],) for r in
          mixture_epochs(df, {"s2": 50}, n_shards=2).collect()}
    assert ms == me
    # per-shard token delivery never exceeds the shard budget
    import collections

    shard_tokens = collections.Counter()
    for r in by_src["s1"]:
        shard_tokens[r["shard"]] += r["n_tokens"]
    for sh, tk in shard_tokens.items():
        sb = 250 // 2 + (1 if sh < 250 % 2 else 0)
        assert tk <= sb, (sh, tk, sb)


def test_ivfsq8_append_matches_full_build_with_same_params(
        spark, tmp_path):
    """FAISS add(): building from the EVEN half then appending the odd
    half must probe identically to a one-shot index built over the
    whole corpus with the SAME stored params — appended codes use the
    sidecar training, never a retrain (retrained codes would not be
    comparable to the stored ones)."""
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_ivfsq8_stored,
        ivfsq8_append,
        train_sq8,
        write_ivfsq8_index,
    )
    from sstable_hadoop_spark.queries import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.transform(
            "embedding", lambda x: x.cast("double")).alias("embedding"))
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    params = train_sq8(even)  # training comes from the INITIAL corpus

    inc = str(tmp_path / "inc")
    write_ivfsq8_index(even, inc, params=params)
    n = ivfsq8_append(odd, inc)
    assert n == odd.count()

    full = str(tmp_path / "full")
    write_ivfsq8_index(emb, full, params=params)

    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id")
    a = [tuple(r) for r in cosine_topk_ivfsq8_stored(spark, inc, q, k=5)
         .orderBy("query_id", "rk").collect()]
    b = [tuple(r) for r in cosine_topk_ivfsq8_stored(spark, full, q,
                                                     k=5)
         .orderBy("query_id", "rk").collect()]
    assert a == b  # bit-identical incl. decoded-dot scores

    # dimension mismatch is refused before any write
    import pytest as _pytest
    bad = odd.select("vec_id",
                     F.slice("embedding", 1, 3).alias("embedding"))
    with _pytest.raises(ValueError, match="dim"):
        ivfsq8_append(bad, inc)


def test_dedup_canonical_keeps_best_quality_member(spark):
    """dedup_canonical: within each near-dup cluster exactly the
    max-quality member survives (tie -> lowest id); singletons pass
    through; the quality column must exist."""
    from sstable_hadoop_spark.operators.dedup import (
        dedup_canonical,
        dedup_components,
    )
    from sstable_hadoop_spark.queries import load

    docs = load(spark, SF, "documents")
    kept = dedup_canonical(docs, "n_chars")
    comp = dedup_components(docs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    rows = (docs.select("doc_id", "n_chars")
                .join(comp.select("doc_id", "cluster_id"), "doc_id")
                .collect())
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(
            (r["n_chars"], r["doc_id"]))
    want = {min(members, key=lambda t: (-t[0], t[1]))[1]
            for members in by_cluster.values()}
    assert kept_ids == want
    assert kept.count() == len(by_cluster)  # one per cluster
    import pytest as _pytest
    with _pytest.raises(ValueError, match="quality column"):
        dedup_canonical(docs, "nope")


# --- balanced_sample (r10) ---------------------------------------------------

def test_balanced_sample_exact_counts_and_determinism(spark):
    from sstable_hadoop_spark.operators.corpus import balanced_sample

    rows = ([("en", i, 100 + i) for i in range(50)]
            + [("de", 1000 + i, 10 + i) for i in range(7)]
            + [("fr", 2000, 5)])
    df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                     "n_chars long")
    out = balanced_sample(df, 10, by=("lang",), weight_col="n_chars")
    got = {(r.lang, r.doc_id) for r in out.collect()}
    by_lang = {}
    for lang, d in got:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    # exactly min(k, class size) per class
    assert by_lang == {"en": 10, "de": 7, "fr": 1}
    # deterministic across partitionings
    got2 = {(r.lang, r.doc_id)
            for r in balanced_sample(df.repartition(13), 10,
                                     by=("lang",),
                                     weight_col="n_chars").collect()}
    assert got2 == got


def test_balanced_sample_unweighted_and_guards(spark):
    from sstable_hadoop_spark.operators.corpus import balanced_sample
    import pytest as _pytest

    rows = [("en", i, None) for i in range(20)] \
        + [(None, 99, 5), ("en", None, 5)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                     "n_chars long")
    out = balanced_sample(df, 5, by=("lang",)).collect()
    assert len(out) == 5 and all(r.lang == "en" for r in out)
    assert [r.rk for r in sorted(out, key=lambda r: r.rk)] \
        == [1, 2, 3, 4, 5]
    with _pytest.raises(ValueError, match="k must be"):
        balanced_sample(df, 0)


def test_balanced_sample_plans_window_group_limit(spark):
    from sstable_hadoop_spark.operators.corpus import balanced_sample

    df = spark.createDataFrame(
        [("en", i, 10) for i in range(100)],
        "lang string, doc_id long, n_chars long")
    plan = balanced_sample(df, 3, by=("lang",), weight_col="n_chars") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# --- r11: semantic (embedding) decontamination ------------------------------

def test_semantic_decontaminate_drops_near_benchmark_rows(spark):
    """Corpus rows with cosine >= tau against any same-cell benchmark
    vector are dropped; distant rows survive; the audit view matches
    the filtered view."""
    import math

    from sstable_hadoop_spark.operators.corpus import (
        semantic_decontaminate,
    )

    th = math.acos(0.95)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [math.cos(th), math.sin(th), 0.0, 0.0]),
         (3, [0.0, 0.0, 1.0, 0.0]),
         (4, [0.0, 0.0, 0.0, 1.0])],
        "vec_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>")
    one_cell = [[1.0, 0.0, 0.0, 0.0]]
    clean = semantic_decontaminate(corpus, bench, tau=0.9,
                                   cents=one_cell)
    assert sorted(r["vec_id"] for r in clean.collect()) == [3, 4]
    flagged = semantic_decontaminate(corpus, bench, tau=0.9,
                                     cents=one_cell, flag_only=True)
    rows = {r["vec_id"]: r["kept"] for r in flagged.collect()}
    assert rows == {1: 0, 2: 0, 3: 1, 4: 1}
    # higher tau: only the exact hit dies
    clean99 = semantic_decontaminate(corpus, bench, tau=0.99,
                                     cents=one_cell)
    assert sorted(r["vec_id"] for r in clean99.collect()) == [2, 3, 4]


def test_semantic_decontaminate_nprobe_buys_cross_cell_recall(spark):
    """A benchmark vector argmax-assigned to a different cell than its
    corpus near-duplicate is missed at n_probe=1 and caught once the
    probe set covers the neighbor cell — recall is bought on the
    BENCHMARK side only (the corpus never fans out)."""
    from sstable_hadoop_spark.operators.corpus import (
        semantic_decontaminate,
    )

    # two centroids 45 degrees apart; corpus vec sits just on cell-0's
    # side, benchmark twin just on cell-1's side of the boundary
    cents = [[1.0, 0.0], [0.7071, 0.7071]]
    corpus = spark.createDataFrame(
        [(1, [0.93, 0.36]), (2, [-1.0, 0.0])],
        "vec_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [(100, [0.91, 0.41])],  # cos(corpus 1, bench) ~ 0.9988
        "vec_id bigint, embedding array<double>")
    miss = semantic_decontaminate(corpus, bench, tau=0.99,
                                  cents=cents, n_probe=1)
    assert sorted(r["vec_id"] for r in miss.collect()) == [1, 2]
    hit = semantic_decontaminate(corpus, bench, tau=0.99,
                                 cents=cents, n_probe=2)
    assert sorted(r["vec_id"] for r in hit.collect()) == [2]


def test_semantic_decontaminate_guards_and_plan(spark):
    """n_probe guard; the candidate join must be a broadcast equi-join
    on the cell key (no corpus shuffle, no BNLJ)."""
    import pytest

    from sstable_hadoop_spark.operators.corpus import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="n_probe"):
        semantic_decontaminate(corpus, bench, n_probe=0)
    out = semantic_decontaminate(corpus, bench, tau=0.9,
                                 cents=[[1.0, 0.0], [0.0, 1.0]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
