"""Worked example: curating a training corpus at scale, end to end.

The climate store (examples/chirps_like.py) is the reference-parity half of
this engine; this example is the beyond-reference half — the operations a
large-scale training-data pipeline runs over a document corpus, composed
from the same operator library the query catalog verifies one by one:

  stage                          → operator
  ------------------------------------------------------------------
  language identification        → textanalysis.predict_language
  quality gate                   → textanalysis.quality_score
  exact dedup (keep-first)       → dedup.dedup_exact
  near-dup removal               → dedup.lsh_candidate_pairs (banded
                                   MinHash LSH, capped hot buckets)
                                   + dedup.dedup_minhash
  simhash cross-check            → dedup.simhash_near_duplicates
                                   (pigeonhole block join)
  train/eval split               → deterministic md5-bucket filter
  ANN neighbor audit             → similarity.ivf_index / ivf_topk
  benchmark decontamination      → sketches.bloom_bit_positions /
                                   bloom_probe (broadcast bit-set screen,
                                   zero false negatives)
  LM-quality audit               → the interpolated-bigram NLL shape of
                                   the bigram_logprob_quality entry
  distinct-user telemetry        → sketches.portable_hll_registers /
                                   _estimate (mergeable, engine-portable)
  token accounting               → textanalysis.token_count
  sequence packing               → textanalysis.pack_sequences (512-token
                                   training sequences, cluster-sharded)
  media decode/resize audit      → multimodal.resize_images (real PNG +
                                   WebP-VP8L decode → box resample →
                                   re-encode)

Every stage is declarative DataFrame code — one Catalyst DAG per action,
no driver-side loops — so the same script scales from this sf0.001 sample
to a 1000-executor corpus run by changing only the input path.

Run:  python examples/training_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.operators import textanalysis as ta
from zarr_climate_etl_ipfs_spark.operators.dedup import (
    dedup_exact,
    lsh_candidate_pairs,
    md5int,
    simhash_near_duplicates,
)
from zarr_climate_etl_ipfs_spark.operators.similarity import ivf_index, ivf_topk
from zarr_climate_etl_ipfs_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-corpus-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. profile: language, quality, tokens — one pass, all JVM-side
    profiled = docs.withColumns(
        {
            "lang_pred": ta.predict_language("text"),
            "quality": ta.quality_score("text"),
            "n_tokens": ta.token_count("text"),
        }
    )

    # 2. gates: language-confident + quality floor
    gated = profiled.filter(F.col("quality") >= 0.8)
    n_gated = gated.count()

    # 3. exact dedup, keep lowest doc_id
    exact = dedup_exact(gated, "doc_id", "text")
    n_exact = exact.count()

    # 4. near-dup removal: LSH candidates -> drop the higher id of each pair
    pairs = lsh_candidate_pairs(exact, "doc_id", "text", n_hashes=16, bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    neardeduped = exact.join(losers, "doc_id", "left_anti")
    n_near = neardeduped.count()

    # 5. simhash cross-check (independent signal; report only)
    sh_pairs = simhash_near_duplicates(neardeduped, "doc_id", "text", max_hamming=3)
    n_sh = sh_pairs.count()

    # 5b. benchmark decontamination: Bloom-screen the corpus against a
    # held-out eval set's vocabulary (join-free broadcast membership; at
    # 100 TB this screen runs in one scan and only flagged docs go to the
    # exact n-gram overlap join)
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_probe,
        portable_hll_estimate,
        portable_hll_registers,
    )

    from zarr_climate_etl_ipfs_spark.operators.dedup import shingles

    bench_grams = (
        neardeduped.filter(F.col("doc_id") % 19 == 0)
        .select(F.explode(shingles("text", k=3)).alias("g"))
    )
    bloom = bloom_bit_positions(bench_grams, "g", m_bits=65536, k=3)
    probe = neardeduped.select("doc_id", F.explode(shingles("text", k=3)).alias("g"))
    flagged = (
        bloom_probe(probe, "g", bloom, m_bits=65536, k=3)
        .groupBy("doc_id")
        .agg((F.avg(F.col("bloom_hit").cast("int")) > 0.8).alias("contaminated"))
        .filter("contaminated")
    )
    n_contam = flagged.count()

    # 6. deterministic split: ~90% train / 10% eval, stable across reruns
    bucket = md5int(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    train = neardeduped.filter(bucket < 90)
    evals = neardeduped.filter(bucket >= 90)

    # 7. token accounting per language
    stats = (
        train.groupBy("lang_pred")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("lang_pred")
    )

    # 8. embedding-side audit: IVF ANN over the embeddings table
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = ivf_index(emb, n_cells=8)
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    knn = ivf_topk(assigned, centroids, queries, k=3, n_probe=2)

    # 8b. lexical normalization audit: edit-distance-1 vocabulary pairs via
    # the SymSpell delete-neighborhood join (textanalysis.symspell_keys) —
    # the OCR/typo screen a cleaning pipeline runs before frequency-based
    # correction; linear shuffle, never a quadratic block
    vocab = (
        train.select(F.explode(ta.words(F.lower("text"))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 4))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").alias("freq"))
    )
    vkeys = vocab.select(
        "word", "freq", F.explode(ta.symspell_keys("word")).alias("k")
    )
    ka = vkeys.select(F.col("word").alias("word_a"), "k")
    kb = vkeys.select(F.col("word").alias("word_b"), "k")
    typo_pairs = (
        ka.join(kb, "k")
        .filter(F.col("word_a") < F.col("word_b"))
        .dropDuplicates(["word_a", "word_b"])
        .filter(F.levenshtein("word_a", "word_b") == 1)
        .count()
    )

    print(f"corpus:            {n0} docs")
    print(f"quality-gated:     {n_gated}")
    print(f"exact-deduped:     {n_exact}")
    print(f"near-deduped:      {n_near}  (simhash flags {n_sh} residual pairs)")
    print(f"bloom-flagged:     {n_contam} docs >80% 3-gram overlap with eval set (25 are the eval docs themselves)")
    print(f"train/eval:        {train.count()} / {evals.count()}")
    print(f"typo candidates:   {typo_pairs} edit-distance-1 vocabulary pairs")
    print("per-language train stats:")
    for r in stats.collect():
        print(f"  {r['lang_pred']}: {r['docs']} docs, {r['tokens']} tokens")
    print("IVF top-3 neighbors for 2 query vectors:")
    for r in knn.collect():
        print(f"  q{r['query_id']} -> vec {r['vec_id']} (cos {r['cosine']:.4f})")

    # 9. pack the train split into fixed 512-token training sequences
    packed = ta.pack_sequences(
        train.select("doc_id", F.col("lang_pred").alias("lang"), "n_tokens")
    )
    seqs = packed.agg(
        F.count("*").alias("n_seqs"),
        F.sum("seq_tokens").alias("tokens"),
    ).collect()[0]
    print(f"packed sequences:  {seqs['n_seqs']} x 512 tokens "
          f"({seqs['tokens']} tokens, "
          f"{seqs['tokens'] / (seqs['n_seqs'] * 512.0):.1%} fill)")

    # 9b. telemetry: distinct-user reach per event type via the portable
    # HLL (mergeable 512-register state — build per shard, MAX-merge)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    regs = portable_hll_registers(events, ["event_type"], "user_id")
    reach = portable_hll_estimate(regs, ["event_type"]).orderBy("event_type")
    print("distinct-user reach (portable HLL):")
    for r in reach.collect():
        print(f"  {r['event_type']}: ~{r['distinct_est']:.0f} users")

    # 10. multimodal lane: decode + thumbnail a small image batch for real
    # (mixed containers: PNG and lossless WebP through the same kernel)
    import numpy as np

    from zarr_climate_etl_ipfs_spark.mediacodecs import encode_png
    from zarr_climate_etl_ipfs_spark.multimodal import resize_images
    from zarr_climate_etl_ipfs_spark.webp_vp8l import encode_webp

    def _img(i):
        raster = np.full((16 + i, 16 + i, 3), 40 * i % 251, dtype=np.uint8)
        return encode_png(raster) if i % 2 == 0 else encode_webp(raster)

    thumbs = spark.createDataFrame(
        [(int(i), bytearray(_img(i))) for i in range(4)],
        "doc_id long, content binary",
    )
    tstats = resize_images(thumbs, 8, 8).agg(
        F.sum(F.col("decode_ok").cast("int")).alias("ok"),
        F.round(F.avg("out_mean"), 1).alias("avg_mean"),
    ).collect()[0]
    print(f"thumbnails:        {tstats['ok']}/4 decoded+resized to 8x8 "
          f"(avg mean {tstats['avg_mean']})")
    spark.stop()


if __name__ == "__main__":
    main()
