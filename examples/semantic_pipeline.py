"""Embedding-space curation + tokenizer + retrieval example — the round-5
operator surface composed the way a training-data run would use it.

    documents + embeddings
      → quality gate                                 operators/text.py
      → exact dedup                                  operators/dedup.py
      → SemDeDup (cluster-scoped semantic dedup)     operators/similarity.py
      → BPE tokenizer: train on a bounded sample,
        encode + roundtrip-check the survivors       operators/text.py
      → contrastive hard negatives for the
        labeled embedding set                        operators/similarity.py
      → BM25 ranked retrieval over the corpus        operators/text.py
      → fuzzy (edit-distance ≤ 2) key dedup on a
        dimension column                             operators/dedup.py

Run:  python examples/semantic_pipeline.py [sf_dir]

Every stage is the same operator the registry oracles pin; this script
just composes them and prints the funnel. At scale the only knobs that
move are SemDeDup's k (cluster size ≈ corpus/k is the memory unit) and
the LSH parameters behind the bucketed hard-negative miner.
"""

from __future__ import annotations

import os
import sys

# executor import visibility is handled centrally: get_spark() exports
# the package dir on PYTHONPATH before the session is built
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_data_counter_spark.operators import dedup as DD
from kinesis_data_counter_spark.operators import similarity as SIM
from kinesis_data_counter_spark.operators import text as TX
from kinesis_data_counter_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="semantic-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ("documents", "embeddings", "part"))
    docs, emb = t["documents"], t["embeddings"]

    # 1-2. quality gate + exact dedup (the lexical front of the funnel)
    qual = (
        TX.quality_features(docs.select("doc_id", "text"), "text")
        .filter(F.col("quality_ok"))
        .select("doc_id", "text")
    )
    ex = DD.deduplicate_exact(qual, "text", "doc_id").persist()

    # 3. SemDeDup over the survivors' embeddings (docs without an
    #    embedding keep — they cannot be semantically deduped)
    surv_emb = emb.join(
        ex.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).select("vec_id", "embedding")
    sem = SIM.semdedup(surv_emb, dim=64, k=8, threshold=0.3)
    final = ex.join(
        sem.filter(~F.col("keep")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    ).persist()

    n_in, n_q, n_ex, n_fin = (
        docs.count(), qual.count(), ex.count(), final.count(),
    )
    print(f"funnel: {n_in} raw -> {n_q} quality -> {n_ex} exact -> "
          f"{n_fin} after SemDeDup")

    # 4. BPE: train on a bounded md5 sample, tokenize the survivors
    merges = TX.bpe_train_merges(final, num_merges=150, sample_docs=256)
    (stats,) = TX.bpe_roundtrip_stats(final, merges).collect()
    print(f"bpe: {len(merges)} merges, {stats.n_nonnull} docs tokenized, "
          f"roundtrip_all={stats.roundtrip_all} "
          f"compression_ok={stats.compression_ok}")

    # 5. hard negatives for contrastive training (broadcast-sized anchors)
    anchors = emb.filter(F.col("vec_id") % 23 == 0)
    hn = SIM.mine_hard_negatives(emb, anchors, k=1)
    print(f"hard negatives: {hn.count()} (anchor, negative) pairs")

    # 6. BM25: which surviving docs best match a query?
    top = TX.bm25_scores(final, ("spark", "merge"), k=3).collect()
    for r in sorted(top, key=lambda r: r.rank):
        print(f"bm25 #{r.rank}: doc {r.doc_id} score {r.score}")

    # 7. fuzzy key dedup on a dimension column
    pairs = DD.fuzzy_string_pairs(t["part"], "p_name", max_dist=2)
    print(f"fuzzy part-name pairs (edit distance <= 2): {pairs.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
