"""End-to-end training-data curation example: the composition a data run
actually executes, built from this engine's operators.

    raw documents
      → quality gate (Gopher-style features)        operators/text.py
      → language gate                               operators/text.py
      → exact dedup                                 operators/dedup.py
      → near-dup cluster dedup (MinHash-LSH + CC)   operators/dedup.py
      → segment dedup (cross-doc first occurrence)  operators/corpus.py
      → LM-quality tiering (drop the low third)     operators/corpus.py
      → decontaminate vs an eval slice              operators/corpus.py
      → pack into fixed token-budget sequences      operators/corpus.py
      → curated parquet write                       io.py

Run:  python examples/curation_pipeline.py [sf_dir] [out_dir]

Every stage is a lazy DataFrame transformation — the funnel counts at the
end are the only actions. At 100 TB the same composition runs unchanged;
the inter-stage persists/checkpoints and the output table format are the
deployment's choice (see clean_corpus docstring).
"""

from __future__ import annotations

import os
import shutil
import sys

# executor import visibility is handled centrally: get_spark() exports
# the package dir on PYTHONPATH before the session is built
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_data_counter_spark.io import write_curated
from kinesis_data_counter_spark.operators.corpus import (
    clean_corpus,
    decontaminate,
    pack_sequences,
    quality_tiers,
    segment_dedup,
)
from kinesis_data_counter_spark.session import get_spark, load_tables


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark(app_name="curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf, ("documents",))["documents"]

    survivors, funnel = clean_corpus(docs)
    f = funnel.collect()[0].asDict()

    # cross-doc segment dedup: drop chunk-level boilerplate the doc-level
    # stages cannot see, then rebuild the text column from the survivors
    seg = segment_dedup(survivors, chunk_words=8)
    survivors = (
        survivors.drop("text")
        .join(seg.filter(F.col("n_kept") > 0), "doc_id")
        .withColumnRenamed("text_out", "text")
        .drop("n_kept", "n_dropped")
    )
    f["n_segment_deduped"] = survivors.count()

    # LM-quality tiering (sketch cutoffs — no global sort): keep high+mid
    tiers = quality_tiers(survivors, mode="sketch")
    survivors = survivors.join(
        tiers.filter(F.col("tier") != "low").select("doc_id"), "doc_id"
    )
    f["n_quality_kept"] = survivors.count()

    # benchmark decontamination: drop survivors sharing an 8-gram with the
    # held-out eval slice (here: a deterministic 1/7th of the corpus)
    eval_docs = docs.filter(F.col("doc_id") % 7 == 0)
    contaminated = decontaminate(survivors, eval_docs, n=8).select("doc_id")
    clean = survivors.join(contaminated, "doc_id", "left_anti")
    f["n_decontaminated"] = clean.count()

    packed = pack_sequences(clean, budget=2048, n_groups=32)
    f["n_sequences"] = (
        packed.groupBy("grp", "start_seq").count().count()
    )

    shutil.rmtree(out, ignore_errors=True)
    write_curated(
        clean.join(packed.select("doc_id", "grp", "start_seq"), "doc_id"),
        out,
        partition_by=("lang",),
        sort_by=("grp", "start_seq"),
    )
    f["n_written"] = spark.read.parquet(out).count()
    print(f)


if __name__ == "__main__":
    main()
