"""Dataset-operations example — the round-6 operator surface composed the
way a recurring training-data refresh would use it.

    documents (yesterday's snapshot vs today's)
      → snapshot diff: what changed?                 operators/history.py
      → drift monitor: did the distribution move?    metrics.py
      → web-provenance gate: blocklist + domain cap  operators/web.py
      → URL canonicalization (tracking-param scrub)  operators/web.py
      → domain-authority PageRank                    operators/web.py
      → NB classifier gate (trained on a seed slice) operators/classify.py
      → wordlist gate                                operators/text.py
      → boilerplate removal (doc-frequency rule)     operators/corpus.py
      → overlapping chunks for the retrieval index   operators/corpus.py
      → seeded shuffle-to-shards training layout     operators/sampling.py

Run:  python examples/dataset_ops_pipeline.py [sf_dir]

Every stage is the same operator the registry oracles pin; this script
composes them and prints the refresh report. The scale story is the sum
of its parts: the diff is one full outer join, drift is two scans, the
web gate broadcasts its blocklist and caps without a global window, and
the shard layout never sorts globally.
"""

from __future__ import annotations

import os
import sys

# executor import visibility is handled centrally: get_spark() exports
# the package dir on PYTHONPATH before the session is built
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_data_counter_spark.metrics import drift_report
from kinesis_data_counter_spark.operators.corpus import (
    boilerplate_removal,
    chunk_overlap,
)
from kinesis_data_counter_spark.operators.history import snapshot_diff
from kinesis_data_counter_spark.operators.sampling import shuffle_shards
from kinesis_data_counter_spark.operators.text import wordlist_score
from kinesis_data_counter_spark.operators.classify import nb_score, nb_train
from kinesis_data_counter_spark.operators.web import (
    blocklist_filter,
    canonical_url,
    domain_cap,
    pagerank,
)
from kinesis_data_counter_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dataset-ops-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]

    # two snapshot versions carved from the fixture: today adds, drops and
    # edits documents relative to yesterday
    old = docs.filter(F.col("doc_id") % 13 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" edited"))
        ).otherwise(F.col("text")),
    )
    diff = snapshot_diff(old, new, "doc_id", ["text"])
    print("snapshot diff:", {
        r["change_type"]: r["n"]
        for r in diff.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    })

    drift = drift_report(
        old, new, numeric_cols=("n_chars",), categorical_cols=("lang",)
    )
    for r in drift.collect():
        print(f"drift {r['col_name']}: psi={r['psi']} drifted={r['drifted']}")

    # provenance gate on synthetic URLs (real corpora carry a url column)
    with_urls = new.withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example-"),
            (F.col("doc_id") % 3).cast("string"), F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ),
    )
    blocked = spark.createDataFrame([("example-1.com",)], "domain string")
    gated = blocklist_filter(with_urls, blocked)
    capped = domain_cap(gated, cap=30).filter(F.col("kept"))
    print("after web gate:", capped.count(), "docs")

    # URL-level dedup key: the crawler recorded half the URLs with click
    # trackers and fragments — canonicalization collapses them for free
    messy = capped.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("url"), F.lit("?utm_source=feed&fbclid=abc#top")),
        ).otherwise(F.col("url")),
    )
    canon = messy.withColumn("url_key", canonical_url(F.col("url")))
    print(
        "canonical keys:",
        canon.select("url_key").distinct().count(),
        "from", canon.count(), "raw urls",
        "(tracking params scrubbed on",
        canon.filter(F.col("url_key") != F.col("url")).count(), "docs)",
    )

    # domain authority: who links to whom (synthetic link derivation);
    # the rank table is what a crawler's frontier prioritizer consumes
    edges = canon.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("src"),
        F.concat(
            F.lit("src"),
            ((F.col("doc_id") * 7 + F.expr("doc_id div 20")) % 20).cast("string"),
            F.lit(".example.com"),
        ).alias("dst"),
    )
    ranks = pagerank(edges, iters=3)
    top = ranks.orderBy(F.col("rank").desc(), "node").limit(3).collect()
    print("top authority domains:", [(r.node, r.rank) for r in top])

    # model-based gate over the WHOLE refresh corpus: a labeled seed
    # slice (here: lang as the label, with a planted marker standing in
    # for real signal) trains the NB model; the rest is scored by one
    # broadcast-join pass
    marked = new.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                (F.col("doc_id") % 5 != 0) & F.col("lang").isNotNull(),
                F.concat(F.lit(" marker"), F.col("lang")),
            ).otherwise(F.lit("")),
        ),
    )
    seed = marked.filter(F.col("doc_id") % 2 == 0)
    model = nb_train(seed, label_col="lang")
    scored = nb_score(marked.filter(F.col("doc_id") % 2 != 0), model,
                      keep_cols=("lang",))
    agree = scored.filter(F.col("predicted") == F.col("lang")).count()
    total = scored.count()
    print(f"NB gate agreement: {agree}/{total}")

    clean_words = capped.join(
        wordlist_score(capped, words=("slow",), threshold=0.1)
        .filter(~F.col("flagged"))
        .select("doc_id"),
        "doc_id",
    )
    deboiler = boilerplate_removal(clean_words, chunk_words=8, max_docs=2)
    print("boilerplate dropped chunks:",
          deboiler.agg(F.sum("n_dropped")).collect()[0][0])

    survivors = deboiler.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_out").alias("text")
    )
    chunks = chunk_overlap(survivors, size=32, stride=24)
    print("retrieval chunks:", chunks.count())

    shards = shuffle_shards(survivors, n_shards=4, seed="refresh-7")
    print("shard sizes:", {
        r["shard"]: r["n"]
        for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()
    })
    spark.stop()


if __name__ == "__main__":
    main()
