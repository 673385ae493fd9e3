"""Falsification twins for every boolean-property oracle (VERDICT r4 item 2).

A property harness that can only ever print True is not evidence — it is a
tautology. ``dedup_exact_docs`` was green-because-empty until round 4
(commit 1e3827a); this suite closes the sibling failure mode
green-because-unfalsifiable: for each ok/size_ok/partition_ok/no_undercount
family in the registry, a negative control feeds a deliberately broken
input (crippled sketch, halved data, degenerate bucketing, wrong quantile)
and asserts the boolean comes out **False**. The recall-family controls
(LSH single-table, PQ no-refine, kNN agreement, PCA) live in
tests/test_similarity.py (commit 5992507); this file covers the rest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import kinesis_data_counter_spark.operators.sketches as SK
import kinesis_data_counter_spark.operators.similarity as SIM
from kinesis_data_counter_spark.plans.registry import (
    _hll_ok,
    _quartile_bucket_props,
    _range_band_ok,
    _tier_size_ok,
)


def _one(spark, *cols):
    return spark.range(1).select(*cols)


def test_hll_tolerance_band_rejects_far_estimates(spark):
    # the band behind counter_distinct_user/two_level/hll_rollup_hierarchy:
    # |approx − exact| ≤ max(1, 2%·exact)
    bad = _one(spark, _hll_ok(F.lit(1000.0), F.lit(10.0))).collect()[0][0]
    good = _one(spark, _hll_ok(F.lit(10.0), F.lit(10.0))).collect()[0][0]
    edge = _one(spark, _hll_ok(F.lit(11.0), F.lit(10.0))).collect()[0][0]
    assert bad is False and good is True and edge is True


def test_percentile_range_band_rejects(spark):
    # stats_percentiles' ok: 5% of the value range
    bad = _one(
        spark, _range_band_ok(F.lit(990.0), F.lit(500.0), F.lit(0.0), F.lit(1000.0))
    ).collect()[0][0]
    good = _one(
        spark, _range_band_ok(F.lit(510.0), F.lit(500.0), F.lit(0.0), F.lit(1000.0))
    ).collect()[0][0]
    assert bad is False and good is True


def test_tier_size_band_rejects_uneven_tiers(spark):
    # corpus_quality_tiers' size_ok: a tier holding 1/6 instead of 1/3
    # of a 600-doc corpus must fail (tol = max(5, 18))
    bad = _one(spark, _tier_size_ok(F.lit(100.0), F.lit(600.0))).collect()[0][0]
    good = _one(spark, _tier_size_ok(F.lit(205.0), F.lit(600.0))).collect()[0][0]
    assert bad is False and good is True


def test_quartile_bucket_props_reject_broken_bucketing(spark):
    # rfm_segments_sketch's two booleans:
    # (a) buckets that do not partition the set → partition_ok False
    # (b) a degenerate single bucket (all thresholds collapsed) → size_ok
    #     False even though it technically "partitions"
    agg = spark.createDataFrame(
        [("a", 4, 900, [250, 250, 250, 150]),   # covered 900 != n 1000
         ("b", 1, 1000, [1000])],               # one fat bucket
        "dim string, n_buckets int, covered long, cnts array<long>",
    )
    ties = spark.createDataFrame([("a", 1), ("b", 1)], "dim string, tie_max long")
    tot = spark.createDataFrame([("a", 1000), ("b", 1000)], "dim string, n long")
    rows = {r["dim"]: r for r in _quartile_bucket_props(agg, ties, tot).collect()}
    assert rows["a"]["partition_ok"] is False
    assert rows["b"]["partition_ok"] is True and rows["b"]["size_ok"] is False
    # positive control: an honest 4-way split passes both
    agg_ok = spark.createDataFrame(
        [("c", 4, 1000, [250, 250, 251, 249])],
        "dim string, n_buckets int, covered long, cnts array<long>",
    )
    ties_ok = spark.createDataFrame([("c", 2)], "dim string, tie_max long")
    tot_ok = spark.createDataFrame([("c", 1000)], "dim string, n long")
    (r,) = _quartile_bucket_props(agg_ok, ties_ok, tot_ok).collect()
    assert r["partition_ok"] is True and r["size_ok"] is True


def test_cms_built_on_half_the_data_undercounts(spark):
    # cms_heavy_hitters' no_undercount is CMS's one-sided guarantee — but
    # only for a sketch that saw every row. A sketch built on HALF the
    # stream must undercount the true totals, and the comparison must say
    # so: est('a') ≤ 50 + 25 (all of b colliding) < 100.
    rows = [("a",)] * 100 + [("b",)] * 50
    df = spark.createDataFrame(rows, "item string")
    half = spark.createDataFrame(rows[:50] + rows[100:125], "item string")
    merged = SK.cms_merge(SK.cms_partials(half, "item", depth=4, hex_chars=2))
    est = SK.cms_point_estimates(merged, df, "item", depth=4, hex_chars=2)
    exact = df.groupBy(F.col("item")).agg(F.count(F.lit(1)).alias("exact"))
    out = {
        r["item"]: r
        for r in est.join(exact, "item")
        .select("item", (F.col("est") >= F.col("exact")).alias("no_undercount"))
        .collect()
    }
    assert out["a"]["no_undercount"] is False
    # positive control: the full-data sketch never undercounts
    merged_full = SK.cms_merge(SK.cms_partials(df, "item", depth=4, hex_chars=2))
    est_full = SK.cms_point_estimates(merged_full, df, "item", depth=4, hex_chars=2)
    assert all(
        r["ok"]
        for r in est_full.join(exact, "item")
        .select((F.col("est") >= F.col("exact")).alias("ok"))
        .collect()
    )


def test_theta_exact_mode_comparison_discriminates(spark):
    # counter_distinct_theta's oracle compares theta estimates against
    # exact distincts (exact mode under 4096/group). A sketch fed only
    # half the distinct values must NOT match — the equality compare is
    # doing real work.
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    half = df.filter(F.col("user_id") < 100)
    (r_half,) = SK.theta_distinct_windowed(half, "user_id", "1 hour").collect()
    (r_full,) = SK.theta_distinct_windowed(df, "user_id", "1 hour").collect()
    assert r_full["approx"] == 200 and r_half["approx"] == 100
    assert r_half["approx"] != r_full["approx"]


def test_kll_band_rejects_wrong_quantile(spark):
    # quantile_rollup_value's ok: est must land between the exact
    # percentiles at q∓0.04. Asking the sketch for p99 and holding it to
    # the p50 band must fail on any spread-out distribution.
    df = spark.range(1, 1001).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("value")
    )
    est = SK.quantile_two_level(df, "value", quantiles=(0.99,), group_col="g")
    band = df.groupBy(F.col("g").alias("group")).agg(
        F.percentile("value", F.lit(0.46)).alias("lo"),
        F.percentile("value", F.lit(0.54)).alias("hi"),
    )
    (bad,) = (
        est.join(band, "group")
        .select(F.col("est").between(F.col("lo"), F.col("hi")).alias("ok"))
        .collect()
    )
    assert bad["ok"] is False
    # positive control: p50 against its own band passes
    est50 = SK.quantile_two_level(df, "value", quantiles=(0.5,), group_col="g")
    (good,) = (
        est50.join(band, "group")
        .select(F.col("est").between(F.col("lo"), F.col("hi")).alias("ok"))
        .collect()
    )
    assert good["ok"] is True


def _planted_vectors(spark, n=120, dim=8, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ivf_recall_check_can_fail(spark):
    # ann_ivf_recall's ok: nprobe=1 over many lists on isotropic data
    # (ANN's worst case) must miss neighbors and report ok=False
    df = _planted_vectors(spark, n=200, dim=16, seed=13)
    queries = df.filter(F.col("vec_id") % 41 == 0)
    (r,) = SIM.ann_recall_check(
        df, queries, dim=16, k=10, min_recall=0.9,
        method="ivf", num_lists=16, nprobe=1,
    ).collect()
    assert r["ok"] is False and r["recall"] < 0.9, r


def test_quantized_recall_check_can_fail(spark):
    # ann_quantized_recall's ok: a corpus with one huge constant dimension
    # collapses the int8 code space (everything quantizes to [127,0,...]),
    # so the quantized ranking is tie-broken noise → recall tanks
    import random

    rng = random.Random(17)
    rows = [
        (i, [50.0] + [rng.uniform(-0.5, 0.5) for _ in range(7)])
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 10)
    (r,) = SIM.quantized_recall_check(df, queries, k=5, min_recall=0.9).collect()
    assert r["ok"] is False and r["recall"] < 0.9, r


# ---------------------------------------------------------------------------
# round-7 falsifiers (VERDICT r6 task 7): the three property booleans the
# census below found uncovered
# ---------------------------------------------------------------------------


def test_simhash_narrow_banding_misses_pairs(spark):
    # dedup_simhash's ok compares banded pairs against the brute hamming
    # scan. Banding for radius 1 while the truth needs radius 3 must MISS
    # pairs — the count comparison does real work. Signatures injected
    # directly: 0b000↔0b001 is hamming 1 (found), 0b001↔0b111 is hamming 2
    # and 0b000↔0b111 hamming 3 (both beyond the radius-1 banding).
    import kinesis_data_counter_spark.operators.dedup as DD

    sig = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 7)], "doc_id long, simhash long"
    )
    docs = sig.select("doc_id")  # signatures short-circuit the text pass
    banded = {
        (r.a_id, r.b_id)
        for r in DD.simhash_pairs(docs, max_hamming=1, signatures=sig).collect()
    }
    a = sig.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("hb"))
    brute = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .select("a_id", "b_id")
        .collect()
    }
    assert banded == {(0, 1)}
    assert brute == {(0, 1), (0, 2), (1, 2)}
    assert banded != brute  # the ok comparison would report False


def test_compaction_files_reduced_can_be_false(spark, tmp_path):
    # layout_compaction's files_reduced: compacting an already-compact
    # single-file dataset cannot reduce the file count, and the boolean
    # must say so instead of being constant-True
    from kinesis_data_counter_spark.io import compact_dataset

    path = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.parquet(path)
    stats = compact_dataset(spark, path, target_file_mb=64)
    assert stats["files_before"] == 1
    assert not (stats["files_after"] < stats["files_before"])


def test_decode_roundtrip_ok_rejects_non_grayscale_bmp(spark):
    # multimodal_decode's roundtrip_ok (BMP branch) asserts grayscale
    # faithfulness — all three channels of every pixel agree. Tampering
    # one channel byte of a valid container must flip it to False.
    from kinesis_data_counter_spark.operators import multimodal as MM

    good = MM.encode_bmp(b"ab", 2, 1)
    bad = bytearray(good)
    bad[54] ^= 0xFF  # first content byte = blue channel of pixel (0,0)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bad)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in MM.decode_media_table(df).collect()}
    assert rows[0].roundtrip_ok is True
    assert rows[1].roundtrip_ok is False


# ---------------------------------------------------------------------------
# falsifier census (VERDICT r6 task 7): every registry entry whose output
# carries a PROPERTY boolean — a tolerance/invariant verdict about the
# computation itself (ok / recall / roundtrip / no_undercount / size_ok /
# files_reduced), as opposed to a DATA LABEL the DuckDB twin recomputes
# exactly — must have a registered negative control proving the boolean
# can come out False. New boolean-emitting entries fail this test until
# they either register a falsifier or declare the column a data label.
# ---------------------------------------------------------------------------

# entry -> list of (test_file, test_name) negative controls
FALSIFIER_REGISTRY: dict[str, list[tuple[str, str]]] = {
    "ann_lsh_recall": [("tests/test_similarity.py", "test_property_harnesses_are_not_tautologies")],
    "ann_pq_recall": [("tests/test_similarity.py", "test_property_harnesses_are_not_tautologies")],
    "ann_ivf_pq_recall": [
        ("tests/test_similarity.py", "test_property_harnesses_are_not_tautologies"),
        ("tests/test_falsification.py", "test_ivf_recall_check_can_fail"),
    ],
    "ann_ivf_recall": [("tests/test_falsification.py", "test_ivf_recall_check_can_fail")],
    "ann_quantized_recall": [("tests/test_falsification.py", "test_quantized_recall_check_can_fail")],
    "ann_hard_negative_agreement": [("tests/test_similarity.py", "test_hard_negative_agreement_check_can_fail")],
    "cms_heavy_hitters": [("tests/test_falsification.py", "test_cms_built_on_half_the_data_undercounts")],
    "corpus_quality_tiers": [("tests/test_falsification.py", "test_tier_size_band_rejects_uneven_tiers")],
    "counter_distinct_expr": [("tests/test_falsification.py", "test_hll_tolerance_band_rejects_far_estimates")],
    "counter_distinct_user": [("tests/test_falsification.py", "test_hll_tolerance_band_rejects_far_estimates")],
    "counter_two_level": [("tests/test_falsification.py", "test_hll_tolerance_band_rejects_far_estimates")],
    "hll_rollup_hierarchy": [("tests/test_falsification.py", "test_hll_tolerance_band_rejects_far_estimates")],
    "join_cardinality_sketch": [("tests/test_falsification.py", "test_hll_tolerance_band_rejects_far_estimates")],
    "dedup_simhash": [("tests/test_falsification.py", "test_simhash_narrow_banding_misses_pairs")],
    "embedding_pca_check": [("tests/test_similarity.py", "test_pca_check_property_and_negative_control")],
    "knn_bucketed_recall": [("tests/test_similarity.py", "test_property_harnesses_are_not_tautologies")],
    "knn_label_propagation_bucketed": [("tests/test_similarity.py", "test_property_harnesses_are_not_tautologies")],
    "layout_compaction": [("tests/test_falsification.py", "test_compaction_files_reduced_can_be_false")],
    "multimodal_decode": [("tests/test_falsification.py", "test_decode_roundtrip_ok_rejects_non_grayscale_bmp")],
    "multimodal_png_roundtrip": [("tests/test_multimodal.py", "test_png_roundtrip_table_and_decode_media_dispatch")],
    "quantile_rollup_value": [("tests/test_falsification.py", "test_kll_band_rejects_wrong_quantile")],
    "quality_expectations": [("tests/test_metrics.py", "test_validate_expectations_counts_each_rule")],
    "rfm_segments_sketch": [("tests/test_falsification.py", "test_quartile_bucket_props_reject_broken_bucketing")],
    "stats_percentiles": [("tests/test_falsification.py", "test_percentile_range_band_rejects")],
    "text_bpe_roundtrip": [("tests/test_text.py", "test_bpe_falsification_controls")],
}

# data-label booleans: the exact-value DuckDB oracle recomputes the same
# label independently, so green cannot be a tautology of the harness (and
# the vacuous-green sweep in test_oracle.py guards empty outputs)
DATA_LABEL_BOOLEANS: dict[str, set[str]] = {
    "dedup_semdedup": {"keep"},
    "events_daily_anomaly": {"is_anomaly"},
    "profile_drift": {"drifted"},
    "scd2_user_state": {"is_current"},
    "text_jq_normalize": {"has_url"},
    "text_lm_score": {"low_quality"},
    "text_quality": {"quality_ok"},
    "text_wordlist_filter": {"flagged"},
    "web_domain_curation": {"blocked", "kept"},
}


def test_falsifier_census(spark, sf_dir):
    import os
    import re

    from pyspark.sql.types import BooleanType

    from kinesis_data_counter_spark.plans.registry import QUERIES

    from _build_cache import built

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missing: list[str] = []
    for name, q in QUERIES.items():
        # shared session build cache: the streaming builders drain a real
        # stream at build time, and this census only needs the schema
        df = built(spark, sf_dir, name)
        bools = {f.name for f in df.schema.fields
                 if isinstance(f.dataType, BooleanType)}
        if not bools:
            continue
        if name in FALSIFIER_REGISTRY:
            continue
        if bools <= DATA_LABEL_BOOLEANS.get(name, set()):
            continue
        missing.append(f"{name}: {sorted(bools)}")
    assert not missing, (
        "boolean-emitting registry entries without a registered falsifier "
        f"or data-label declaration: {missing}"
    )
    # every registered falsifier must actually exist where it claims to
    broken = []
    for name, refs in FALSIFIER_REGISTRY.items():
        assert name in QUERIES, f"stale census key {name}"
        for path, test in refs:
            src = open(os.path.join(here, path)).read()
            if not re.search(rf"^def {re.escape(test)}\(", src, re.M):
                broken.append(f"{name} -> {path}::{test}")
    assert not broken, f"census points at missing tests: {broken}"


# ---------------------------------------------------------------------------
# third-engine pin census (VERDICT r8 task 3): Spark-vs-DuckDB twins share
# blind spots by construction — both sides are written from the same mental
# model, so a defect in the model itself survives the differential (a host-
# regex bug once survived a 250-case random differential because both
# engines carried the identical flawed regex). Every family whose semantics
# have a free choice (tie-breaks, smoothing, correction terms, filter
# variants) must therefore be pinned against an INDEPENDENT third reference
# — hand-derived vectors from a published worked example, a structurally
# independent reimplementation, a stdlib module, or an external binary —
# WITH a discriminating falsifier proving the pin can fail.
# ---------------------------------------------------------------------------

# family -> (test_file, falsifier/discriminator test name)
THIRD_ENGINE_PINS: dict[str, tuple[str, str]] = {
    "bpe_merge_trainer": (
        "tests/test_bpe_reference_vectors.py",
        "test_divergent_tiebreak_falsifier",
    ),
    "png_filters": (
        "tests/test_png_spec_vectors.py",
        "test_paeth_tie_vector_discriminates_strict_lt_variant",
    ),
    "expression_language": (
        "tests/test_expr_reference_differential.py",
        "test_table_discriminates_wrong_semantics",
    ),
    "pagerank": (
        "tests/test_pagerank_reference_vectors.py",
        "test_falsifier_no_dangling_redistribution_differs",
    ),
    "bm25": (
        "tests/test_bm25_reference_vectors.py",
        "test_falsifier_classic_idf_differs",
    ),
    "naive_bayes": (
        "tests/test_nb_reference_vectors.py",
        "test_falsifier_unsmoothed_flips_the_book_outcome",
    ),
    "pmi_collocations": (
        "tests/test_pmi_reference_vectors.py",
        "test_falsifier_unigram_denominator_differs",
    ),
    "tfidf": (
        "tests/test_tfidf_reference_vectors.py",
        "test_falsifier_unsmoothed_idf_flips_d1_top_keyword",
    ),
    "repetition_features": (
        "tests/test_repetition_reference_vectors.py",
        "test_falsifiers_differ_on_worked_example",
    ),
    "interval_joins": (
        "tests/test_interval_join_reference_vectors.py",
        "test_falsifier_exclusive_end_differs",
    ),
    "lm_quality_score": (
        "tests/test_lm_score_reference_vectors.py",
        "test_falsifier_per_type_average_differs",
    ),
    "sequence_packing": (
        "tests/test_packing_reference_vectors.py",
        "test_falsifier_no_straddle_variant_differs",
    ),
    "markov_transitions": (
        "tests/test_transitions_reference_vectors.py",
        "test_falsifier_dropping_tiebreak_differs",
    ),
    "sessionization": (
        "tests/test_sessionize_reference_vectors.py",
        "test_falsifier_gte_boundary_differs",
    ),
    "asof_join": (
        "tests/test_asof_reference_vectors.py",
        "test_falsifier_strict_inequality_differs",
    ),
    "winnowing": (
        "tests/test_winnow_reference_vectors.py",
        "test_falsifier_leftmost_tiebreak_differs",
    ),
    # round-10 additions (VERDICT r9 task 3): the four remaining
    # two-engine families
    "semdedup_kmeans": (
        "tests/test_semdedup_reference_vectors.py",
        "test_falsifier_high_tiebreak_differs",
    ),
    "psi_drift": (
        "tests/test_psi_reference_vectors.py",
        "test_falsifier_unfloored_variant_differs",
    ),
    "scd2_run_collapse": (
        "tests/test_scd2_reference_vectors.py",
        "test_falsifier_desc_tiebreak_differs",
    ),
    "morton_zorder": (
        "tests/test_zorder_reference_vectors.py",
        "test_falsifier_transposed_convention_differs",
    ),
    # round-11 additions (VERDICT r10 task 5): the remaining unpinned
    # numeric families
    "pq_adc": (
        "tests/test_pq_reference_vectors.py",
        "test_falsifier_swapped_subspace_order_differs",
    ),
    "pca_moments": (
        "tests/test_pca_reference_vectors.py",
        "test_falsifier_uncentered_moment_differs",
    ),
    "kll_rank_tolerance": (
        "tests/test_kll_reference_vectors.py",
        "test_falsifier_value_space_tolerance_differs",
    ),
    # round-12 additions (VERDICT r11 task 6): the free-choice families
    # previously pinned only by a DuckDB twin that shares the choice by
    # construction (the twin replays the same md5/banding expressions)
    "simhash_banding": (
        "tests/test_simhash_reference_vectors.py",
        "test_falsifier_larger_subset_variant_misses_pigeonhole_pair",
    ),
    "cms_cell_hashing": (
        "tests/test_cms_reference_vectors.py",
        "test_falsifier_unsalted_rows_differ",
    ),
    "shuffle_shards_bucketing": (
        "tests/test_shuffle_shards_reference_vectors.py",
        "test_falsifier_modulus_variant_differs",
    ),
    # external-third-implementation pins (stdlib / system binary)
    "jq_programs": (
        "tests/test_jq_random_differential.py",
        "test_random_values_match_real_jq",
    ),
    "url_host_parsing": (
        "tests/test_web.py",
        "test_host_of_differential_vs_urllib",
    ),
    "wav_container": (
        "tests/test_multimodal.py",
        "test_encode_wav_parses_with_stdlib_wave_module",
    ),
}


def test_third_engine_pin_census():
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    broken = []
    for family, (path, test) in THIRD_ENGINE_PINS.items():
        full = os.path.join(here, path)
        if not os.path.exists(full):
            broken.append(f"{family}: missing file {path}")
            continue
        src = open(full).read()
        if not re.search(rf"^def {re.escape(test)}\(", src, re.M):
            broken.append(f"{family}: {path} lacks {test}")
    assert not broken, f"third-engine pin census is stale: {broken}"
