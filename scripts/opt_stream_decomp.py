"""Decompose streaming_curate / streaming_neardup_index wall time:
fixture prep vs availableNow drain vs final read/split, and per-write
costs inside each micro-batch (by timing _write_batch_keyed calls).

Usage: python scripts/opt_stream_decomp.py [curate|neardup|segdedup]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_data_counter_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "curate"
    spark = get_spark(app_name="kdc-stream-decomp")
    spark.sparkContext.setLogLevel("ERROR")

    import kinesis_data_counter_spark.streaming.runner as RN
    from kinesis_data_counter_spark.plans.registry import _ordered_doc_slices

    # instrument the batch-keyed writes
    orig_write = RN._write_batch_keyed
    write_log: list[tuple[str, int, float]] = []

    def timed_write(df, root, epoch):
        t0 = time.time()
        orig_write(df, root, epoch)
        write_log.append((os.path.basename(root), epoch, round(time.time() - t0, 3)))

    RN._write_batch_keyed = timed_write

    # instrument the per-batch processor entry/exit
    batch_log: list[tuple[int, float]] = []
    if which == "curate":
        orig_batch = RN._curate_batch

        def timed_batch(spark_, batch_df, epoch, work_dir, **kw):
            t0 = time.time()
            orig_batch(spark_, batch_df, epoch, work_dir, **kw)
            batch_log.append((epoch, round(time.time() - t0, 3)))

        RN._curate_batch = timed_batch

    # warmup: prime JVM/codegen with a small job
    from kinesis_data_counter_spark.session import load_tables
    load_tables(spark, SF_DIR, ("documents",))["documents"].count()

    t0 = time.time()
    src, work = _ordered_doc_slices(spark, SF_DIR, f"kdc_decomp_{which}_")
    t_prep = time.time() - t0

    t0 = time.time()
    if which == "curate":
        res = RN.stream_curate(spark, src, work)
    elif which == "neardup":
        res = RN.stream_neardup_index(spark, src, work)
    else:
        res = RN.stream_segment_dedup(spark, src, work, chunk_words=8).select(
            "doc_id", "text_out", "n_kept", "n_dropped"
        )
    t_build = time.time() - t0  # includes the drain (awaitTermination)

    t0 = time.time()
    res.write.format("noop").mode("overwrite").save()
    t_final = time.time() - t0

    print(json.dumps({
        "which": which,
        "prep_s": round(t_prep, 3),
        "drain_plus_build_s": round(t_build, 3),
        "final_noop_s": round(t_final, 3),
        "total_s": round(t_prep + t_build + t_final, 3),
        "batches": batch_log,
        "writes": write_log,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
