"""Ad-hoc quiet-machine A/B for the streaming entries (round 12).

Replicates the tracked bench protocol exactly — fresh builders, noop
write, min-of-N, spark.catalog.clearCache() between iterations — for
`streaming_curate` and `streaming_neardup_index` only, so the
first-batch band-table reuse (minhash_lsh_pairs bands_table=) can be
adjudicated against the tracked run-1/run-2 lines (old code, same
protocol, same quiet machine).

Also prints a per-write decomposition of one extra `streaming_curate`
run: `_write_batch_keyed` is monkeypatched to record wall time per
(table, epoch) — Spark executes each batch's plan at write time, so
these attribute the per-batch compute to the stage that pays it.

Usage:  python scripts/ab_streaming_curate.py [runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses get_spark/SF_DIR conventions)
from kinesis_data_counter_spark.plans import registry  # noqa: E402

ENTRIES = ("streaming_curate", "streaming_neardup_index")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.get_spark()
    queries = registry.QUERIES

    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in ENTRIES:
            q = queries[name]
            t0 = time.time()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            spark.catalog.clearCache()
    print({"min_of": runs, "sf_dir": sf_dir, **timings})

    # one decomposed run of streaming_curate: per-write wall attribution
    from kinesis_data_counter_spark.streaming import runner as R

    orig = R._write_batch_keyed
    decomp: list[tuple[str, int, float]] = []

    def timed(df, root, epoch):
        t0 = time.time()
        orig(df, root, epoch)
        decomp.append((os.path.basename(root), epoch, round(time.time() - t0, 3)))

    R._write_batch_keyed = timed
    try:
        t0 = time.time()
        df = queries["streaming_curate"].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        total = round(time.time() - t0, 3)
    finally:
        R._write_batch_keyed = orig
    spark.catalog.clearCache()
    print({"decomposed_total_s": total})
    for table, epoch, dt in decomp:
        print(f"  batch={epoch} {table:16s} {dt:6.3f}s")
    print(f"  writes_total={round(sum(d[2] for d in decomp), 3)}s "
          f"(rest = fixture prep + checkpoint/trigger machinery + drain split)")


if __name__ == "__main__":
    main()
