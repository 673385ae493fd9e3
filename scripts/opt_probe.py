"""Optimization probe (round 12/13): time individual registry queries in
isolation (noop sink, min-of-N, clearCache between runs — the bench.py
methodology) and dump their ``explain("formatted")`` plans.

Usage:
    python scripts/opt_probe.py q1 q2 ...            # time queries
    python scripts/opt_probe.py --plans q1 q2 ...    # also dump plans
    python scripts/opt_probe.py --suffix after ...   # plans/<round>/<q>_after.txt

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_PROBE_RUNS (default 3).
Prints one JSON line per query so A/B numbers are grep-able.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_data_counter_spark.plans.registry import QUERIES
from kinesis_data_counter_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_PLANS_ROUND", "r13")
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    if dump_plans:
        args.remove("--plans")
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    runs = int(os.environ.get("SPARK_PROBE_RUNS", "3"))
    names = args
    spark = get_spark(app_name="kdc-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS_DIR, exist_ok=True)

    for name in names:
        q = QUERIES[name]
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"probe:{name}#{r}")
            t0 = time.time()
            df = q.builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        if dump_plans:
            df = q.builder(spark, SF_DIR)
            with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "min": min(times), "times": times}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
