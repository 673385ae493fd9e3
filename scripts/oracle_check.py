"""Local replica of the driver's correctness gate: run every queries() entry
against its oracle_sql() on DuckDB and compare row count + schema + values.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    # accepts positional [sf_dir] [query ...] and --sf/--only flag spellings;
    # comma-separated query lists split. Unknown query names are an error —
    # a filter that matches nothing must not report a vacuous ALL OK.
    args = sys.argv[1:]
    sf, names = None, []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf = args[i + 1]; i += 2
        elif a == "--only":
            names.extend(args[i + 1].split(",")); i += 2
        elif sf is None and (os.path.isdir(a) or "/" in a):
            sf = a; i += 1
        else:
            names.extend(a.split(",")); i += 1
    sf = sf or "/root/testdata/sf0.01"
    only = {n for n in names if n}

    import __spark_entry__ as e
    import kinesis_data_counter_spark as kdc

    spark = kdc.get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            failures.append(name)
            continue
        cols = sorted(sdf.columns)
        s = sdf[cols].sort_values(by=cols).reset_index(drop=True)
        o = odf[cols].sort_values(by=cols).reset_index(drop=True)
        # the driver's value hash can be dtype-sensitive (e.g. DuckDB HUGEINT →
        # pandas float64 vs Spark int64 renders 99111.0 vs 99111); surface it
        for c in cols:
            sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
            if sk != ok_ and {sk, ok_} <= {"i", "u", "f"}:
                print(f"warn {name}: column {c!r} dtype {s[c].dtype} (spark) vs "
                      f"{o[c].dtype} (oracle) — CAST the oracle to match")
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(s)} rows, {dt:.1f}s)")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ — {str(ex)[:500]}")
            diff = (s != o) & ~(s.isna() & o.isna())
            bad = diff.any(axis=1)
            print("spark:", s[bad].head(3).to_dict("records"))
            print("duck :", o[bad].head(3).to_dict("records"))
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
