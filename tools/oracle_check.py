"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + schema + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return int(v)
        return round(v, 9)
    # dates/timestamps/Decimal → canonical string
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return _norm(float(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    if sorted(spark_cols) != sorted(duck_cols):
        return f"schema {sorted(spark_cols)} vs {sorted(duck_cols)}"
    a = sorted((tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=repr)
    b = sorted((tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=repr)
    if a != b:
        for x, y in zip(a, b):
            if x != y:
                return f"value mismatch: {x} vs {y}"
        return "value mismatch (tail)"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import __spark_entry__ as entrymod
    from sen2rts_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failed, passed, rows_only = [], [], []
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"SPARK ERROR {type(exc).__name__}: {exc}"))
            print(f"FAIL  {name}: spark error {exc}")
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        err = compare(srows, scols, drows, dcols)
        if err:
            failed.append((name, err))
            print(f"FAIL  {name}: {err}")
        else:
            passed.append(name)
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== {len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed ==")
    for name, err in failed:
        print(f"  FAIL {name}: {err[:300]}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
