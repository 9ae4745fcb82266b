"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark and its oracle_sql() in
DuckDB over the same parquet views; compares row count, sorted column
names, and order-insensitive values. Exit 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # any number of name substrings; a query runs if it matches ANY
    name_filters = sys.argv[2:]
    import __spark_entry__ as e
    from go_mysql_elasticsearch_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failures = []
    t_start = time.monotonic()
    for name, fn in qs.items():
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        dt = time.monotonic() - t0
        if name not in os_:
            print(f"  {name:32s} rows={len(srows):6d} (rows-only, no oracle) [{dt:5.2f}s]")
            continue
        ores = con.sql(os_[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = ok_cols and ok_count and norm_rows(scols, [tuple(r) for r in srows]) == norm_rows(ocols, orows)
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        dt = time.monotonic() - t0
        print(f"  {name:32s} {status} rows={len(srows)}/{len(orows)} [{dt:5.2f}s] cols={'=' if ok_cols else f'{scols} vs {ocols}'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_count:
                a = norm_rows(scols, [tuple(r) for r in srows])
                b = norm_rows(ocols, orows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"      spark={x}  oracle={y}")
    print(f"total wall: {time.monotonic() - t_start:.1f}s")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
