"""Self-check: run every queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, compare row counts + order-insensitive
values (mimics the driver's correctness gate)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from coa_codesearch_mcp_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not isinstance(r, dict) else r
        out.append(tuple(repr(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oq:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            rel = con.sql(oq[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, dcols)):
            failures.append((name, f"cols {scols} vs {dcols}"))
            print(f"FAIL {name}: cols {scols} vs {dcols}")
            continue
        a = norm([dict(zip(scols, r)) for r in srows], scols)
        b = norm([dict(zip(dcols, r)) for r in drows], dcols)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} vs {len(b)}"))
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL {name}: values differ, first diffs {diff}")
        else:
            print(f"PASS {name}: {len(a)} rows")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
