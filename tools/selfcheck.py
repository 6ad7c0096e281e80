"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row counts + sorted
values.  Usage: python tools/selfcheck.py [sf_dir]"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Type-strict on purpose: the driver hashes cell values, so a DuckDB
    # DECIMAL vs a Spark DOUBLE (value-identical) still hash-mismatches.
    # Tag the python type so local selfcheck catches the same class of bug.
    import decimal
    if v is None:
        return ("z",)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", float("inf"), "nan")
        return ("f", round(v, 9), "")
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, norm(x)) for k, x in v.items())))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat()[:26])
    return ("s", str(v))


def norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None

    import __spark_entry__ as entrymod
    from neo4j_spark.session import get_spark

    spark = get_spark("selfcheck", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            n_fail += 1
            continue
        sn = norm_rows([tuple(r) for r in srows], scols)
        dn = norm_rows(drows, dcols)
        if len(sn) != len(dn):
            print(f"FAIL {name}: row count {len(sn)} vs {len(dn)}")
            n_fail += 1
            continue
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sn)} rows [{dt:.1f}s]")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
