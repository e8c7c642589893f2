"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every queries() entry at the given SF and compares against
oracle_sql() via DuckDB: row count, column names, and an
order-insensitive value hash. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.17g}"  # full double precision — driver may compare exact
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entry
    from development_of_a_real_time_data_pipeline_for_user_profile_analysis_spark.session import (
        get_spark,
    )

    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(args[1:] if args and args[0].startswith("/") else args)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            if srows and drows and len(srows) == len(drows):
                o = sorted(range(len(scols)), key=lambda i: scols[i])
                ss = sorted("|".join(canon(r[i]) for i in o) for r in srows)
                od = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dd = sorted("|".join(canon(r[i]) for i in od) for r in drows)
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"  spark:  {a[:200]}\n  duckdb: {b[:200]}")
                        break
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{failures} failures / {len(only) if only else len(qs)} checked")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
