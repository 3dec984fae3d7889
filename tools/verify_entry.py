"""Driver-mimic: run every __spark_entry__ query at a given SF and compare
against its DuckDB oracle (row count + sorted-column schema + order-
insensitive value multiset). Usage:

    python tools/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "∅"
        return repr(round(float(v), 9))
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from crawl4ai_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="verify_entry", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = [c.lower() for c in df.columns]
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(srows)} rows ({t_spark:.1f}s)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        t_oracle = time.time() - t1
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failures.append(name)
            continue
        cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
        if cs != co:
            ndiff = sum(1 for a, b in zip(cs, co) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(cs)} rows differ")
            for a, b in list(zip(cs, co))[:200]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(srows)} rows (spark {t_spark:.1f}s, duck {t_oracle:.1f}s)")
        if len(srows) == 0:
            print(f"WARN  {name}: zero rows")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
