"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry in Spark and its oracle_sql() in DuckDB
at sf0.01, compare row count + sorted column names + order-insensitive
values (exact equality after canonicalization).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E
from datacatalog_tag_engine_spark.session import TESTDATA_TABLES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:200]}")
            continue

        sc, sr = normalize(scols, srows)
        oc, orr = normalize(ocols, orows)
        status = []
        if len(sr) != len(orr):
            status.append(f"rowcount {len(sr)} vs {len(orr)}")
        if sc != oc:
            status.append(f"schema {sc} vs {oc}")
        if not status and sr != orr:
            n_bad = sum(1 for a, b in zip(sr, orr) if a != b)
            status.append(f"values differ in {n_bad}/{len(sr)} rows")
            for a, b in zip(sr, orr):
                if a != b:
                    status.append(f"  spark:  {a}")
                    status.append(f"  oracle: {b}")
                    break
        if status:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(status[:1]) + f" [{time.time()-t0:.1f}s]")
            for line in status[1:]:
                print("      " + line)
        else:
            print(f"ok    {name}: {len(sr)} rows match [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
