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


def canon_strict(v):
    """Dtype-sensitive canonicalization over the pandas conversion path
    (sdf.toPandas() / duckdb .df()) — the shape the driver most likely
    hashes. Ints and floats do NOT unify: a DuckDB HUGEINT (-> float64
    in pandas) vs a Spark bigint (-> int64) is a visible mismatch here,
    as is a decimal column converting to Decimal objects in one engine
    and float64 in the other."""
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, (np.floating, float)):
        return ("f", repr(float(v)))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    # date and midnight-datetime unify: DuckDB .df() widens DATE to
    # datetime64, Spark keeps date objects — driver-green queries (q22)
    # prove its hasher tolerates this, so strict mode must too.
    if isinstance(v, pd.Timestamp):
        return ("ts", (v.tz_localize(None) if v.tzinfo else v).isoformat(timespec="seconds"))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="seconds"))
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat(timespec="seconds"))
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_strict(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v).hex())
    return ("s", str(v))


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


def normalize(cols, rows, strict=False):
    c = canon_strict if strict else canon
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(c(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    only = set(argv)
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
            if strict:
                pdf = sdf.toPandas()
                srows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
            else:
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
            if strict:
                odf = res.df()
                orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
            else:
                orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {str(ex)[:200]}")
            continue

        sc, sr = normalize(scols, srows, strict)
        oc, orr = normalize(ocols, orows, strict)
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
