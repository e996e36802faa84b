"""Timestamp-flavor-tolerant epoch helpers.

The driver's parquet has shipped ``ts`` as TIMESTAMP(NANOS) (read as
raw longs via the legacy conf and truncated to micros by
``session.load_parquet``) and as TIMESTAMP(MICROS) without timezone
(read natively as TIMESTAMP_NTZ). Spark forbids a direct
``CAST(TIMESTAMP_NTZ AS DOUBLE/BIGINT)``, so any operator that wants
seconds-since-epoch must go through TIMESTAMP first. These helpers are
the single place that knows that; every temporal operator
(as-of/range join, sessionization, usage streams) routes through them.

This mirrors the reference engine's own tolerance for timestamp-shape
drift (DataCatalogController.py:1893-1936 sniffs string lengths for the
same reason): input timestamp precision is an environmental detail, not
part of operator semantics.

Both expressions stay inside whole-stage codegen (plain casts — no UDF),
so at 100 TB they cost nothing over the raw column scan. The session
timezone is pinned to UTC by ``session.register_testdata``, so the
NTZ -> LTZ reinterpretation is identity and matches DuckDB's epoch().
"""

from __future__ import annotations

from pyspark.sql import Column


def ts_seconds(col: Column) -> Column:
    """Fractional seconds since epoch for any timestamp flavor
    (TIMESTAMP, TIMESTAMP_NTZ, date, or parseable string)."""
    return col.cast("timestamp").cast("double")


def ts_epoch_long(col: Column) -> Column:
    """Whole seconds since epoch (floor) for any timestamp flavor."""
    return col.cast("timestamp").cast("long")
