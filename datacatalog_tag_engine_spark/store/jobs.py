"""Job ledger + rollups (SURVEY.md A10/A11; reference:
JobManager.py:84-139, :160-182; TaskManager.py:322-365).

The reference increments per-shard Firestore counters from each task
and rolls them into job totals. In Spark the per-task ledger is a
DataFrame and the rollup is one partial+final aggregation (SURVEY R4 —
exactly Spark's execution model, so the "fan-in" costs one shuffle of
counter-sized rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_tasks(tasks: DataFrame) -> DataFrame:
    """tasks: (job_uuid, config_uuid, config_type, status) with status
    in SUCCESS/ERROR/PENDING/RUNNING. Returns the job-ledger rollup:
    task_count, tasks_ran, tasks_success, tasks_failed, pct_complete
    (reference pct formula JobManager.py:219-240), job_status."""
    s = F.col("status")
    agg = tasks.groupBy("job_uuid", "config_uuid", "config_type").agg(
        F.count("*").alias("task_count"),
        F.count(F.when(s.isin("SUCCESS", "ERROR"), 1)).alias("tasks_ran"),
        F.count(F.when(s == "SUCCESS", 1)).alias("tasks_success"),
        F.count(F.when(s == "ERROR", 1)).alias("tasks_failed"),
    )
    pct = F.round(F.col("tasks_ran") * 100.0 / F.col("task_count"), 2)
    done = F.col("tasks_ran") == F.col("task_count")
    status = (
        F.when(done & (F.col("tasks_failed") > 0), "ERROR")
        .when(done, "SUCCESS")
        .otherwise("RUNNING")
    )
    return agg.withColumn("pct_complete", pct).withColumn("job_status", status)
