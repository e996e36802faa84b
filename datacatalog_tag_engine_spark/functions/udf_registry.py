"""UDF surface (SURVEY.md X1-X3; reference:
extensions/query_cookbook/query_cookbook_config.json:6-30 and
summarize_users/main.py:21-92).

The reference exposes BigQuery *remote functions* backed by Cloud
Functions — ``summarize_users(project, region, dataset, table, k,
excluded)`` and an LLM-backed ``summarize_sql`` — callable inside tag
query expressions. Here the same surface is:

* ``register_batch_udf`` — wrap any batch callable (HTTP client, LLM
  client) as an Arrow-batched pandas_udf registered for use in SQL
  expressions. Batching is the whole point: one remote call per Arrow
  batch, not per row.
* ``summarize_users`` — the cookbook's top-k-users-by-activity as a
  plain DataFrame function (A8 + excluded-principals filter).
* ``llm_summarize_udf`` — the text-summarization UDF with the model
  call stubbed: ``fake=True`` produces a deterministic extractive
  "summary" (first N words), ``fake=False`` raises — no LLM client in
  this container. The Spark-side plumbing (registration, batching,
  prompt assembly) is real.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def register_batch_udf(
    spark: SparkSession,
    name: str,
    batch_fn: Callable[[pd.Series], pd.Series],
    return_type: str = "string",
):
    """Register ``batch_fn`` (pd.Series -> pd.Series) as an Arrow-batched
    SQL function ``name`` — the engine-side shape of a remote function."""
    udf = pandas_udf(batch_fn, returnType=return_type)
    spark.udf.register(name, udf)
    return udf


def summarize_users(
    events: DataFrame,
    k: int = 3,
    excluded: list[str] | None = None,
    user_col: str = "user_id",
) -> DataFrame:
    """Top-k most active principals, minus excluded service accounts
    (reference summarize_users/main.py:46-75). Deterministic tie-break
    on the user id."""
    src = events
    if excluded:
        src = src.filter(~F.col(user_col).isin(excluded))
    return (
        src.groupBy(user_col)
        .agg(F.count("*").alias("event_count"))
        .orderBy(F.desc("event_count"), F.asc(user_col))
        .limit(k)
    )


def llm_summarize_udf(spark: SparkSession, fake: bool = True, max_words: int = 8):
    """X2: text summarization UDF. fake=True -> deterministic extractive
    stub; fake=False is where an LLM client would batch the prompts."""

    def batch(texts: pd.Series) -> pd.Series:
        if not fake:
            raise NotImplementedError("LLM client not available in this container")
        return texts.fillna("").map(lambda t: " ".join(t.split()[:max_words]))

    return register_batch_udf(spark, "llm_summarize", batch, "string")
