"""Dynamic tag execution (SURVEY.md sections 2.10, 3, 4-R9).

The reference evaluates one SQL statement per (asset, field) in BigQuery
(reference: apply_dynamic_table_config, DataCatalogController.py:250-330)
and only fuses per-column field queries into a single multi-subquery
statement (combine_queries, :488-495). Two executors here:

* ``run_config_per_asset`` — semantics-exact path. For each matched
  asset, ALL field expressions are fused into one single-row SELECT
  (generalizing the reference's column-path fusion to every config) and
  run as one Spark job; richtext fields run separately because they
  collect all result rows (reference run_query :1797-1806
  first-row-wins vs richtext-collect).

* ``run_config_fused`` — the scale path (SURVEY R9). When every field
  expression belongs to the profiling family the reference's own load
  tests use (examples/load/configs/dynamic_table_500.json) —
  ``select AGG from $table [where PRED]`` and the nested
  avg-of-daily-counts form — the expressions compile to aggregate
  columns with FILTER clauses over ONE union-of-scans DataFrame, and
  every asset x every field is computed in a single groupBy(asset)
  pass: one shuffle total instead of O(assets x fields) statements.
  Catalyst pushes the union's column pruning into each scan and AQE
  sizes the post-shuffle partitions.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..model import coercion
from ..session import local_df
from .substitution import combine_queries, parse_query_expression

# ---------------------------------------------------------------------------
# shared: raw (stringly) field values -> typed long tag rows

RAW_LONG_SCHEMA = T.StructType(
    [
        T.StructField("asset_uri", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("template_id", T.StringType(), False),
        T.StructField("field_id", T.StringType(), False),
        T.StructField("field_type", T.StringType(), False),
        T.StructField("raw_value", T.StringType(), True),
    ]
)


def raw_rows_to_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return local_df(spark, rows, RAW_LONG_SCHEMA)


def coerce_long_rows(df: DataFrame, bool_mode: str = "query") -> DataFrame:
    """Turn (asset_uri, column, template_id, field_id, field_type,
    raw_value STRING) into typed tags-table rows.

    bool_mode 'query' uses Python-truthiness semantics (reference
    :1872-1875); 'csv' uses the 'TRUE'-literal rule (:1510-1521).
    """
    ft = F.col("field_type")
    raw = F.col("raw_value")
    bool_coerce = (
        coercion.coerce_bool_truthy(raw) if bool_mode == "query" else coercion.coerce_bool_from_string(raw)
    )
    is_ts = ft.isin("datetime", "timestamp")
    return df.select(
        "asset_uri",
        "column",
        "template_id",
        "field_id",
        "field_type",
        F.when(ft.isin("string", "enum", "richtext"), coercion.coerce_string(raw)).alias(
            "field_value_string"
        ),
        F.when(ft == "double", coercion.coerce_double(raw)).alias("field_value_double"),
        F.when(ft == "bool", bool_coerce).alias("field_value_bool"),
        F.when(is_ts, coercion.coerce_timestamp(raw)).alias("field_value_ts"),
        F.lit(None).cast("string").alias("job_uuid"),
        F.current_timestamp().alias("updated_ts"),
    )


# ---------------------------------------------------------------------------
# per-asset executor (semantics-exact, parallel jobs)


def _stringify(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return str(v)


def run_config_per_asset(
    spark: SparkSession,
    fields: list[dict],
    asset_uris: list[str],
    template_id: str,
    qualify: Callable[[str, str, str], str],
    column: str | None = None,
    max_workers: int = 8,
    errors: list | None = None,
) -> list[dict]:
    """Evaluate config fields per asset; returns raw long rows as dicts
    (feed through ``coerce_long_rows``). Assets run as concurrent Spark
    jobs (the driver-side analogue of the reference's task fan-out,
    TaskManager.py:234-268, minus the HTTP hop).

    A failing asset does not abort the run: its error is appended to
    ``errors`` as (asset_uri, message) and the other assets proceed —
    the reference's per-task error semantics (run_query catches and
    logs, DataCatalogController.py:1813-1816; task status ERROR,
    TaskManager.py:143-155)."""

    scalar_fields = [f for f in fields if f["field_type"] != "richtext"]
    richtext_fields = [f for f in fields if f["field_type"] == "richtext"]

    def one_asset(uri: str) -> list[dict]:
        rows: list[dict] = []
        if scalar_fields:
            exprs = [
                parse_query_expression(uri, f["query_expression"], column, qualify)
                for f in scalar_fields
            ]
            combined = combine_queries(exprs)
            result = spark.sql(combined).first()
            for i, f in enumerate(scalar_fields):
                rows.append(
                    {
                        "asset_uri": uri,
                        "column": column,
                        "template_id": template_id,
                        "field_id": f["field_id"],
                        "field_type": f["field_type"],
                        "raw_value": _stringify(result[i]),
                    }
                )
        for f in richtext_fields:
            q = parse_query_expression(uri, f["query_expression"], column, qualify)
            values = [r[0] for r in spark.sql(q).collect()]
            rows.append(
                {
                    "asset_uri": uri,
                    "column": column,
                    "template_id": template_id,
                    "field_id": f["field_id"],
                    "field_type": f["field_type"],
                    "raw_value": "<br>".join(str(v) for v in values) if values else None,
                }
            )
        return rows

    def guarded(uri: str) -> list[dict]:
        try:
            return one_asset(uri)
        except Exception as ex:
            if errors is None:
                raise
            errors.append((uri, f"{type(ex).__name__}: {ex}"))
            return []

    out: list[dict] = []
    if len(asset_uris) == 1:
        out.extend(guarded(asset_uris[0]))
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for rows in pool.map(guarded, asset_uris):
                out.extend(rows)
    return out


# ---------------------------------------------------------------------------
# fused executor (R9)

_SIMPLE_RE = re.compile(
    r"^\s*select\s+(?P<agg>.+?)\s+from\s+\$table\s*(?:where\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# avg-of-daily-counts nested form (reference load config dynamic_table_500)
_DAILY_RE = re.compile(
    r"^\s*select\s+(?P<outer>.+?)\s+from\s+\(\s*select\s+(?P<day>.+?)\s+(?:as\s+)?(?P<dayalias>\w+)\s*,\s*count\(\*\)\s+(?:as\s+)?(?P<cntalias>\w+)\s+from\s+\$table\s*(?:where\s+(?P<pred>.+?))?\s+group\s+by\s+(?P<grp>\w+)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def classify_expression(query_expression: str) -> tuple[str, dict]:
    """Classify one field expression into a fusable family:
    'constant' (no $table), 'simple' (agg [+ filter]), 'daily'
    (avg-of-daily-counts), or 'opaque' (fall back to per-asset)."""
    if "$table" not in query_expression:
        return "constant", {"sql": query_expression}
    m = _DAILY_RE.match(query_expression)
    if m:
        return "daily", {
            "outer": m.group("outer"),
            "day": m.group("day"),
            "dayalias": m.group("dayalias"),
            "cntalias": m.group("cntalias"),
            "pred": m.group("pred"),
        }
    m = _SIMPLE_RE.match(query_expression)
    if m and " from " not in m.group("agg").lower():
        return "simple", {"agg": m.group("agg"), "pred": m.group("pred")}
    return "opaque", {}


def fusable(fields: list[dict]) -> bool:
    return all(
        classify_expression(f["query_expression"])[0] != "opaque"
        and f["field_type"] != "richtext"
        for f in fields
    )


def run_config_fused_wide(
    spark: SparkSession,
    fields: list[dict],
    assets: list[tuple[str, DataFrame]] | DataFrame,
) -> DataFrame:
    """The R9 plan, wide shape: one groupBy(asset) pass, one
    naturally-typed column per field.

    ``assets`` — the scale form is ONE DataFrame carrying an
    ``asset_uri`` column (a single scan of a partitioned inventory:
    e.g. ``spark.read.parquet(*paths)`` with a path-derived uri, or a
    table partitioned by asset). The plan then has exactly one leaf no
    matter how many assets the inventory holds — this is what survives
    the reference's 500k/1M-asset load ladder
    (examples/load/configs/dynamic_table_500k.json), where a
    union-of-N-scans logical plan dies in driver analysis long before
    execution.

    The list form [(asset_uri, scan DataFrame)] remains as a small-N
    convenience (per-asset temp views / heterogeneous sources) and
    builds the union internally; scans must be union-compatible on the
    referenced columns. Simple aggregates compile to FILTER-clause
    aggregate columns; nested avg-of-daily forms run as a two-level
    groupBy joined back on the asset key; constants evaluate once and
    broadcast as literals.
    """
    classified = [(f, *classify_expression(f["query_expression"])) for f in fields]

    if isinstance(assets, DataFrame):
        union = assets.withColumnRenamed("asset_uri", "_asset_uri")
        if "_asset_uri" not in union.columns:
            raise ValueError("inventory DataFrame needs an asset_uri column")
    else:
        union = None
        for uri, df in assets:
            tagged = df.withColumn("_asset_uri", F.lit(uri))
            union = tagged if union is None else union.unionByName(tagged)

    simple_aggs = []
    for f, kind, info in classified:
        if kind == "simple":
            agg_sql = info["agg"]
            if info["pred"]:
                agg_sql = f"{agg_sql} FILTER (WHERE {info['pred']})"
            simple_aggs.append(F.expr(agg_sql).alias(f["field_id"]))

    parts: list[DataFrame] = []
    if simple_aggs:
        parts.append(union.groupBy("_asset_uri").agg(*simple_aggs))

    # daily (avg-of-daily-counts) fields FUSE per day expression: one
    # two-level aggregation computes every field sharing a day key, with
    # per-field FILTER counts. A predicated field's original inner query
    # only emits days having >= 1 matching row, so the fused count wraps
    # in nullif(cnt, 0) — the outer avg then skips no-match days exactly
    # like the standalone form. This turns N daily fields into
    # ceil(distinct day exprs) scans of the inventory instead of N.
    daily_groups: dict[str, list[tuple[dict, dict]]] = {}
    for f, kind, info in classified:
        if kind == "daily":
            daily_groups.setdefault(info["day"], []).append((f, info))

    for day_expr, members in daily_groups.items():
        cnt_aggs = []
        outer_aggs = []
        for i, (f, info) in enumerate(members):
            cnt = f"_cnt_{i}"
            if info["pred"]:
                cnt_aggs.append(
                    F.expr(f"count(*) FILTER (WHERE {info['pred']})").alias(cnt)
                )
            else:
                cnt_aggs.append(F.count("*").alias(cnt))
            outer_sql = re.sub(
                rf"\b{re.escape(info['cntalias'])}\b", f"nullif({cnt}, 0)", info["outer"]
            )
            outer_aggs.append(F.expr(outer_sql).alias(f["field_id"]))
        daily = union.groupBy("_asset_uri", F.expr(day_expr).alias("_day")).agg(*cnt_aggs)
        # re-expose the day under each member's alias in case the outer
        # expression references it (distinct aliases only)
        for alias in {info["dayalias"] for _, info in members} - {"_day"}:
            daily = daily.withColumn(alias, F.col("_day"))
        parts.append(daily.groupBy("_asset_uri").agg(*outer_aggs))

    constants = [(f, info) for f, kind, info in classified if kind == "constant"]
    if not parts and constants:
        # constants-only config still needs the asset list — one pruned scan
        parts.append(union.select("_asset_uri").distinct())

    result = parts[0]
    for p in parts[1:]:
        result = result.join(p, "_asset_uri", "full_outer")
    # constants evaluate once on the driver and attach as literals —
    # never worth a scan of the inventory
    for f, info in constants:
        result = result.withColumn(f["field_id"], F.lit(spark.sql(info["sql"]).first()[0]))
    return result


def run_column_config_fused(
    spark: SparkSession,
    fields: list[dict],
    asset_uri: str,
    scan: DataFrame,
    columns: list[str],
    template_id: str,
) -> DataFrame:
    """R9 applied to the COLUMN path: every (column, field) cell of a
    dynamic-column config computed in ONE aggregation pass over the
    asset scan.

    The reference fuses one statement per column (combine_queries,
    DataCatalogController.py:488-495) — still O(columns) statements per
    asset. Here each field expression is classified like the table path
    and its ``$column`` placeholder is expanded per column into parallel
    aggregate expressions: a 100-column profile is one job, one scan,
    one shuffle of partial aggregates. Falls back (ValueError) on
    opaque expressions — callers use the per-asset path then.

    Returns raw long rows (asset_uri, column, template_id, field_id,
    field_type, raw_value).
    """
    aggs = []
    cells = []  # (column, field_id) in agg order
    for f in fields:
        kind, info = classify_expression(f["query_expression"].replace("$column", "__COL__"))
        if kind not in ("simple", "constant"):
            raise ValueError(f"not column-fusable: {f['query_expression']!r}")
        for col in columns:
            if kind == "constant":
                # classification is case-insensitive, so the SELECT strip
                # must be too ("SELECT 'X'" would otherwise reach F.expr
                # with the keyword attached and fail to parse)
                expr_sql = re.sub(
                    r"(?is)^\s*select\s+", "", info["sql"], count=1
                ).replace("__COL__", f"`{col}`")
            else:
                expr_sql = info["agg"].replace("__COL__", f"`{col}`")
                if info.get("pred"):
                    pred = info["pred"].replace("__COL__", f"`{col}`")
                    expr_sql = f"{expr_sql} FILTER (WHERE {pred})"
            aggs.append(F.expr(expr_sql).cast("string").alias(f"_c{len(aggs)}"))
            cells.append((col, f["field_id"]))

    row = scan.agg(*aggs)
    stack_cols = []
    for i, (col, fid) in enumerate(cells):
        stack_cols.extend([F.lit(col), F.lit(fid), F.col(f"_c{i}")])
    long_df = row.select(
        F.stack(F.lit(len(cells)), *stack_cols).alias("column", "field_id", "raw_value")
    )
    type_map = F.create_map(
        *[F.lit(x) for f in fields for x in (f["field_id"], f["field_type"])]
    )
    return long_df.select(
        F.lit(asset_uri).alias("asset_uri"),
        "column",
        F.lit(template_id).alias("template_id"),
        "field_id",
        type_map[F.col("field_id")].alias("field_type"),
        "raw_value",
    )


def run_config_fused(
    spark: SparkSession,
    fields: list[dict],
    assets: list[tuple[str, DataFrame]] | DataFrame,
    template_id: str,
) -> DataFrame:
    """R9 plan, long shape: the wide result stacked into raw long rows
    (asset_uri, column, template_id, field_id, field_type, raw_value)
    for the coercion/MERGE path. ``assets`` as in
    ``run_config_fused_wide`` (single inventory DataFrame = the scale
    form)."""
    result = run_config_fused_wide(spark, fields, assets)

    field_meta = {f["field_id"]: f["field_type"] for f in fields}
    stack_cols = []
    for fid in field_meta:
        stack_cols.append(F.lit(fid))
        stack_cols.append(F.col(fid).cast("string"))
    long_df = result.select(
        F.col("_asset_uri").alias("asset_uri"),
        F.stack(F.lit(len(field_meta)), *stack_cols).alias("field_id", "raw_value"),
    )
    type_map = F.create_map(*[F.lit(x) for kv in field_meta.items() for x in kv])
    return long_df.select(
        "asset_uri",
        F.lit(None).cast("string").alias("column"),
        F.lit(template_id).alias("template_id"),
        "field_id",
        type_map[F.col("field_id")].alias("field_type"),
        "raw_value",
    )


# ---------------------------------------------------------------------------
# column discovery (DYNAMIC_TAG_COLUMN configs)

# "select column_name from <...>information_schema.columns [where ...]"
# — the BigQuery idiom the reference's dynamic-column configs run per
# asset (examples/configs/dynamic_column/*.json; evaluation loop
# DataCatalogController.py:374-384)
_INFOSCHEMA_COLUMNS_RE = re.compile(
    r"^\s*select\s+(?:distinct\s+)?column_name\s+"
    r"from\s+[`\"]?\S*information_schema\.columns[`\"]?\s*"
    r"(?:where\s+(?P<pred>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SUBST_VAR_RE = re.compile(r"\$(table|project|dataset|column)\b")

# the scoping conjunct that makes per-asset schema evaluation valid:
# without ``table_name = '$table'`` the reference's per-asset query
# ranges over EVERY table in the dataset's INFORMATION_SCHEMA, which
# the asset's own schema column cannot answer
_TABLE_SCOPE_RE = re.compile(r"table_name\s*=\s*'\$table'", re.IGNORECASE)

# INFORMATION_SCHEMA.COLUMNS columns the schema regime can answer
# (projected in discover_columns_schema), plus the SQL tokens a simple
# predicate may use. Anything outside this closed set — unknown
# identifiers, double-quoted strings, OR (which would unscope the
# table_name conjunct), leftover $vars — routes to the opaque per-asset
# fallback instead of silently mis-answering.
_SCHEMA_PRED_COLUMNS = frozenset(
    {"table_name", "table_schema", "table_catalog", "column_name",
     "data_type", "mode", "is_nullable", "ordinal_position"}
)
# NOTE: no "not" and no "or" — either can invert/escape the
# table_name='$table' scoping conjunct (e.g. ``not (table_name =
# '$table' and ...)`` ranges over OTHER tables), and without a real
# parser we cannot tell a scope-preserving negation from a
# scope-escaping one, so any negation routes to the opaque fallback
_SCHEMA_PRED_KEYWORDS = frozenset(
    {"and", "in", "like", "rlike", "is", "null", "between",
     "true", "false", "lower", "upper", "trim", "substr", "substring",
     "concat", "length", "starts_with", "endswith"}
)
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.$]*")


def _schema_predicate_safe(pred: str) -> bool:
    """True iff a WHERE predicate is provably answerable row-wise
    against one asset's own schema: scoped to ``table_name = '$table'``,
    no OR (which would escape that scope), no double-quoted strings
    (ambiguous literal/identifier), and every identifier drawn from the
    projected INFORMATION_SCHEMA.COLUMNS column set or a small SQL
    keyword allowlist."""
    if not _TABLE_SCOPE_RE.search(pred):
        return False
    if '"' in pred:
        return False
    # only the three EXACT quoted forms ('$table'/'$dataset'/'$project')
    # rewrite to inventory columns in discover_columns_schema — a $var
    # embedded in any OTHER literal (e.g. like '$table%') would survive
    # unsubstituted and silently match nothing, so those predicates must
    # route to the opaque per-asset path (which substitutes everywhere,
    # like the reference's parse_query_expression)
    # literal tokenizer honors SQL quote-escaping ('' inside a literal):
    # tokenize FIRST, then allow $ only in the three exact forms — a
    # naive substring removal of '$table' from the escaped literal
    # '$table''s' (ONE literal whose value is $table's) would leave the
    # fragment 's' and pass the check on exactly the class it guards
    literal_re = r"'(?:[^']|'')*'"
    exact_forms = {"'$table'", "'$dataset'", "'$project'"}
    for lit in re.findall(literal_re, pred):
        if "$" in lit and lit not in exact_forms:
            return False
    stripped = re.sub(literal_re, "", pred)  # drop string literals
    if "$" in stripped:
        return False
    # postfix negations are AND-conjunct-local (they negate one operand,
    # never the scoping conjunct) — normalize them away so the token
    # scan only sees the dangerous PREFIX ``not``
    stripped = re.sub(r"(?i)\bis\s+not\s+null\b", " is null ", stripped)
    stripped = re.sub(r"(?i)\bnot\s+(in|like|rlike|between)\b", r" \1 ", stripped)
    for tok in _IDENT_RE.findall(stripped):
        t = tok.lower()
        if t in ("or", "not"):
            return False
        if t not in _SCHEMA_PRED_COLUMNS and t not in _SCHEMA_PRED_KEYWORDS:
            return False
    return True


def classify_columns_query(query: str) -> str:
    """Shape of an ``included_columns_query``:

    - ``schema``: a SELECT column_name over INFORMATION_SCHEMA.COLUMNS,
      scoped to the asset's own table with a predicate the schema
      regime provably answers (_schema_predicate_safe) — answerable
      from the assets inventory's ``schema`` column as ONE distributed
      plan for every matched asset (zero per-asset jobs).
    - ``constant``: no substitution variables — asset-independent, so
      one evaluation serves every asset.
    - ``opaque``: arbitrary per-asset user SQL (the fallback; evaluated
      per asset exactly like the reference — including
      INFORMATION_SCHEMA queries whose predicate falls outside the
      provable idiom, e.g. unscoped/OR'd/unknown-column predicates).
    """
    m = _INFOSCHEMA_COLUMNS_RE.match(query)
    if m is not None:
        pred = m.group("pred")
        if pred and _schema_predicate_safe(pred):
            return "schema"
        return "opaque" if _SUBST_VAR_RE.search(query) else "constant"
    if not _SUBST_VAR_RE.search(query):
        return "constant"
    return "opaque"


def discover_columns_schema(matched_assets: DataFrame, query: str) -> DataFrame:
    """Single-pass column discovery for a schema-shaped query: evaluate
    the user's INFORMATION_SCHEMA.COLUMNS predicate against the assets
    inventory's ``schema`` column for ALL matched assets at once.

    The per-asset substitution variables rewrite to the inventory's own
    columns ($table -> table_name, $dataset -> table_schema, $project ->
    table_catalog), so a predicate like ``table_name = '$table'``
    becomes row-wise true exactly for the asset that owns the row —
    identical semantics to the reference's N per-asset query jobs
    (DataCatalogController.py:374-384), as one job. Returns
    (asset_uri, pos, column) with ``pos`` the schema position, so
    callers can preserve the reference's column order.

    100 TB shape: a projection + explode + filter over the inventory —
    no shuffle, no per-asset scheduling; scales to the reference's
    1M-asset ladder as a fraction of one scan."""
    m = _INFOSCHEMA_COLUMNS_RE.match(query)
    if m is None:
        raise ValueError(f"not a schema-shaped columns query: {query!r}")
    pred = m.group("pred")
    if not pred or not _schema_predicate_safe(pred):
        # classify_columns_query routes these to the opaque per-asset
        # path; reaching here means a caller skipped classification
        raise ValueError(
            f"predicate not provably schema-answerable (unscoped, OR'd, "
            f"or non-INFORMATION_SCHEMA identifiers): {query!r}"
        )
    cols = matched_assets.select(
        "asset_uri",
        F.col("project").alias("table_catalog"),
        F.col("dataset").alias("table_schema"),
        F.col("table").alias("table_name"),
        F.posexplode("schema").alias("pos", "_c"),
    ).select(
        "asset_uri",
        "table_catalog",
        "table_schema",
        "table_name",
        "pos",
        F.col("_c.name").alias("column_name"),
        F.col("_c.type").alias("data_type"),
        F.col("_c.mode").alias("mode"),
        # the remaining INFORMATION_SCHEMA.COLUMNS columns the predicate
        # allowlist admits, derived from the inventory schema struct
        F.when(F.col("_c.mode") == "REQUIRED", F.lit("NO"))
        .otherwise(F.lit("YES"))
        .alias("is_nullable"),
        (F.col("pos") + 1).alias("ordinal_position"),
    )
    # only quoted substitution forms can appear ( _schema_predicate_safe
    # rejects bare $vars outside string literals )
    for var, col in (
        ("$table", "table_name"),
        ("$dataset", "table_schema"),
        ("$project", "table_catalog"),
    ):
        pred = pred.replace(f"'{var}'", col)
    cols = cols.filter(F.expr(pred))
    return cols.select("asset_uri", "pos", F.col("column_name").alias("column"))
