"""Template-variable substitution for query expressions (SURVEY.md F1;
reference: DataCatalogController.py:1685-1772 / parse_query_expression).

Reference semantics, reproduced exactly:

* ``$table`` appearing in a FROM clause (`` from $table`` or
  `` from `$table` ``) -> ALL occurrences of ``$table`` replaced with the
  fully-qualified ``project.dataset.table``;
* ``$table`` appearing elsewhere only -> replaced with the short table
  name;
* ``$project`` / ``$dataset`` -> parsed out of the asset uri;
* ``$column`` -> the supplied column (dynamic-column configs);
* expression with no ``$table`` passes through untouched (constant
  expressions like ``select 'LOGISTICS'``).

The uri format is the reference's Data Catalog resource form
``project/datasets/ds/tables/t``.

Spark twist: the fully-qualified spark name for our test views is just
the view name, so callers pass a ``qualify`` function mapping
(project, dataset, table) -> the FROM-clause-safe relation name. The
default joins with '.' like BigQuery.
"""

from __future__ import annotations

from collections.abc import Callable

Qualifier = Callable[[str, str, str], str]


def _default_qualify(project: str, dataset: str, table: str) -> str:
    return ".".join(p for p in (project, dataset, table) if p)


def split_resource_uri(uri: str) -> tuple[str, str | None, str | None]:
    """Split 'project/datasets/ds/tables/t' (reference uri form,
    Resources.py:131-147) into (project, dataset, table)."""
    parts = uri.split("/")
    project = parts[0]
    dataset = table = None
    if "/datasets/" in uri:
        dataset = parts[parts.index("datasets") + 1]
    if "/tables/" in uri:
        table = parts[parts.index("tables") + 1]
    return project, dataset, table


def parse_query_expression(
    uri: str,
    query_expression: str,
    column: str | None = None,
    qualify: Qualifier = _default_qualify,
) -> str:
    """Rewrite a user query expression for one asset.

    Mirrors the reference's precedence: the FROM-clause check uses the
    *last* occurrence (rfind) of '' from $table'' — if present anywhere,
    qualified replacement wins for all occurrences.
    """
    project, dataset, table = split_resource_uri(uri)

    has_from_table = (" from $table" in query_expression) or (" from `$table`" in query_expression)
    has_table = "$table" in query_expression

    query_str: str | None = None
    if has_from_table:
        qualified = qualify(project, dataset or "", table or "")
        query_str = query_expression.replace("$table", qualified)
    else:
        if has_table:
            query_str = query_expression.replace("$table", table or "")
        if "$project" in query_expression:
            query_str = (query_str or query_expression).replace("$project", project)
        if "$dataset" in query_expression and dataset is not None:
            query_str = (query_str or query_expression).replace("$dataset", dataset)

    if query_str is None:
        query_str = query_expression

    if "$column" in query_str and column is not None:
        query_str = query_str.replace("$column", column)

    return query_str


def combine_queries(field_exprs: list[str]) -> str:
    """Fuse N scalar subqueries into one single-row SELECT (SURVEY R1;
    reference: DataCatalogController.py:488-495 / combine_queries).

    ``select (q1), (q2), ...`` — Catalyst plans each parenthesized
    subquery as a ScalarSubquery and evaluates them in one job.
    """
    return "select " + ", ".join(f"({q})" for q in field_exprs)
