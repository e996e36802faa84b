"""$var substitution tests (SURVEY F1; reference
DataCatalogController.py:1685-1772)."""

from datacatalog_tag_engine_spark.operators.substitution import (
    combine_queries,
    parse_query_expression,
    split_resource_uri,
)

URI = "proj/datasets/ds/tables/tbl"


def test_split_resource_uri():
    assert split_resource_uri(URI) == ("proj", "ds", "tbl")
    assert split_resource_uri("proj/datasets/ds") == ("proj", "ds", None)
    assert split_resource_uri("proj") == ("proj", None, None)


def test_table_in_from_clause_fully_qualified():
    q = parse_query_expression(URI, "select count(*) from $table")
    assert q == "select count(*) from proj.ds.tbl"


def test_table_in_from_clause_backticks():
    q = parse_query_expression(URI, "select count(*) from `$table`")
    assert q == "select count(*) from `proj.ds.tbl`"


def test_from_clause_qualifies_all_occurrences():
    q = parse_query_expression(
        URI, "select '$table' from $table"
    )
    # reference replaces every $table with the qualified name when any
    # FROM-clause occurrence exists
    assert q == "select 'proj.ds.tbl' from proj.ds.tbl"


def test_table_outside_from_short_name():
    q = parse_query_expression(URI, "select 'name is $table'")
    assert q == "select 'name is tbl'"


def test_project_dataset_substitution():
    q = parse_query_expression(
        URI, "select count(*) from other where p='$project' and d='$dataset'"
    )
    assert q == "select count(*) from other where p='proj' and d='ds'"


def test_bare_expression_passthrough():
    assert parse_query_expression(URI, "select 'LOGISTICS'") == "select 'LOGISTICS'"
    assert parse_query_expression(URI, "select 180") == "select 180"


def test_column_substitution():
    q = parse_query_expression(
        URI, "select count(distinct $column) from $table", column="l_orderkey"
    )
    assert q == "select count(distinct l_orderkey) from proj.ds.tbl"


def test_custom_qualifier():
    q = parse_query_expression(
        URI, "select count(*) from $table", qualify=lambda p, d, t: t
    )
    assert q == "select count(*) from tbl"


def test_combine_queries():
    assert combine_queries(["select 1", "select 2"]) == "select (select 1), (select 2)"
