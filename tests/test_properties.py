"""Property-based tests (hypothesis) for the subtle string algebra
SURVEY.md section 7 flags: $var substitution precedence and wildcard
matching. The oracle is a direct Python transcription of the reference
algorithm's observable behavior (DataCatalogController.py:1685-1772,
Resources.py:230-251) run against generated inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from datacatalog_tag_engine_spark.operators.substitution import parse_query_expression

ident = st.text(alphabet="abcdefgh_123", min_size=1, max_size=8)


def reference_model(uri: str, query_expression: str, column: str | None) -> str:
    """Reference behavior: FROM-clause $table -> fully-qualified for ALL
    occurrences; else $table -> short name, then $project/$dataset;
    bare expressions pass through; $column last."""
    parts = uri.split("/")
    project = parts[0]
    dataset = parts[parts.index("datasets") + 1] if "datasets" in parts else None
    table = parts[parts.index("tables") + 1] if "tables" in parts else None

    has_from = " from $table" in query_expression or " from `$table`" in query_expression
    q = None
    if has_from:
        qualified = ".".join(x for x in (project, dataset, table) if x)
        q = query_expression.replace("$table", qualified)
    else:
        if "$table" in query_expression:
            q = query_expression.replace("$table", table or "")
        if "$project" in query_expression:
            q = (q or query_expression).replace("$project", project)
        if "$dataset" in query_expression and dataset is not None:
            q = (q or query_expression).replace("$dataset", dataset)
    if q is None:
        q = query_expression
    if "$column" in q and column is not None:
        q = q.replace("$column", column)
    return q


@given(
    project=ident, dataset=ident, table=ident, column=ident,
    template=st.sampled_from(
        [
            "select count(*) from $table",
            "select count(*) from `$table`",
            "select '$table' from $table",
            "select '$table'",
            "select x from y where p = '$project' and d = '$dataset'",
            "select count(distinct $column) from $table",
            "select count(distinct $column) from $table where c = '$column'",
            "select 'constant'",
            "select $column from other where t = '$table' and p = '$project'",
        ]
    ),
)
@settings(max_examples=300, deadline=None)
def test_substitution_matches_reference_model(project, dataset, table, column, template):
    uri = f"{project}/datasets/{dataset}/tables/{table}"
    assert parse_query_expression(uri, template, column) == reference_model(uri, template, column)


def wildcard_model(pattern: str, project: str, dataset: str, table: str) -> bool:
    """Reference table-wildcard semantics (Resources.py:230-251):
    '*' matches everything; otherwise every '*'-separated substring must
    appear in the full id 'project:dataset.table'; no '*' -> exact
    table-name equality."""
    if pattern == "*":
        return True
    if "*" in pattern:
        full = f"{project}:{dataset}.{table}"
        return all(sub in full for sub in pattern.split("*") if sub)
    return table == pattern


@given(
    table=ident,
    pattern=st.one_of(
        st.just("*"),
        ident,
        st.tuples(ident, ident).map(lambda t: f"{t[0]}*{t[1]}"),
        ident.map(lambda s: s + "*"),
        ident.map(lambda s: "*" + s),
    ),
)
@settings(max_examples=60, deadline=None)
def test_wildcard_matches_reference_model(spark, table, pattern):
    from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA
    from datacatalog_tag_engine_spark.operators import uri as U

    assets = spark.createDataFrame(
        [{"asset_uri": f"p/datasets/d/tables/{table}", "asset_type": "bigquery",
          "project": "p", "dataset": "d", "table": table}],
        ASSETS_SCHEMA,
    )
    got = U.expand_uris(assets, f"bigquery/project/p/dataset/d/{pattern}").count() == 1
    assert got == wildcard_model(pattern, "p", "d", table)


@given(
    ts=st.datetimes(
        min_value=__import__("datetime").datetime(1971, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    ),
    form=st.sampled_from(["date10", "dt19", "iso"]),
)
@settings(max_examples=40, deadline=None)
def test_timestamp_matrix_matches_reference_model(spark, ts, form):
    """Length-sniffed timestamp parsing (reference
    DataCatalogController.py:1893-1936): 10-char -> midnight UTC,
    19-char -> second precision, otherwise ISO."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.model.coercion import coerce_timestamp

    if form == "date10":
        s = ts.strftime("%Y-%m-%d")
        expected = dt.datetime.combine(ts.date(), dt.time())
    elif form == "dt19":
        s = ts.strftime("%Y-%m-%d %H:%M:%S")
        expected = ts.replace(microsecond=0)
    else:
        s = ts.isoformat()
        expected = ts
    got = spark.range(1).select(coerce_timestamp(F.lit(s)).alias("v")).first()["v"]
    assert got == expected


@given(
    words=st.lists(st.sampled_from(["a", "bb", "ccc", "x", "yy"]), min_size=0, max_size=12),
    n=st.integers(min_value=2, max_value=9),
)
@settings(max_examples=40, deadline=None)
def test_word_ngrams_matches_naive_definition(spark, words, n):
    """The zip_with n-gram construction equals the naive
    slide-a-window-of-n definition for any word list."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.text import word_ngrams

    text = " ".join(words)
    got = (
        spark.range(1)
        .select(word_ngrams(F.split(F.lit(text), r"\s+"), n).alias("g"))
        .first()["g"]
    )
    toks = text.split(" ") if text else [""]
    expected = (
        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n
        else []
    )
    assert got == expected


@given(
    words=st.lists(st.sampled_from(["a", "bb", "ccc"]), min_size=1, max_size=10),
    k=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=40, deadline=None)
def test_word_shingles_matches_naive_definition(spark, words, k):
    """dedup.word_shingles: sliding window of k, whole-text fallback for
    short docs."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.dedup import word_shingles

    text = " ".join(words)
    got = spark.range(1).select(word_shingles(F.lit(text), k).alias("g")).first()["g"]
    toks = text.split(" ")
    if len(toks) >= k:
        expected = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        expected = [" ".join(toks)]
    assert got == expected


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_containment_dedup_invariants(spark, texts):
    """Random small corpora: (1) every input doc gets exactly one
    verdict; (2) keep implies exact-canonical; (3) idempotence — for
    every above-threshold pair one side is dropped, so re-running on
    the survivors keeps them all."""
    from datacatalog_tag_engine_spark.pipeline import dedup as DD

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DD.containment_dedup(df).collect()
    assert sorted(r["doc_id"] for r in out) == [i for i, _ in rows]
    kept_ids = {r["doc_id"] for r in out if r["keep"]}
    canon = {
        r["doc_id"]
        for r in DD.exact_dedup(df).collect()
        if r["is_canonical"]
    }
    assert kept_ids <= canon
    surv = df.join(
        spark.createDataFrame([(i,) for i in sorted(kept_ids)], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    again = DD.containment_dedup(surv).collect()
    assert all(r["keep"] for r in again)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True),
    clone_pairs=st.integers(min_value=0, max_value=5),
)
@settings(max_examples=15, deadline=None)
def test_holdout_split_never_leaks(spark, ids, clone_pairs):
    """Random id sets with planted cross-boundary clones: no
    fingerprint ever appears in both train and eval (clones of an
    eval doc land in eval or quarantine, never train)."""
    from datacatalog_tag_engine_spark.pipeline import sampling as SMP

    rows = [(i, f"text body {i % max(1, len(ids) // 3)}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.join(SMP.holdout_split(df), "doc_id").select("text", "split").collect()
    by_fp: dict = {}
    for r in out:
        by_fp.setdefault(r["text"], set()).add(r["split"])
    for splits in by_fp.values():
        assert not ({"train", "eval"} <= splits)
