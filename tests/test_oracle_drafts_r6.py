"""Round-6 rotation prep: DuckDB oracle drafts for the operators added
after the round-5 window freeze, each proven value-equal to its Spark
operator on the smoke corpus HERE so next round's queries()/oracle_sql()
wiring is mechanical. These run duckdb directly (no driver involvement;
the frozen inventory is untouched)."""

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _sql_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in cur.fetchall():
        out.append(
            tuple(
                round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
            )
        )
    return sorted(out)


def test_oracle_draft_shard_assignments(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.export import shard_assignments

    got = _rows(
        shard_assignments(spark.table("documents").select("doc_id"), 4).select(
            "doc_id", F.col("shard").cast("long")
        )
    )
    want = _sql_rows(
        ddb,
        "SELECT doc_id, ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 4 AS shard"
        " FROM documents",
    )
    assert got == want


PARA_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\n\s*\n'),
                     s -> length(trim(s)) > 0) AS arr
  FROM documents),
p AS (
  SELECT doc_id,
         unnest(list_transform(range(len(arr)),
                               i -> {'pos': i, 'para': arr[i+1]}),
                recursive := true)
  FROM d),
n AS (
  SELECT doc_id, pos, para,
         lower(regexp_replace(trim(para), '\s+', ' ', 'g')) AS norm
  FROM p),
k AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
  FROM n),
r AS (
  SELECT doc_id,
         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text,
         count(*) AS kept
  FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(r.text, '') AS text,
       len(d.arr)::INT AS n_paragraphs,
       (len(d.arr) - coalesce(r.kept, 0))::INT AS n_removed
FROM d LEFT JOIN r USING (doc_id)
"""


def test_oracle_draft_paragraph_dedup(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.dedup import paragraph_dedup

    got = _rows(paragraph_dedup(spark.table("documents")))
    assert got == _sql_rows(ddb, PARA_SQL)


BIGRAM_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> length(x) > 0) AS ws
  FROM documents),
u AS (
  SELECT word, count(*) AS c1
  FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word),
tot AS (SELECT sum(c1) AS total, count(*) AS vsize FROM u),
pr AS (
  SELECT doc_id,
         unnest(list_transform(range(len(ws) - 1),
                               i -> {'w1': ws[i+1], 'w2': ws[i+2]}),
                recursive := true)
  FROM w WHERE len(ws) >= 2),
bi AS (SELECT w1, w2, count(*) AS c2 FROM pr GROUP BY w1, w2),
sc AS (
  SELECT pr.doc_id,
         round(ln(0.7 * (bi.c2 / u1.c1)
                  + (1.0 - 0.7) * ((u2.c1 + 1) / (tot.total + tot.vsize)::DOUBLE))
               * 1000000)::BIGINT AS lp6
  FROM pr
  JOIN bi USING (w1, w2)
  JOIN u u1 ON pr.w1 = u1.word
  JOIN u u2 ON pr.w2 = u2.word, tot),
agg AS (SELECT doc_id, count(*) AS n_transitions, sum(lp6) AS s
        FROM sc GROUP BY doc_id)
SELECT doc_id, n_transitions, round(s / n_transitions / 1e6, 4) AS avg_logprob
FROM agg
UNION ALL
SELECT doc_id, 0, 0.0 FROM w WHERE len(ws) < 2
"""


def test_oracle_draft_bigram_logprob(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import bigram_logprob

    got = _rows(
        bigram_logprob(spark.table("documents")).select(
            "doc_id", F.col("n_transitions").cast("long"), "avg_logprob"
        )
    )
    assert got == _sql_rows(ddb, BIGRAM_SQL)


HARDNEG_SQL = r"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e ORDER BY vec_id LIMIT 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, e.v), 4) AS cosine
  FROM q JOIN e ON q.vec_id != e.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored),
cand AS (SELECT * FROM ranked WHERE rank <= 15),
pos AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 1),
neg AS (
  SELECT c.query_id, c.neighbor_id, c.cosine
  FROM cand c ANTI JOIN pos p
    ON c.query_id = p.query_id AND c.neighbor_id = p.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM neg QUALIFY rank <= 5
"""


def test_oracle_draft_hard_negatives(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.similarity import (
        brute_force_topk,
        mine_hard_negatives,
    )

    emb = spark.table("embeddings")
    queries = emb.orderBy("vec_id").limit(10)
    positives = brute_force_topk(emb, queries, k=1).select(
        "query_id", F.col("neighbor_id").alias("positive_id")
    )
    got = _rows(
        mine_hard_negatives(emb, queries, positives, k=5, search_k=15).select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("long")
        )
    )
    assert got == _sql_rows(ddb, HARDNEG_SQL)


SPAN_SQL = r"""
WITH d AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(text), '\s+') AS wl,
         regexp_split_to_array(text, '\s+') AS wo
  FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0
              THEN []::STRUCT("start" BIGINT, gram VARCHAR)[]
              WHEN len(wl) >= 8
              THEN list_transform(range(len(wl) - 7),
                                  i -> {'start': i,
                                        'gram': array_to_string(wl[i+1:i+8], ' ')})
              ELSE [{'start': 0, 'gram': array_to_string(wl, ' ')}]
         END AS grams
  FROM d),
pg AS (SELECT doc_id, unnest(grams, recursive := true) FROM g),
rep AS (SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
st AS (SELECT pg.doc_id, pg.start FROM pg JOIN rep USING (gram)),
cov AS (
  SELECT DISTINCT st.doc_id,
         unnest(range(st.start, least(st.start + 8, len(d.wl))))::INT AS j
  FROM st JOIN d USING (doc_id)),
words AS (
  SELECT doc_id,
         unnest(list_transform(range(len(wo)),
                               j -> {'j': j, 'word': wo[j+1]}),
                recursive := true)
  FROM d),
kept AS (
  SELECT w.doc_id, w.j, w.word
  FROM words w ANTI JOIN cov c ON w.doc_id = c.doc_id AND w.j = c.j),
r AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY j) AS text
  FROM kept GROUP BY doc_id),
nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(r.text, '') AS text,
       len(d.wo)::INT AS n_words,
       coalesce(nrem.n_removed, 0)::INT AS n_removed
FROM d LEFT JOIN r USING (doc_id) LEFT JOIN nrem USING (doc_id)
"""


def test_oracle_draft_remove_repeated_spans(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.dedup import remove_repeated_spans

    got = _rows(remove_repeated_spans(spark.table("documents"), n=8, min_docs=2))
    assert got == _sql_rows(ddb, SPAN_SQL)


GOPHER_SQL = r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> length(x) > 0) AS w,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> length(x) > 0) AS wl,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents),
bg AS (   -- modal bigram count per doc (docs with >= 2 words)
  SELECT doc_id, max(c) AS top_bg
  FROM (
    SELECT doc_id, bigram, count(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(len(wl) - 1),
                                   i -> wl[i+1] || ' ' || wl[i+2])) AS bigram
      FROM base WHERE len(wl) >= 2)
    GROUP BY doc_id, bigram)
  GROUP BY doc_id),
f AS (
  -- zero-word / zero-line docs: every fraction guards its denominator
  -- (NULL = not measurable, fails no rule; word_count rejects the doc)
  SELECT b.doc_id,
         len(b.w) AS n_words,
         CASE WHEN len(b.w) > 0
              THEN list_sum(list_transform(b.w, x -> length(x))) / len(b.w)
         END AS mean_word_len,
         CASE WHEN len(b.w) > 0
              THEN len(regexp_extract_all(b.text, '#|\.\.\.|…')) / len(b.w)
         END AS symbol_word_ratio,
         CASE WHEN len(b.lines) > 0
              THEN len(list_filter(b.lines, l -> regexp_matches(l, '^\s*(\*|-|•)\s')))
                   / len(b.lines)
         END AS bullet_line_frac,
         CASE WHEN len(b.lines) > 0
              THEN len(list_filter(b.lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                   / len(b.lines)
         END AS ellipsis_line_frac,
         CASE WHEN len(b.w) > 0
              THEN len(list_filter(b.w, x -> regexp_matches(x, '[A-Za-z]')))
                   / len(b.w)
         END AS alpha_word_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(b.wl, s))) AS stopword_hits,
         CASE WHEN len(b.wl) > 0
              THEN 1.0 - len(list_distinct(b.wl)) / len(b.wl)
         END AS dup_word_frac,
         CASE WHEN len(b.wl) >= 2
              THEN bg.top_bg / (len(b.wl) - 1) END AS top_bigram_frac
  FROM base b LEFT JOIN bg USING (doc_id)),
r AS (
  SELECT *,
         list_sort(list_filter([
           CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count' END,
           CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'mean_word_len' END,
           CASE WHEN symbol_word_ratio > 0.1 THEN 'symbol_ratio' END,
           CASE WHEN bullet_line_frac > 0.9 THEN 'bullet_lines' END,
           CASE WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines' END,
           CASE WHEN alpha_word_frac < 0.8 THEN 'alpha_words' END,
           CASE WHEN stopword_hits < 2 THEN 'stopword_hits' END,
           CASE WHEN n_words >= 2 AND dup_word_frac > 0.3 THEN 'dup_words' END,
           CASE WHEN n_words >= 2 AND top_bigram_frac > 0.18 THEN 'top_bigram' END
         ], x -> x IS NOT NULL)) AS fails
  FROM f)
SELECT doc_id,
       n_words::INT AS n_words,
       round(mean_word_len, 4) AS mean_word_len,
       round(symbol_word_ratio, 4) AS symbol_word_ratio,
       round(bullet_line_frac, 4) AS bullet_line_frac,
       round(ellipsis_line_frac, 4) AS ellipsis_line_frac,
       round(alpha_word_frac, 4) AS alpha_word_frac,
       stopword_hits::INT AS stopword_hits,
       round(dup_word_frac, 4) AS dup_word_frac,
       round(top_bigram_frac, 4) AS top_bigram_frac,
       array_to_string(fails, ',') AS fail_reasons,
       (len(fails) = 0) AS keep
FROM r
"""


def test_oracle_draft_gopher_filter(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import gopher_filter

    got = _rows(
        gopher_filter(spark.table("documents")).withColumn(
            "fail_reasons", F.concat_ws(",", "fail_reasons")
        )
    )
    assert got == _sql_rows(ddb, GOPHER_SQL)
