"""Round-9 rotation prep: DuckDB oracle drafts for operators built in
round 8 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r9 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- m03_audio_fp_neardup — chromaprint-shaped temporal-delta audio
  fingerprint (multimodal.audio_fingerprint) + the m02 banding
  machinery; corpus/energies/bits replayed analytically.
- m04_video_frame_neardup — per-sampled-frame perceptual hashes
  (multimodal.video_frame_phashes) + sequence-aware banding
  (dedup.frame_neardup_pairs: temporally-aligned frames, floor on
  matching frames); full analytic replay.
- t27_tokenizer_fertility — per-source tokens/word + chars/token of
  the frozen BPE merge list (bpe.tokenizer_fertility); reuses the
  proven t18 encode CTE chain aggregated at source grain.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _sql_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    out = []
    for r in con.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _band_values() -> str:
    return ", ".join(
        f"({j}, {m}::BIGINT)" for j, m in enumerate(DD.hamming_band_masks(64, 4))
    )


# --- m03: audio fingerprint near-dup ---------------------------------------


def audio_fp_neardup_sql(
    n_groups: int = 6, group_size: int = 3, max_hamming: int = 10
) -> str:
    """Analytic replay of audio_fingerprint + hamming_neardup_pairs:
    fake band energies are integer arithmetic of (dur, seed, t, b);
    bit (t, b) is the temporal delta sign; packing and banding are the
    m02 rules (two's-complement bit 63, AND-mask bands)."""
    fr, nb = MM.AUDIO_FP_FRAMES, MM.AUDIO_FP_BANDS
    ncell = fr * nb
    energy = (
        "((dur*31 + (t*17 + b*41 + 1) * (5 + dur % 11)) % 1024 + "
        "CASE WHEN len(list_filter(range(seed), "
        f"c -> (dur*13 + c*7) % {ncell} = t * {nb} + b)) % 2 = 1 "
        "THEN 512 ELSE 0 END) % 1024"
    )
    return f"""
WITH m AS (
  SELECT (g * {group_size} + j)::BIGINT AS media_id,
         30000 + 700 * g AS dur, j AS seed
  FROM range({n_groups}) tg(g), range({group_size}) tj(j)),
e AS (
  SELECT media_id, t, b, {energy} AS v
  FROM m, range({fr}) tt(t), range({nb}) tb(b)),
bits AS (
  SELECT a.media_id, (a.t * {nb} + a.b) AS bit,
         CASE WHEN n.v > a.v THEN 1 ELSE 0 END AS s
  FROM e a JOIN e n ON n.media_id = a.media_id AND n.t = a.t + 1 AND n.b = a.b
  WHERE a.t < {fr - 1}),
fp AS (
  SELECT media_id,
         sum(CASE WHEN s = 1
                  THEN CASE WHEN bit = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << bit) END
                  ELSE 0 END)::BIGINT AS afp
  FROM bits GROUP BY media_id),
bk AS (
  SELECT media_id, afp, band, afp & mask AS key
  FROM fp, (VALUES {_band_values()}) bm(band, mask)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.afp AS fp_a, b.afp AS fp_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.media_id < b.media_id)
SELECT id_a, id_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}
"""


def _m03(spark):
    fps = MM.audio_fingerprint(MM.make_fake_audio_corpus(spark, 6, 3))
    return DD.hamming_neardup_pairs(
        fps, id_col="media_id", fp_col="afp", bits=64, bands=4, max_hamming=10
    )


def test_oracle_draft_audio_fp_neardup(spark, ddb):
    got = _rows(_m03(spark))
    want = _sql_rows(ddb, audio_fp_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_audio_fp_neardup_semantics(spark):
    rows = [(r["id_a"], r["id_b"], r["hamming"]) for r in _m03(spark).collect()]
    assert len(rows) == 18  # all intra-group variant pairs found
    assert all(a // 3 == b // 3 for a, b, _ in rows)


# --- m04: video frame-sequence near-dup ------------------------------------


def video_frame_neardup_sql(
    n_groups: int = 4,
    group_size: int = 3,
    sample_frames: int = 4,
    max_hamming: int = 10,
    min_matching_frames: int = 3,
) -> str:
    """Analytic replay of video_frame_phashes + frame_neardup_pairs:
    frame t's grid is the image fake with h+7t; banding joins the frame
    index into the key (temporal alignment); the pair floor counts
    distinct matched frames."""
    g = MM.PHASH_GRID
    return f"""
WITH m AS (
  SELECT (gg * {group_size} + j)::BIGINT AS media_id,
         128 + gg AS w, 72 + gg AS h, j AS seed
  FROM range({n_groups}) tg(gg), range({group_size}) tj(j)),
px AS (
  SELECT media_id, t, (cy * {g} + cx) AS cell,
         ((w*37 + (h + 7*t)*53 + (cx*13 + cy*29 + 1) * (3 + w % 13)) % 256 +
          CASE WHEN len(list_filter(range(seed),
                         c -> (w*7 + c*11) % 64 = cy * {g} + cx)) % 2 = 1
               THEN 128 ELSE 0 END) % 256 AS v
  FROM m, range({sample_frames}) tt(t), range({g}) a(cy), range({g}) b(cx)),
s AS (SELECT media_id, t, sum(v) AS sv FROM px GROUP BY media_id, t),
fp AS (
  SELECT px.media_id, px.t,
         sum(CASE WHEN 64 * v > sv
                  THEN CASE WHEN cell = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << cell) END
                  ELSE 0 END)::BIGINT AS phash
  FROM px JOIN s ON s.media_id = px.media_id AND s.t = px.t
  GROUP BY px.media_id, px.t),
bk AS (
  SELECT media_id, t, phash, band, phash & mask AS key
  FROM fp, (VALUES {_band_values()}) bm(band, mask)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.t AS frame,
                  a.phash AS fp_a, b.phash AS fp_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.t = b.t
                     AND a.media_id < b.media_id),
matched AS (
  SELECT id_a, id_b, frame FROM cand
  WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming})
SELECT id_a, id_b, count(DISTINCT frame)::INT AS n_matching_frames
FROM matched GROUP BY id_a, id_b
HAVING count(DISTINCT frame) >= {min_matching_frames}
"""


def _m04(spark):
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 4, 3), sample_frames=4)
    return DD.frame_neardup_pairs(
        vfp, min_matching_frames=3, max_hamming=10
    )


def test_oracle_draft_video_frame_neardup(spark, ddb):
    got = _rows(_m04(spark))
    want = _sql_rows(ddb, video_frame_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_video_frame_neardup_semantics(spark):
    rows = [
        (r["id_a"], r["id_b"], r["n_matching_frames"]) for r in _m04(spark).collect()
    ]
    assert len(rows) == 12  # all intra-group pairs, all 4 frames aligned
    assert all(a // 3 == b // 3 for a, b, _ in rows)
    assert all(n == 4 for _, _, n in rows)


def test_frame_floor_rejects_single_frame_coincidence(spark):
    """The min_matching_frames floor is real: raising it above the
    number of aligned frames empties the result."""
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 2, 2), sample_frames=4)
    assert DD.frame_neardup_pairs(vfp, min_matching_frames=5).count() == 0


# --- t27: tokenizer fertility ----------------------------------------------


def tokenizer_fertility_sql(merges) -> str:
    """The t18 encode chain (bpe_apply_sql's CTEs, same separator
    framing and [\\s\\x1f]+ split) aggregated at source grain, joined
    with word/char counts under the SAME tokenization."""
    sep = E._BPE_SEP
    init = (
        "'" + sep + "' || array_to_string(list_transform("
        "range(1, length(word) + 1), "
        "i -> CASE WHEN i = length(word) THEN word[i] || '</w>' "
        "ELSE word[i] END), '" + sep + "') || '" + sep + "'"
    )
    enc = init
    for a, b in merges:
        pat = (sep + a + sep + b + sep).replace("'", "''")
        rep = (sep + a + b + sep).replace("'", "''")
        enc = f"replace({enc}, '{pat}', '{rep}')"
    return rf"""
WITH w AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(coalesce(text, '')), '[\s\x1f]+') AS ws
  FROM documents),
tok AS (
  SELECT doc_id, source, ws[i+1] AS word
  FROM w, unnest(range(len(ws))) t(i)
  WHERE length(ws[i+1]) > 0),
enc AS (
  SELECT doc_id, source, length(word) AS nc,
         len(list_filter(regexp_split_to_array({enc}, chr(31)),
                         x -> length(x) > 0)) AS nt
  FROM tok),
per_doc AS (
  SELECT doc_id, any_value(source) AS source,
         count(*) AS nw, sum(nt) AS ntok, sum(nc) AS nchars
  FROM enc GROUP BY doc_id),
alldocs AS (
  SELECT d.doc_id, d.source,
         coalesce(p.nw, 0) AS nw, coalesce(p.ntok, 0) AS ntok,
         coalesce(p.nchars, 0) AS nchars
  FROM documents d LEFT JOIN per_doc p USING (doc_id))
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(nw)::BIGINT AS n_words,
       sum(ntok)::BIGINT AS n_tokens,
       sum(nchars)::BIGINT AS n_word_chars,
       round(sum(ntok) / sum(nw), 6) AS tokens_per_word,
       round(sum(nchars) / sum(ntok), 6) AS chars_per_token
FROM alldocs GROUP BY source
"""


def test_oracle_draft_tokenizer_fertility(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import bpe

    docs = spark.table("documents")
    got = _rows(bpe.tokenizer_fertility(docs, E.BPE_MERGES))
    want = _sql_rows(ddb, tokenizer_fertility_sql(E.BPE_MERGES))
    assert got == want
    assert len(got) > 1  # multiple sources profiled


def test_tokenizer_fertility_sanity(spark):
    """Fertility must sit in the physically meaningful band: >= 1
    token per word (BPE never merges across words) and chars/token
    between 1 and the longest word."""
    from datacatalog_tag_engine_spark.pipeline import bpe

    rows = bpe.tokenizer_fertility(spark.table("documents"), E.BPE_MERGES).collect()
    for r in rows:
        assert r["tokens_per_word"] >= 1.0
        assert 1.0 <= r["chars_per_token"] <= 30.0
