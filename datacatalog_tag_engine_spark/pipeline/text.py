"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting. All built-in-function
expressions (JVM-side, codegen) — no Python in the hot path — and
deterministic so a SQL oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/punct tokenizer: word runs, digit runs, or single
# non-space punctuation — a cheap proxy for subword token counts.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_words, n_tokens): whitespace word count plus
    regex token count."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        F.length(t).alias("n_chars"),
        F.size(F.split(t, r"\s+")).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).alias("n_tokens"),
    )


STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as for on at by".split()
)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features per doc:

    mean_word_len, stopword_ratio (whitespace words that are stopwords),
    punct_ratio (punctuation chars / chars), alpha_ratio, plus a
    composite quality_score in [0,1]: high stopword presence and
    moderate word length up, punctuation noise down. All ratios rounded
    to 4 for cross-engine comparability.
    """
    t = F.col(text_col)
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_chars = F.length(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0))

    mean_word_len = (n_chars - (n_words - 1)) / n_words
    stopword_ratio = n_stop / n_words
    punct_ratio = n_punct / n_chars
    alpha_ratio = n_alpha / n_chars
    # composite built from the UNROUNDED ratios: integer-ratio operands
    # almost never land on exact round-half boundaries, keeping the
    # rounded result identical across engines with different half-rules
    quality = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.5) * alpha_ratio + F.lit(0.5) * F.least(F.lit(1.0), stopword_ratio * 5)
            - punct_ratio,
        ),
    )
    return docs.select(
        id_col,
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


# marker words per language for the n-gram/stopword language-ID
# heuristic; deterministic argmax with fixed language order tiebreak.
LANG_MARKERS = {
    "en": "the and is of to in that it with for".split(),
    "de": "der die das und ist nicht mit ein eine zu".split(),
    "fr": "le la les et est dans pour que une des".split(),
    "es": "el la los y es en que de una por".split(),
}


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): CJK chars -> 'zh'; otherwise the language
    with the most marker-word hits ('und' when zero hits everywhere).
    Ties break in fixed en>de>fr>es order."""
    t = F.col(text_col)
    words = F.split(F.lower(t), r"\s+")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    has_cjk = F.size(F.regexp_extract_all(t, F.lit(r"[一-鿿]"), 0)) > 0

    best = F.lit("und")
    best_score = F.lit(0)
    # reversed fixed order so that earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        cond = scores[lang] >= best_score
        # strictly-greater for later langs handled by reversed order +
        # >= for earlier: en checked last with >= wins equal scores
        best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best_score > 0, best).otherwise(F.lit("und"))
    )
    return docs.select(id_col, pred.alias("lang_pred"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    plus a 64-bit numeric form (first 15 hex chars) for cheap joins."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp = F.md5(norm)
    return docs.select(
        id_col,
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fingerprint64"),
    )
