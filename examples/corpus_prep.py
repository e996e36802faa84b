"""End-to-end training-corpus preparation walkthrough: the cleaning,
dedup, selection, and export operators chained the way a pretraining
data pipeline would run them, against the driver's sf0.001 testdata.

Stages (each prints its accounting):

0. normalization       normalize_text + collapse_repeated_lines
1. quality gate        gopher_filter (arXiv:2112.11446 rules)
2. paragraph dedup     paragraph_dedup (CCNet, arXiv:1911.00359)
3. span removal        remove_repeated_spans (arXiv:2107.06499)
4. exact dedup         exact_dedup keep-canonical
5. LM quality score    bigram_logprob (interpolated bigram)
6. data selection      dsir_sample (arXiv:2302.03169)
6b. decontamination    apply_decontamination (eval-overlap drop)
7. sharded export      write_training_shards + manifest (.jsonl.gz)

Run: python examples/corpus_prep.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.dedup import (
    exact_dedup,
    paragraph_dedup,
    remove_repeated_spans,
)
from datacatalog_tag_engine_spark.pipeline.dsir import dsir_sample
from datacatalog_tag_engine_spark.pipeline.export import write_training_shards
from datacatalog_tag_engine_spark.pipeline.text import (
    apply_decontamination,
    bigram_logprob,
    collapse_repeated_lines,
    gopher_filter,
    normalize_text,
)
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("corpus_prep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n0 = docs.count()
    print(f"input corpus: {n0} docs")

    # 0. normalization: unify whitespace/typography so every downstream
    # dedup key means "same text"; collapse in-document repeated lines
    docs = normalize_text(docs, passthrough=True)
    docs = collapse_repeated_lines(docs).select("doc_id", "text")
    print("0. normalized + collapsed repeated lines")

    # 1. quality gate — thresholds loosened for the synthetic corpus
    # (word-salad testdata has no natural stopword density; on real web
    # text the published defaults apply)
    gated = docs.join(
        gopher_filter(
            docs, min_words=10, min_stopword_hits=0,
            max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
        ).filter("keep").select("doc_id"),
        "doc_id", "left_semi",
    )
    print(f"1. gopher gate: {gated.count()} kept")

    # 2. paragraph-grain dedup (keep-first)
    paras = paragraph_dedup(gated)
    print(f"2. paragraph dedup: cut {paras.agg(F.sum('n_removed')).first()[0]} paragraphs")

    # 3. cross-document repeated-span removal
    spans = remove_repeated_spans(paras, n=8, min_docs=3)
    print(f"3. span removal: cut {spans.agg(F.sum('n_removed')).first()[0]} words")

    # 4. exact dedup, keep canonical
    canon = spans.join(
        exact_dedup(spans).filter("is_canonical").select("doc_id"),
        "doc_id", "left_semi",
    )
    print(f"4. exact dedup: {canon.count()} canonical docs")

    # 5 + 6. DSIR selection toward an in-domain target (here: the
    # highest-LM-scoring decile stands in for a curated exemplar set)
    scored = bigram_logprob(canon).join(canon, "doc_id")
    cut = scored.agg(F.expr("percentile(avg_logprob, 0.9)")).first()[0]
    target = scored.filter(F.col("avg_logprob") >= cut).select("doc_id", "text")
    selected = dsir_sample(canon, target, k=min(100, canon.count()))
    print(f"5/6. DSIR selection: {selected.count()} docs toward {target.count()}-doc target")

    # 6b. decontamination: no selected doc may share a 5-gram with the
    # "benchmark" (here: the DSIR target standing in for an eval suite)
    kept_sel = canon.join(selected.select("doc_id"), "doc_id", "left_semi")
    decon = apply_decontamination(kept_sel, target, n=5)
    print(f"6b. decontamination: {decon.count()} of {kept_sel.count()} survive")

    # 7. sharded export with manifest — .jsonl.gz, the loader format —
    # then verify the written shards against their own manifest before
    # anything downstream trusts them
    keep = decon.withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    with tempfile.TemporaryDirectory() as d:
        manifest = write_training_shards(
            keep, f"{d}/shards", num_shards=4, token_col="n_tokens",
            data_format="json", compression="gzip",
        )
        rows = sorted((r["shard"], r["n_docs"], r["n_tokens"]) for r in manifest.collect())
        print("7. export manifest (shard, docs, tokens):", rows)
        from datacatalog_tag_engine_spark.pipeline.export import (
            verify_training_shards,
        )

        ok = verify_training_shards(spark, f"{d}/shards", data_format="json")
        print(f"7b. shard verification: {ok.filter('ok').count()}/{ok.count()} ok")

    # 8. training ORDER: quality curriculum, skew-checked then fixed —
    # stage by each doc's within-source quality quantile so clean-first
    # training does not silently become single-domain-first training
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        curriculum_order,
        source_relative_scores,
        stage_mixture,
    )
    from datacatalog_tag_engine_spark.pipeline.text import quality_scores

    # sources come from the raw table (the cleaning chain's frames
    # dropped the provenance columns)
    srcs = load_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    scored = (
        quality_scores(decon).select("doc_id", "quality_score").join(srcs, "doc_id")
    )
    cur = curriculum_order(source_relative_scores(scored), n_stages=4)
    mix = stage_mixture(cur, srcs)
    top = sorted(
        (r["source"], r["stage_share"]) for r in mix.collect() if r["stage"] == 1
    )
    print("8. curriculum stage-1 mixture (source, share):", top)

    spark.stop()


if __name__ == "__main__":
    main()
