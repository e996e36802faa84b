"""Document deduplication operators for training-data pipelines.

Four families, all DataFrame-native (no Python UDFs in the row path;
everything is JVM-side — plain expressions run in whole-stage codegen,
the higher-order n-gram builders run interpreted but still in the JVM)
and all deterministic so a SQL oracle can replay them:

* exact      — md5 fingerprint, window-dedup keep-lowest-id;
* minhash    — MinHash+LSH: word-shingles -> k md5-minhash signature ->
               banded buckets -> candidate pairs -> exact-Jaccard verify;
* simhash    — 16-bit SimHash over tokens (near-dup fingerprint);
* ngram      — exact n-gram Jaccard via an inverted shingle index
               (pairs sharing no shingle are never materialized).

Scale notes (100 TB):
- exact: one shuffle on the fingerprint; fingerprints are uniform so no
  skew.
- minhash-LSH: the only all-pairs step is the self-join on
  (band, bucket); bucket sizes are bounded because a bucket collision
  requires an exact band-signature match. This is the standard
  shingle->minhash->band->bucket-join pipeline.
- ngram: the inverted-index join can explode on stop-shingles; callers
  can drop shingles with document frequency > max_df before the join
  (the LSH path is the default at scale; this one is the exact
  verifier).

MinHash uses md5 (not murmur) so the DuckDB oracle computes bit-equal
signatures. Join KEYS, by contrast, are xxhash64 longs wherever only
equality matters (shingle membership joins, LSH band buckets): the
shuffles carry 8-byte keys instead of n-word strings or 32-char hex,
and sort-merge compares are integer compares — the values the oracle
checks (ids, counts, jaccard) are unchanged barring a 64-bit
collision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import free_local_checkpoint

# Default stop-shingle document-frequency cap for the containment
# family. The cap must be ABSOLUTE, not a corpus fraction: a shingle in
# f docs contributes f^2 inverted-index join rows, so a fractional cap
# still lets the hottest key grow quadratically with the corpus while an
# absolute cap bounds every key's fan-out at DF^2 rows (1e6 at 1000 —
# one comfortable task). 1000 is far above any genuine doc-in-doc
# overlap's shingle spread (those shingles are shared by the pair, not
# the corpus) and far below real boilerplate (license headers, templated
# pages land in 1-50% of an LLM training corpus). Semantics under the
# cap: capped shingles leave the intersection only — set sizes still
# count them — so scores shift solely for pairs whose claimed overlap
# WAS boilerplate, which is exactly what a containment detector must not
# flag. Pass max_df=None for exact semantics.
DEFAULT_CONTAINMENT_MAX_DF = 1000


def _resolve_max_df(max_df: int | str | None) -> int | None:
    if isinstance(max_df, str):
        if max_df != "auto":
            raise ValueError(f"max_df must be an int, None, or 'auto', got {max_df!r}")
        return DEFAULT_CONTAINMENT_MAX_DF
    return max_df


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: (doc_id, fingerprint, is_canonical). Lowest doc_id in
    each fingerprint group is canonical; equal-text docs dedup to it."""
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("fingerprint"))
        .withColumn("is_canonical", F.row_number().over(w) == 1)
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles; docs shorter than k words yield one whole-text
    shingle. Split on whitespace runs.

    Built with the shared zip_with-DOUBLING n-gram constructor
    (pipeline.text.ngram_array): O(log k) expression depth, O(words x
    log k) runtime — the naive k-1-step chain blows up the expression
    TREE exponentially (Catalyst planning hangs by k=8), and the
    per-index slice form executes O(words^2) array copies."""
    from .text import ngram_array

    toks = F.split(text, r"\s+")
    n = F.size(toks)
    full = F.slice(ngram_array(toks, k), 1, F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(n >= k, full).otherwise(F.array(F.concat_ws(" ", toks)))


def _repartition_for_explode(df: DataFrame, id_col: str) -> DataFrame:
    """Pre-explode repartition shared by every CPU-heavy shingle/token
    stage: document corpora often arrive as few large files, and without
    it the explode runs on as many cores as there are input splits.
    CPU-heavy stages must scale with the CLUSTER, which the session
    expresses as spark.sql.shuffle.partitions (RDD default parallelism
    is pinned small for driver-local relations); hashing BY the id also
    feeds any downstream groupBy(id) with no second shuffle."""
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width, id_col)


def _repartition_round_robin(df: DataFrame) -> DataFrame:
    """The KEYLESS sibling of _repartition_for_explode, for CPU-heavy
    corpus passes whose downstream groupBy is NOT doc-keyed (bucket /
    word / gram aggregates): round-robin gives uniform spread with no
    shuffle keys at all — hashing document bodies as keys would both
    serialize megabyte keys and pile every exact-duplicate document
    (boilerplate is the norm pre-dedup) onto one partition."""
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width)


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct rows — the shared base of the minhash
    and ngram paths.

    Two deliberate plan choices: (1) the shared pre-explode repartition
    (see _repartition_for_explode). (2) dedup shingles per-document
    with array_distinct inside the row (equivalent to a global distinct
    on (id, shingle)) — saves an entire shuffle."""
    return _repartition_for_explode(docs, id_col).select(
        id_col,
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("shingle"),
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 8, id_col: str = "doc_id") -> DataFrame:
    """One row per doc with columns sig_0..sig_{n-1}: the md5-minhash
    signature. Hash family j is md5('<j>:' || shingle) — deterministic
    and reproducible in any engine with md5."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def tune_lsh_params(
    threshold: float, num_hashes: int = 8, fp_weight: float = 0.5
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) with bands * rows == num_hashes
    minimizing the weighted false-positive + false-negative area of the
    LSH S-curve P(candidate | s) = 1 - (1 - s^rows)^bands around
    ``threshold`` — the same grid optimization as the public datasketch
    MinHashLSH optimal-param search. Feed the result straight into
    ``lsh_candidate_pairs(bands=...)`` / ``minhash_dedup(bands=...)``
    (both slice the signature as bands x rows_per_band).

    The grid is restricted to DIVISORS of num_hashes: the consumers
    recompute rows = num_hashes // bands from bands alone, so a
    non-divisor (bands, rows) would silently run a different S-curve
    than the one whose error areas were minimized here.

    ``fp_weight`` trades candidate-set size (false positives cost
    verification compute at 100 TB) against recall (false negatives are
    missed near-dups); 0.5 weighs them equally."""
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")

    def _area(f, lo, hi, n=100):
        h = (hi - lo) / n
        return sum(f(lo + h * (i + 0.5)) for i in range(n)) * h

    best = None
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        prob = lambda s: 1.0 - (1.0 - s**rows) ** bands
        fp = _area(prob, 0.0, threshold)
        fn = _area(lambda s: 1.0 - prob(s), threshold, 1.0)
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best is None or err < best[0]:
            best = (err, bands, rows)
    return best[1], best[2]


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signature and self-join on (band, bucket): docs agreeing
    on ALL hashes of any band become a candidate pair (doc_a < doc_b)."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        sig_slice = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        # bucket ids never leave this operator — only their EQUALITY
        # matters — so hash to a 64-bit long: the self-join shuffles
        # 8-byte keys instead of 32-char md5 strings, and the sort-merge
        # comparisons are integer compares
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(F.concat_ws("|", *sig_slice)).alias("bucket"))
        )
    buckets = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def hash_collision_count(shingles: DataFrame, col: str = "shingle") -> int:
    """Diagnostic for the xxhash64 join-key substitution used by
    ``jaccard_pairs`` / ``repeated_spans``: excess collisions =
    count(distinct shingle) - count(distinct hash). A group of k
    distinct shingles sharing one hash contributes k-1 (so 0 means no
    collisions anywhere; each collision silently merges counts).
    Expected 0 at any realistic corpus size
    (~2^-64 per pair); run at small scale when validating a new corpus
    shape, not in production plans — it double-scans the shingle set.
    """
    d = shingles.select(col).distinct()
    return (
        d.select(F.count("*").alias("n"), F.count_distinct(F.xxhash64(col)).alias("h"))
        .select((F.col("n") - F.col("h")).alias("c"))
        .first()["c"]
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (or for every pair
    sharing at least one shingle when candidates is None — the
    inverted-index join). Returns (doc_a, doc_b, jaccard) rounded to 4.

    ``max_df`` is the skew lever: shingles appearing in more than
    max_df documents are dropped from the JOIN side only (a shingle in
    f docs contributes f^2 join rows — stop-shingles dominate the
    shuffle at corpus scale). Sizes still count every shingle, so
    scores only shift for pairs whose sole overlap was stop-shingles —
    exactly the pairs a near-dup detector doesn't want anyway. Leave
    None for exact semantics (the oracle-checked default).

    Join plan: the intersection join needs only shingle EQUALITY, so
    shingles hash to 64-bit longs first (xxhash64) — the self-join
    shuffles 8-byte keys instead of k-word strings (~8x less shuffle at
    corpus scale, integer sort-merge compares instead of string). The
    Jaccard counts are unchanged barring a 64-bit collision. On the
    inverted-index path (no candidates) the hashed table is also
    materialized once (eager local checkpoint) because sizes and both
    join sides read it — otherwise the shingle explode re-runs 3x.
    """
    sh_h = shingles.select(id_col, F.xxhash64("shingle").alias("_h"))
    if candidates is None:
        sh_h = sh_h.localCheckpoint(eager=True)
    else:
        # the candidate set is consumed three times below (two doc-side
        # semi-joins + the pair semi) — materialize the thin pair list
        # once instead of re-running the LSH bucket join per consumer
        candidates = candidates.select("doc_a", "doc_b").localCheckpoint(eager=True)
    sizes = sh_h.groupBy(id_col).agg(F.count("*").alias("n"))

    join_side = sh_h
    if candidates is not None:
        # restrict the inverted index to docs that appear in ANY
        # candidate pair BEFORE the self-join: without this the join
        # generates every pair sharing a shingle across the whole
        # corpus and only then semi-filters to candidates — at corpus
        # scale the discarded all-pairs fan-out dominates (guide §1.2 /
        # §3.2 semi-join pre-filter). Candidate docs are a tiny
        # fraction of the corpus after LSH.
        cdocs = (
            candidates.select(F.col("doc_a").alias(id_col))
            .union(candidates.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
        join_side = join_side.join(cdocs, id_col, "left_semi")
    if max_df is not None:
        # drop the HOT set (df > max_df), not keep the rare set: the
        # rare set is essentially the whole vocabulary (corpus-grain),
        # while the hot set is bounded by total_shingle_rows / max_df
        # keys BY CONSTRUCTION — safe to broadcast at any corpus size.
        # left_anti(hot) == left_semi(rare) value-for-value (every key
        # has exactly one df). df counts run over the FULL corpus
        # (sh_h), not the candidate-restricted join side, so scores are
        # unchanged by the candidate pre-filter above.
        hot = (
            sh_h.groupBy("_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("_h")
        )
        join_side = join_side.join(F.broadcast(hot), "_h", "left_anti")

    if candidates is None:
        # inverted-index path: explicit width repartition on the join
        # key before the exploding self-join + pair-key repartition
        # before the count — the d25 winnowing fixes (AQE coalesces the
        # thin shingle exchange on input bytes, leaving the fan-out
        # join narrow; pair keys are near-unique per map partition so
        # the default partial aggregate reduces nothing)
        width = int(shingles.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        join_side = join_side.repartition(width, "_h")

    a = join_side.alias("a")
    b = join_side.alias("b")
    pair_rows = a.join(
        b, (F.col("a._h") == F.col("b._h")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
    if candidates is not None:
        # drop non-candidate incidence rows BEFORE the pair count: the
        # aggregate then runs over candidate pairs only instead of the
        # full shared-shingle fan-out (value-identical — a semi-join
        # commutes with the groupBy on the same key)
        pair_rows = pair_rows.join(candidates, ["doc_a", "doc_b"], "left_semi")
    else:
        pair_rows = pair_rows.repartition(width, "doc_a", "doc_b")
    inter = pair_rows.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))

    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def containment_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_df: int | str | None = "auto",
    assume_materialized: bool = False,
) -> DataFrame:
    """N-gram containment for candidate pairs (or every pair sharing a
    shingle when candidates is None): inter / min(|A|, |B|), rounded
    to 4. Catches doc-in-doc duplication that symmetric Jaccard
    misses — a 50-word doc pasted verbatim into a 5000-word doc has
    containment ~1.0 but Jaccard ~0.01, so a Jaccard-thresholded
    near-dup pass keeps both copies. Standard containment metric per
    Broder's "On the resemblance and containment of documents" (1997).

    Same physical shape as ``jaccard_pairs`` (kept separate so the
    certified d04 path stays untouched): shingles hash to 8-byte
    xxhash64 join keys, the inverted-index self-join shuffles longs,
    and ``max_df`` drops stop-shingles from the JOIN side only (sizes
    still count them — scores shift only for pairs whose sole overlap
    was stop-shingles). At corpus scale containment is MORE skew-prone
    than Jaccard: boilerplate headers shared by f docs contribute f^2
    join rows AND pass the threshold when the header is most of the
    smaller doc, so the cap is ON by default ("auto" =
    DEFAULT_CONTAINMENT_MAX_DF, an absolute cap — see the constant's
    rationale). Pass max_df=None for exact semantics.

    Reference analog: the tag-propagation "same content, different
    asset" checks (DataCatalogController.py:909-941 pick the smallest
    adequate match structure); containment is the text-corpus form.
    """
    max_df = _resolve_max_df(max_df)
    sh_h = shingles.select(id_col, F.xxhash64("shingle").alias("_h"))
    if candidates is None and not assume_materialized:
        # materialize once: sizes, the join side, and the optional df
        # filter all re-read this relation. Callers that already hold a
        # checkpointed shingle table (containment_dedup) pass
        # assume_materialized=True — re-hashing materialized rows is
        # cheaper than pinning a second corpus-sized generation in the
        # block manager.
        sh_h = sh_h.localCheckpoint(eager=True)
    sizes = sh_h.groupBy(id_col).agg(F.count("*").alias("n"))

    join_side = sh_h
    if max_df is not None:
        # broadcast the HOT set (df > max_df) and anti-join, never the
        # rare set: with the cap defaulting ON, the rare set is the
        # whole vocabulary minus a handful of stop-shingles — forcing
        # THAT broadcast collects corpus-grain state to the driver and
        # OOMs at exactly the scales the cap exists for. The hot set is
        # bounded by total_shingle_rows / max_df keys by construction.
        # left_anti(hot) == left_semi(rare) value-for-value.
        hot = (
            sh_h.groupBy("_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("_h")
        )
        join_side = sh_h.join(F.broadcast(hot), "_h", "left_anti")

    if candidates is None:
        # inverted-index path: width repartition on the join key before
        # the exploding self-join + pair-key repartition before the
        # count — the d25 winnowing fixes (see jaccard_pairs)
        width = int(shingles.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        join_side = join_side.repartition(width, "_h")

    a = join_side.alias("a")
    b = join_side.alias("b")
    pair_rows = a.join(
        b, (F.col("a._h") == F.col("b._h")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
    if candidates is None:
        pair_rows = pair_rows.repartition(width, "doc_a", "doc_b")
    inter = pair_rows.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")

    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    cont = (
        inter.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / F.least(F.col("sa.n"), F.col("sb.n")), 4
            ).alias("containment"),
        )
    )
    return cont.filter(F.col("containment") >= threshold)


def containment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_df: int | str | None = "auto",
    k: int = 3,
) -> DataFrame:
    """Doc-in-doc dedup in the production order the stress rung proved
    out (SCALE.md round-8 overlap section): exact dedup FIRST, then
    containment dominance among the canonicals only. Running
    containment on a raw corpus makes every clone family contribute
    C(f,2) containment-1.0 pairs and multiplies the inverted-index
    fan-out by f^2 — measured 8.5x wall / 95x shuffle for a 10-clone
    corpus — while the deduped corpus pays the 1x price for the same
    decisions.

    Keep rule, single pass (no iteration): a doc is kept iff it is its
    exact-fingerprint family's canonical AND no containment pair
    dominates it. In a pair with containment >= threshold the LOSER is
    the smaller-shingle-set side (the contained doc); on a size tie —
    near-identical text that slipped exact dedup via whitespace — the
    higher doc_id loses (pairs are emitted doc_a < doc_b, so the tie
    loser is doc_b). A kept doc may dominate a doc that dominated
    another: dominance is NOT made transitive, matching
    semantic_dedup's cell-local single-pass rule.

    Returns (doc_id, keep) for EVERY input doc. Non-canonical clones
    get keep=false (their canonical inherits their fate decisions).

    Exact-dedup-first kills clone-family blowup but does nothing for
    boilerplate shared across DISTINCT docs, so the ``max_df`` stop-
    shingle cap defaults ON here too ("auto" =
    DEFAULT_CONTAINMENT_MAX_DF; see containment_pairs).
    """
    # barrier the THIN (id, is_canonical) stream (r14, guide §5 reuse):
    # ex is consumed twice (the canonical semi-join probe AND the final
    # keep output), and each consumer re-ran the full-text md5 + the
    # fingerprint window — one corpus pass each. Materialize the
    # decision once; the window's shuffle and the md5 scan now run
    # exactly once per call.
    ex = (
        exact_dedup(docs, id_col, text_col)
        .select(id_col, "is_canonical")
        .localCheckpoint(eager=True)
    )
    canon = docs.join(
        ex.filter("is_canonical").select(id_col), id_col, "left_semi"
    )
    # ONE corpus-sized materialization: the shingle checkpoint feeds
    # sizes AND the pair join; containment_pairs is told not to stack a
    # second checkpoint on top (assume_materialized). The loser set —
    # bounded by the duplicate count, tiny next to the shingle table —
    # is materialized eagerly so the shingle blocks can be freed HERE
    # instead of pinning block-manager storage for the session (the
    # pressure bench.py's docstring warns inflates later queries).
    sh = shingle_table(canon, id_col, text_col, k).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    pairs = containment_pairs(
        sh, None, threshold, id_col, max_df, assume_materialized=True
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    losers = (
        pairs.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            F.when(F.col("sa.n") < F.col("sb.n"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("_loser")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    free_local_checkpoint(sh)
    return (
        ex.select(id_col, "is_canonical")
        .join(losers, F.col(id_col) == F.col("_loser"), "left")
        .select(
            id_col,
            (F.col("is_canonical") & F.col("_loser").isNull()).alias("keep"),
        )
    )


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int | None = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: returns verified pairs
    (doc_a, doc_b, jaccard >= threshold) found via banded LSH.

    ``bands=None`` derives the banding from ``threshold`` via
    ``tune_lsh_params`` (datasketch-style S-curve optimization), so the
    candidate S-curve is centered on the verify threshold instead of
    whatever the fixed default implies."""
    if bands is None:
        bands, _ = tune_lsh_params(threshold, num_hashes)
    # the shingle table feeds both the signature and the verify branch
    # of one action — materialize it once (eager local checkpoint)
    # instead of recomputing the explode in both subtrees
    sh = shingle_table(docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, num_hashes, id_col)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col)
    return jaccard_pairs(sh, cands, threshold, id_col)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint over whitespace tokens.

    Token hash = first ceil(bits/4) md5 hex chars (at least 4, so the
    16-bit default matches the SQL oracle exactly); bit j of the
    fingerprint is 1 when the sum over tokens of (+1 if token-hash bit j
    else -1) is positive. Distinct tokens weighted by occurrence count.
    Returns (doc_id, simhash BIGINT). bits caps at 60: the token hash
    must carry a real bit at every fingerprint position (the old fixed
    4-hex prefix silently zeroed bits 16+) and fit a signed long.
    """
    if bits > 60:
        raise ValueError(f"simhash supports at most 60 bits, got {bits}")
    toks = _repartition_for_explode(docs, id_col).select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    )
    nhex = max(4, (bits + 3) // 4)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, nhex), 16, 10).cast("long")
    toks = toks.select(id_col, h.alias("h"))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    fingerprint = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select(F.col(id_col), fingerprint.cast("long").alias("simhash"))


def hamming_band_masks(bits: int, bands: int) -> list[int]:
    """Signed-int64 band masks for Hamming LSH: band j covers bits
    [j*width, (j+1)*width). Masks are applied with bitwise AND (never a
    shift), so a fingerprint with bit 63 set — negative in two's
    complement — bands identically in Spark longs and SQL BIGINTs;
    logical-vs-arithmetic right-shift semantics never enter."""
    if bits % bands:
        raise ValueError(f"bits ({bits}) must divide into bands ({bands})")
    width = bits // bands
    masks = []
    for j in range(bands):
        m = ((1 << width) - 1) << (j * width)
        masks.append(m - (1 << 64) if m >= 1 << 63 else m)
    return masks


def hamming_neardup_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs over any precomputed bit fingerprint (simhash,
    image perceptual hash, audio chromaprint...) by banded Hamming
    LSH: fingerprints agreeing on at least one of ``bands`` bit-bands
    become candidates (the pigeonhole guarantee: hamming < bands
    forces a clean band, so those pairs are found with recall 1; pairs
    up to ``max_hamming`` are found when the flips miss a band); the
    verify step keeps candidates with bit_count(xor) <= max_hamming.

    The minhash ``lsh_candidate_pairs`` shape on a different key
    geometry: one posexplode to (id, band, key) — ``bands`` rows per
    fingerprint, never corpus x corpus — a self-join on (band, key)
    with id_a < id_b, distinct, then the exact Hamming filter. Null
    fingerprints drop out (undecodable payloads can't pair). At 100 TB
    the join shuffles 8-byte keys, and hot bands (a constant-ish band
    across the corpus) salt the same way minhash bands do.

    Returns (id_a, id_b, hamming), exact distance, ascending ids."""
    masks = hamming_band_masks(bits, bands)
    keyed = fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).cast("long").alias("_fp"),
        F.posexplode(
            F.array(*[F.col(fp_col).cast("long").bitwiseAND(F.lit(m)) for m in masks])
        ).alias("band", "key"),
    )
    left = keyed.select(
        F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"), "band", "key"
    )
    right = keyed.select(
        F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"), "band", "key"
    )
    cands = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cands.select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def frame_neardup_pairs(
    frame_fps: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    fp_col: str = "phash",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 8,
    min_matching_frames: int = 3,
) -> DataFrame:
    """Sequence-aware near-dup over per-frame fingerprints (video
    dedup): two items pair when at least ``min_matching_frames`` of
    their TEMPORALLY ALIGNED frames are within ``max_hamming`` — a
    re-encode matches frame-for-frame, while two videos sharing one
    incidental frame (a black frame, a standard intro card) do not
    clear the floor.

    ``hamming_neardup_pairs``' banding with the frame index joined
    into the band key: candidates require (frame, band, key) equality,
    so banding never pairs frame 0 of one video with frame 3 of
    another. Per-frame verify is the exact bit_count(xor); the final
    aggregate counts distinct matched frames per pair. All relations
    are fingerprint-grain (frames x 8 bytes) — payloads stay in the
    upstream scan stage exactly as in the single-hash path.

    Returns (id_a, id_b, n_matching_frames), ascending ids."""
    masks = hamming_band_masks(bits, bands)
    keyed = frame_fps.filter(F.col(fp_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(frame_col).alias("_frame"),
        F.col(fp_col).cast("long").alias("_fp"),
        F.posexplode(
            F.array(*[F.col(fp_col).cast("long").bitwiseAND(F.lit(m)) for m in masks])
        ).alias("band", "key"),
    )
    left = keyed.select(
        F.col("_id").alias("id_a"), F.col("_frame").alias("frame"),
        F.col("_fp").alias("fp_a"), "band", "key",
    )
    right = keyed.select(
        F.col("_id").alias("id_b"), F.col("_frame").alias("frame"),
        F.col("_fp").alias("fp_b"), "band", "key",
    )
    cands = (
        left.join(right, ["frame", "band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "frame", "fp_a", "fp_b")
        .distinct()
    )
    matched = cands.filter(
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= max_hamming
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count_distinct("frame").cast("int").alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    driver_edge_limit: int = 5_000_000,
    escalate_to_star: bool = True,
) -> DataFrame:
    """Connected components over near-dup pairs: every document gets a
    cluster_id = the smallest doc id reachable through the pair graph
    (singletons cluster to themselves). The canonical keeper per cluster
    is then ``doc_id == cluster_id``.

    Two-regime plan. The EDGE set (verified near-dup pairs) is orders
    of magnitude below corpus size at any scale — a few percent dup
    rate over even a 100 TB corpus is a driver-memory-sized edge list —
    so up to ``driver_edge_limit`` edges the components resolve with an
    exact min-root union-find on the driver (the CORPUS is never
    collected; only the non-trivial label mapping ships back, broadcast
    onto one labels join). Beyond the limit, iterative min-label
    propagation runs fully distributed: each round joins current labels
    to the edge list and takes the min over neighbors; converges in
    O(component diameter) rounds with an eager checkpoint per round to
    keep lineage flat (the standard DataFrame-only connected
    components, no GraphX dependency). Both regimes produce the
    identical labeling (tests prove equality).

    If propagation has not converged within ``max_iterations`` — a
    long chain component (diameter > rounds) would otherwise return
    one cluster split under several labels, and apply_neardup_dedup
    would silently keep multiple 'canonical' near-duplicates — the
    distributed regime ESCALATES to ``neardup_clusters_star``
    (alternating star contraction, O(log n) rounds regardless of
    diameter, labeling proven identical), so the caller keeps the
    exact answer at O(log n) extra cost instead of retrying with a
    bigger round budget. The defaulting decision (r11 verdict ask):
    min-label stays the FIRST distributed regime because near-dup
    components are overwhelmingly shallow (a dup cluster's diameter is
    ~2-3 hops) and each min-label round is ONE join + groupBy where a
    star round-pair is ~four edge-grain joins — cheaper per round by
    ~2x on the common shape (measured, tools/cc_ladder.py); star is
    the ESCAPE for the chain worst case, reached only when the round
    budget proves the shape is chain-like. ``escalate_to_star=False``
    restores the old raise-on-budget contract. The loop runs
    ``max_iterations`` propagation rounds plus one final verification
    round, so a component that reaches its fixed point exactly on the
    last allowed round (the verification round's propagation is then a
    no-op) still returns instead of escalating.
    """
    if driver_edge_limit:
        # materialize the (expensive) pairs plan ONCE; the count and —
        # when small — the edge collect both read the checkpoint, and
        # an over-limit edge set never transfers to the driver at all
        pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
        if pairs.count() <= driver_edge_limit:
            try:
                head = pairs.collect()
            except Exception:
                # driver.maxResultSize / driver memory: degrade to the
                # distributed regime instead of failing the job
                head = None
            if head is not None:
                labels = _neardup_clusters_unionfind(docs, head, id_col)
                free_local_checkpoint(pairs)
                return labels
    edges = (
        pairs.selectExpr("doc_a as src", "doc_b as dst")
        .unionByName(pairs.selectExpr("doc_b as src", "doc_a as dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if driver_edge_limit:
        # the pairs checkpoint is dead once edges (itself eager) exists;
        # without this the over-limit / collect-failure path pins an
        # edge-list-sized generation for the session's lifetime
        free_local_checkpoint(pairs)
    labels = docs.select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    prev_ckpt = None
    converged = False
    # max_iterations propagation rounds + 1 verification round: when
    # the fixed point lands exactly on round max_iterations, the extra
    # round observes changed == 0 and converges rather than raising
    for it in range(max_iterations + 1):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels[id_col])
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        # ONE checkpoint materializes the round; the convergence count
        # and next round's labels both read it (counting the
        # un-checkpointed plan would re-run the propagation join)
        updated = (
            labels.join(neighbor_min, labels[id_col] == neighbor_min["src"], "left")
            .select(
                labels[id_col],
                F.least(F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))).alias(
                    "new_cluster_id"
                ),
                F.col("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        # the previous round's blocks are dead once this round exists —
        # free them or an N-round run holds N generations of labels
        if prev_ckpt is not None:
            free_local_checkpoint(prev_ckpt)
        prev_ckpt = updated
        labels = updated.select(F.col(id_col), F.col("new_cluster_id").alias("cluster_id"))
        # round 1 changes whenever any edge exists — skip its
        # convergence count (one full job) unless it is ALSO the
        # verification round; if the edge set is empty the next count
        # returns 0 and exits
        if it > 0 or max_iterations == 0:
            changed = updated.filter(F.col("new_cluster_id") != F.col("cluster_id")).count()
            if changed == 0:
                converged = True
                break
    if not converged:
        # the last round's labels are partial (dead either way)
        if prev_ckpt is not None:
            free_local_checkpoint(prev_ckpt)
        if escalate_to_star:
            # chain-shaped component: hand the edge list to star
            # contraction — identical labeling in O(log n) rounds. One
            # direction only (src < dst): edges was symmetrized for the
            # propagation joins, and star symmetrizes internally, so
            # passing both directions would double every round's
            # shuffle volume at exactly the scale escalation fires.
            # Star checkpoints its own copy eagerly, then the
            # propagation edges can be freed.
            result = neardup_clusters_star(
                docs,
                edges.filter(F.col("src") < F.col("dst")).selectExpr(
                    "src as doc_a", "dst as doc_b"
                ),
                id_col,
            )
            free_local_checkpoint(edges)
            return result
        free_local_checkpoint(edges)
        raise RuntimeError(
            f"neardup_clusters: label propagation did not converge within "
            f"{max_iterations} rounds — a component's diameter exceeds the "
            f"round budget; raise max_iterations or leave escalate_to_star on"
        )
    # final labels read only the last round's checkpoint
    free_local_checkpoint(edges)
    return labels


def _neardup_clusters_unionfind(docs: DataFrame, edge_rows: list, id_col: str) -> DataFrame:
    """Driver-side exact min-root union-find over the (small, already
    collected) edge rows; the corpus stays distributed — only the
    non-trivial (id -> cluster_id) mapping, sized by the number of
    near-dup documents, ships back and broadcasts onto one labels
    join."""
    from pyspark.sql import types as T

    from ..session import local_df

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while x != root:  # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    for row in edge_rows:
        ra, rb = find(row["doc_a"]), find(row["doc_b"])
        if ra != rb:
            # min root wins, so every component's root IS its min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    mapping = [(x, find(x)) for x in list(parent)]
    mapping = [(x, r) for x, r in mapping if x != r]
    id_type = docs.schema[id_col].dataType
    map_df = local_df(
        docs.sparkSession,
        mapping,
        T.StructType(
            [T.StructField(id_col, id_type), T.StructField("_root", id_type)]
        ),
    )
    return (
        docs.select(id_col)
        .join(F.broadcast(map_df), id_col, "left")
        .select(id_col, F.coalesce("_root", F.col(id_col)).alias("cluster_id"))
    )


def apply_neardup_dedup(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the deduplicated corpus: keep one canonical document
    per cluster (the min-id member, i.e. cluster_id == id). The last
    step of the dedup pipeline — shingle -> LSH pairs -> connected
    components -> THIS. A left-semi join on the id key — the canonical
    set is corpus-sized (most documents are unique), so no broadcast:
    one co-partitioned shuffle, AQE downgrades it to broadcast when the
    surviving set really is small. Payload columns pass through
    untouched."""
    keep = clusters.filter(F.col("cluster_id") == F.col(id_col)).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    strategy: str = "grid",
    block_target: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs (vec_a < vec_b) with
    cosine >= threshold, rounded to 4 decimals.

    Default strategy ``grid``: grid-blocked all-pairs. Each vector gets
    a deterministic md5-derived block id in [0, B); the B*(B+1)/2
    unordered block pairs are enumerated, both sides are shuffled to
    their block-pair groups, and a cogrouped Arrow GEMM computes one
    (block x block) cosine tile per group. A pair with blocks p <= q
    lands in exactly one tile, so no dedup pass is needed. Nothing is
    ever collected to the driver and no single task holds more than two
    blocks (~2 * block_target vectors), so the corpus size is bounded
    only by cluster capacity — the shuffle cost is the unavoidable
    O(n * B) replication every all-pairs scheme pays. Per-pair
    arithmetic (normalize, then a fixed-order dot product) is identical
    regardless of blocking, so results are bit-equal to brute force and
    the SQL oracle.

    Strategy ``broadcast``: small-corpus fast path (collect + broadcast
    + mapInPandas GEMM against the full corpus). Caps at driver/executor
    memory — only for corpora known to fit (~1e6 x 128d doubles = 1 GB).
    """
    import numpy as np
    import pandas as pd

    def _tile(qids, q, cids, c, same_block):
        """Cosine tile between query rows (qids, q) and corpus rows
        (cids, c); emits (least, greatest, cosine) above threshold."""
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        out_a, out_b, out_s = [], [], []
        for lo in range(0, len(qn), 1024):  # bound the sims tile to ~1024 x block rows
            sims = np.round(qn[lo : lo + 1024] @ cn.T, 4)
            qi, ci = np.where(sims >= threshold)
            a, b = qids[lo : lo + 1024][qi], cids[ci]
            keep = (a < b) if same_block else (a != b)
            out_a.append(np.minimum(a[keep], b[keep]))
            out_b.append(np.maximum(a[keep], b[keep]))
            out_s.append(sims[qi, ci][keep])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "vec_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "cosine": np.concatenate(out_s) if out_s else np.array([], dtype=np.float64),
            }
        )

    if strategy == "broadcast":
        spark = emb.sparkSession
        rows = emb.select(id_col, vec_col).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        M = np.array([list(r[1]) for r in rows], dtype=np.float64)
        bc = spark.sparkContext.broadcast((ids, M))

        def block(batches):
            ids_all, m_all = bc.value
            for pdf in batches:
                q = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                qids = pdf[id_col].to_numpy()
                # same_block=False + a!=b would double-emit here (corpus
                # side is the whole corpus), so keep strict a<b pairs
                yield _tile(qids, q, ids_all, m_all, same_block=True)

        return emb.select(id_col, vec_col).mapInPandas(
            block, "vec_a long, vec_b long, cosine double"
        )

    if strategy != "grid":
        raise ValueError(f"unknown strategy {strategy!r} (grid | broadcast)")

    spark = emb.sparkSession
    n = emb.count()
    n_blocks = max(1, -(-n // block_target))
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    blk = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % n_blocks
    ).cast("int")
    v = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), blk.alias("_blk"))
    # both cogroup sides derive from the same (v, bp) plans — re-alias
    # every column to mint fresh expression ids, else Spark reports the
    # self-cogroup columns as ambiguous
    fresh = lambda df: df.select(*[F.col(c).alias(c) for c in ["bi", "bj", "_id", "_vec"]])
    left = fresh(v.join(F.broadcast(bp), v["_blk"] == bp["bi"]))
    right = fresh(v.join(F.broadcast(bp), v["_blk"] == bp["bj"]))

    def gemm(lpdf, rpdf):
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        same = lpdf["bi"].iat[0] == lpdf["bj"].iat[0] if not lpdf.empty else True
        q = np.array([list(x) for x in lpdf["_vec"]], dtype=np.float64)
        c = np.array([list(x) for x in rpdf["_vec"]], dtype=np.float64)
        return _tile(lpdf["_id"].to_numpy(), q, rpdf["_id"].to_numpy(), c, same)

    return (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(gemm, "vec_a long, vec_b long, cosine double")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.6,
    num_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus with a coarse quantizer,
    then inside each cell drop every vector that is semantically
    near-identical (cosine >= threshold) to a higher-priority vector.

    Priority is lowest-id, and the drop rule is the order-independent
    dominance form: x is dropped iff ANY lower-id vector in its cell is
    within threshold — a one-shot join, no iteration, identical on any
    partitioning, SQL-replayable. (Greedy sequential SemDeDup differs
    only on chains A~B, B~C, A!~C, where it would re-keep C; the
    dominance rule drops C too — the conservative direction for
    training-data dedup.)

    Cells come from the shared ``_ranked_cells`` derivation
    (deterministic first-k-by-id centroids, or trained ``cents`` via
    ``similarity.kmeans_centroids``). 100 TB shape: assignment is a
    broadcast-centroid projection (one corpus scan, no shuffle); the
    intra-cell pair search shuffles once on cell id; the quantizer's
    whole job is making the quadratic pair scan LOCAL to a cell — size
    num_cells ~ sqrt(n) (the paper's regime) so cells stay bounded.

    ``cell_cap`` is the skew lever: a hot quantizer cell (real corpora
    cluster — one dense topic can swallow a large corpus fraction)
    re-creates the quadratic INSIDE one task. Cells larger than the cap
    split on a secondary id-hash into ceil(n/cap) salts: the probe side
    keeps its own salt, the dominator side replicates to every salt of
    the cell (the ``operators.skew`` salted-join pattern), so every
    within-cell pair still meets exactly once and results are identical
    on any distribution — only the max task's pair count is bounded
    (cap x cell instead of cell^2). The per-cell counts come from one
    tiny (cell)-grain aggregation that broadcasts. None disables.

    Returns (vec_id, cell, dup_of, cosine, is_kept): dup_of = lowest
    dominating id (NULL for survivors), cosine = round-4 similarity to
    it, is_kept = dup_of IS NULL.
    """
    from datacatalog_tag_engine_spark.pipeline.similarity import (
        _ranked_cells,
        dot_expr,
        norm_expr,
    )

    # the cell assignment feeds FOUR consumers (both pair-join sides,
    # the split counts, and the final labels join) and exchange reuse
    # does not span them (verified: 0 ReusedExchange in the unmaterialized
    # plan) — persist() it so the centroid crossJoin + rank window runs
    # one corpus pass instead of four. persist, not localCheckpoint: it
    # is lazy (no job at plan-construction time), its blocks are
    # LRU-evictable and recomputable from lineage (a checkpoint pins
    # non-evictable blocks with no caller-visible release path), and it
    # measures faster warm (1.3s vs 2.4s at sf0.1)
    assign = (
        _ranked_cells(emb, num_cells, id_col, vec_col, cents=cents)
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("v"), F.col("cell"))
        .persist()
    )
    # norm once per VECTOR, not per pair: inside the pair join the
    # cosine denominator reuses these columns, cutting the per-pair
    # interpreted array work from three O(dim) folds to one (the dot).
    # na*nb multiplies the exact same float values sqrt(agg(v)) the
    # in-pair form would, so scores are bit-identical.
    withn = assign.withColumn("_norm", norm_expr(F.col("v")))
    a = withn.select(F.col(id_col).alias("vid"), F.col("v").alias("va"), F.col("_norm").alias("_na"), "cell")
    b = withn.select(F.col(id_col).alias("dom_id"), F.col("v").alias("vb"), F.col("_norm").alias("_nb"), "cell")
    if cell_cap is not None:
        splits = F.broadcast(
            assign.groupBy("cell").agg(
                F.ceil(F.count("*") / F.lit(cell_cap)).cast("int").alias("_s")
            )
        )
        a = a.join(splits, "cell").withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("vid")), F.col("_s")).cast("int")
        )
        b = b.join(splits, "cell").withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.col("_s") - 1))
        )
        join_keys = ["cell", "_salt"]
    else:
        join_keys = ["cell"]
    sims = (
        a.join(b, join_keys)
        .filter(F.col("dom_id") < F.col("vid"))
        .select(
            "vid",
            "dom_id",
            F.round(
                dot_expr(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")), 4
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("vid").orderBy(F.asc("dom_id"))
    dom = (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vid", F.col("dom_id").alias("dup_of"), F.col("cos").alias("cosine"))
    )
    return assign.join(dom, assign[id_col] == dom["vid"], "left").select(
        id_col,
        "cell",
        "dup_of",
        "cosine",
        F.col("dup_of").isNull().alias("is_kept"),
    )


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 of the sorted distinct lowercase
    word set. Two docs with the same vocabulary (any order, any
    multiplicity) collide — a cheap order-insensitive near-dup key."""
    words = F.array_sort(F.array_distinct(F.split(F.lower(text), r"\s+")))
    return F.md5(F.concat_ws(" ", words))


def incremental_delta(
    batch: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingest dedup: keep only the docs in an incoming batch
    whose bag-of-words fingerprint does not already exist in the prior
    corpus. This is the daily-crawl pattern at 100 TB: the new batch is
    small relative to the accumulated corpus, and the anti-join runs on
    the uniform fingerprint key (one shuffle).
    ``incremental_delta_bloom`` is the extreme-scale sibling: a
    constant-size broadcast bloom bitmap prefilters definite-negatives
    so only dup-rate-sized candidates reach this exact anti-join —
    identical output by construction. Returns the surviving batch rows
    as (doc_id, fingerprint).

    Precondition (both forms): batch rows are unique per ``id_col`` —
    the normal crawl-manifest shape. A batch with duplicate ids keeps
    its duplicates here but collapses them in the bloom form's
    per-(id, fingerprint) probe aggregation; dedupe the batch first if
    its ids can repeat.
    """
    b = batch.select(id_col, bow_fingerprint(F.col(text_col)).alias("fingerprint"))
    p = prior.select(bow_fingerprint(F.col(text_col)).alias("fingerprint")).distinct()
    return b.join(p, "fingerprint", "left_anti").select(id_col, "fingerprint")


def incremental_delta_bloom(
    batch: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """``incremental_delta`` with the bloom prefilter its docstring
    promises at 100 TB — same output rows, different plan shape.

    The prior corpus is scanned ONCE to build a bloom bitmap as plain
    DataFrame aggregation: each fingerprint sets k = 4 bit positions
    (xxhash64 seeded per hash) in an m = ``num_bits`` bitset stored as
    ceil(m/64) longs via bit_or — a constant-size (<= m/64 rows) table
    that broadcasts no matter how large the prior corpus grows. Batch
    docs with ANY unset bit are DEFINITELY new (kept with no further
    work — the common case for a daily crawl); only docs whose k bits
    all hit (true dups + bloom false positives) reach the exact
    anti-join, whose right side is the prior fingerprint set. The union
    of both branches is exactly the exact-form output: the bloom can
    only divert definite-negatives, never change membership — the SQL
    oracle for this operator IS the exact form's query.

    At 100 TB: the exact form shuffles batch+prior for the anti-join
    every run; this form pays one prior scan to build a reusable
    constant-size bitmap and the anti-join input shrinks to the
    candidate set (dup-rate-sized).

    Same precondition as ``incremental_delta``: batch rows unique per
    ``id_col`` (the probe aggregation groups by (id, fingerprint), so a
    duplicated id would collapse here while the exact form keeps it).
    """
    fp_b = batch.select(id_col, bow_fingerprint(F.col(text_col)).alias("fingerprint"))
    # persist() the prior fingerprint set: the bitmap build AND the
    # verification anti-join both read it, so the prior corpus is
    # scanned (and fingerprinted) ONCE per run, not once per consumer —
    # fingerprint-only rows, LRU-evictable, recomputable
    fp_p = prior.select(bow_fingerprint(F.col(text_col)).alias("fingerprint")).distinct().persist()

    def positions(df: DataFrame) -> Column:
        return F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("fingerprint", F.lit(i)), F.lit(num_bits))
                    for i in range(k)
                ]
            )
        )

    # shiftleft with a COLUMN shift amount needs the SQL form (the
    # python F.shiftleft only takes a literal int)
    word = (F.col("pos") / 64).cast("long")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")

    p_pos = fp_p.select(positions(fp_p).alias("pos"))
    bitmap = (
        p_pos.select(word.alias("w"), bit.alias("b"))
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )

    b_pos = fp_b.select(id_col, "fingerprint", positions(fp_b).alias("pos")).select(
        id_col, "fingerprint", word.alias("w"), bit.alias("b")
    )
    probed = b_pos.join(F.broadcast(bitmap), "w", "left").select(
        id_col,
        "fingerprint",
        (F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("b")) == F.col("b"))).alias("_hit"),
    )
    # persist(): both union branches below read flags — without this the
    # whole probe (explode + broadcast join + aggregate) computes once
    # per branch
    flags = probed.groupBy(id_col, "fingerprint").agg(
        (F.min(F.col("_hit").cast("int")) == 1).alias("_all_hit")
    ).persist()
    definitely_new = flags.filter(~F.col("_all_hit")).select(id_col, "fingerprint")
    candidates = flags.filter(F.col("_all_hit")).select(id_col, "fingerprint")
    verified_new = candidates.join(fp_p, "fingerprint", "left_anti").select(id_col, "fingerprint")
    return definitely_new.unionByName(verified_new)


def repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated-span detection at n-gram granularity —
    the boilerplate-removal signal: an n-gram appearing in >= min_docs
    DISTINCT documents marks every position it covers as duplicated
    text (headers, licenses, templated passages). Exact substring dedup
    (suffix-array style) reduces to this at window granularity.

    Returns (doc_id, n_shingles, n_repeated, repeat_ratio) for docs
    with at least one repeated n-gram (inner semantics — fully-unique
    docs don't appear; callers left-join if they want zeros).

    Scale shape: the n-gram expression is evaluated ONCE per document —
    the gram array is materialized (eager local checkpoint) BEFORE
    size/explode touch it. This matters twice over: (1) projecting
    ``size(grams)`` next to ``explode(grams)`` from the raw expression
    re-evaluates the whole (interpreted, non-codegen) n-gram subtree per
    OUTPUT row — measured 25x slower; (2) the df-count and the rollup
    are two branches of one action, which would otherwise re-run the
    shingle subtree per branch. Each position is hashed to a 64-bit
    long immediately (everything downstream — document-frequency count,
    membership join, rollup — needs only shingle equality), so the two
    shuffles carry 8-byte keys instead of n-word strings: ~8x less
    shuffle than shipping the text at corpus scale. The
    ``df >= min_docs`` filter is applied before the membership join, so
    singleton shingles (the vast majority of a real corpus) never enter
    it; at 100 TB the same filter is what a bloom/count-min prefilter
    approximates, and this is its exact form.
    """
    # same builder as the LSH path; empty/whitespace-only docs yield NO
    # shingles (not an empty-string whole-text shingle) — the same rule
    # as remove_repeated_spans, so detect and apply agree on every doc
    words_sh = F.when(
        F.coalesce(F.length(F.trim(F.col(text_col))), F.lit(0)) == 0, F.array().cast("array<string>")
    ).otherwise(word_shingles(F.lower(F.col(text_col)), n))
    grams = (
        _repartition_for_explode(docs, id_col)
        .select(id_col, words_sh.alias("_grams"))
        .localCheckpoint(eager=True)
    )
    sh = grams.select(
        id_col,
        F.size("_grams").alias("n_shingles"),
        F.explode("_grams").alias("shingle"),
    ).select(id_col, "n_shingles", F.xxhash64("shingle").alias("_h"))
    df_counts = (
        sh.groupBy("_h")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_docs)
    )
    return (
        sh.join(df_counts.select("_h"), "_h")
        .groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_repeated"))
        .select(
            id_col,
            "n_shingles",
            "n_repeated",
            F.round(F.col("n_repeated") / F.col("n_shingles"), 4).alias("repeat_ratio"),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The APPLY step for cross-document repeated spans: rewrite every
    document with the words covered by any repeated n-gram cut out —
    the distributed form of exact-substring training-data dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, at word-n-gram granularity; the
    detection side is ``repeated_spans``).

    A gram "repeats" when it occurs in >= ``min_docs`` DISTINCT
    documents (same rule, same lowercased gram space, and same
    short-doc whole-text shingle convention as ``repeated_spans``, so
    detect and apply agree on what is boilerplate — a doc shorter than
    ``n`` words that repeats verbatim elsewhere is removed entirely).

    Returns (id_col, text_col, n_words, n_removed) for EVERY input
    document: ``text_col`` is the rebuilt text — surviving words joined
    by single spaces (whitespace-normalized; word case preserved) —
    ``n_words`` the original whitespace word count, ``n_removed`` how
    many words were cut.

    Scale shape: positional gram hashes are one projection over the
    corpus (the O(log n) doubling n-gram constructor, hashed to 8-byte
    longs before anything shuffles); the persisted gram table feeds
    both the document-frequency aggregate and the membership join, so
    the gram subtree runs once; the ``df >= min_docs`` filter lands
    before the join, so singleton grams — the overwhelming majority —
    never enter it. Two shuffles total (df-count, per-doc start
    collect), both on 8-byte or id keys. The rebuild is row-local
    array math: covered = union of [start, start+n) intervals, kept =
    index filter — O(words x covered) per doc, bounded by n x starts,
    with zero Python in the row path.
    """
    from .text import ngram_array

    # NULL text behaves exactly like empty text (zero grams, empty
    # rebuild) instead of propagating nulls through split/size
    text_nn = F.coalesce(F.col(text_col), F.lit(""))
    words_lc = F.split(F.lower(text_nn), r"\s+")
    n_words = F.size(words_lc)
    # positional grams: entry i (0-based) covers words [i, i+n); docs
    # shorter than n words contribute ONE whole-text gram at start 0
    # (the word_shingles convention, so df counts match repeated_spans)
    full = F.slice(ngram_array(words_lc, n), 1, F.greatest(n_words - F.lit(n - 1), F.lit(0)))
    # an all-whitespace/empty doc yields NO grams (not an empty-string
    # whole-text shingle): otherwise any two empty docs "dedup" each
    # other on every pass and the operator is never a fixed point
    grams = (
        F.when(F.coalesce(F.length(F.trim(F.col(text_col))), F.lit(0)) == 0, F.array().cast("array<string>"))
        .when(n_words >= n, full)
        .otherwise(F.array(F.concat_ws(" ", words_lc)))
    )
    pos_grams = (
        _repartition_for_explode(docs.select(id_col, text_col), id_col)
        .select(id_col, F.posexplode(grams).alias("start", "_g"))
        .select(id_col, "start", F.xxhash64("_g").alias("_h"))
        .persist()  # feeds BOTH the df-count and the membership join
    )
    repeated = (
        pos_grams.groupBy("_h")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("_h")
    )
    # starts is doc-grain (only docs with repeated grams) — materialize
    # it eagerly so the gram table's cache blocks release NOW instead of
    # pinning executor memory for the session (serving/bench loops call
    # this repeatedly; an un-unpersisted gram table per call accumulates)
    starts = (
        pos_grams.join(repeated, "_h")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("_starts"))
        .localCheckpoint(eager=True)
    )
    pos_grams.unpersist()
    words_orig = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")  # same positions: lower() keeps whitespace
    # covered positions need not be deduped: array_except below is
    # hash-based (O(words + covered)) and dedups internally — the old
    # per-index `filter(seq, j -> !array_contains(covered, j))` scan
    # was O(words x covered) per doc (r14, measured ~2x on the rebuild)
    covered = F.flatten(
        F.transform(
            F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
            lambda s: F.sequence(s, F.least(s + F.lit(n - 1), F.size(words_orig) - 1)),
        )
    )
    kept = F.array_except(F.sequence(F.lit(0), F.size(words_orig) - 1), covered)
    # the rebuilt text gets a TEMP name first: aliasing it straight to
    # text_col makes Spark's lateral-column-alias resolution capture the
    # F.col(text_col) references inside the LATER columns' higher-order
    # lambdas against the rebuilt text instead of the input column
    # (observed on 4.1: n_removed silently computed over the cleaned
    # text), so the rename happens in a second projection
    # the rebuild is the most CPU-expensive row-local expression in the
    # operator (interpreted higher-order functions over every word):
    # repartition the docs side FIRST, or the whole rebuild inherits the
    # input's file-split parallelism — a one-file corpus rebuilds on ONE
    # core (measured 2.3x on the sf0.1 single-file parquet)
    return (
        _repartition_for_explode(docs, id_col)
        .join(starts, id_col, "left")
        .select(
            id_col,
            F.size(words_orig).alias("n_words"),
            # |covered distinct| == n_words - |kept| (covered is a
            # subset of [0, n_words) by construction)
            (F.size(words_orig) - F.size(kept)).alias("n_removed"),
            F.concat_ws(
                " ", F.transform(kept, lambda j: F.element_at(words_orig, j + 1))
            ).alias("_clean_text"),
        )
        .select(id_col, F.col("_clean_text").alias(text_col), "n_words", "n_removed")
    )


def paragraph_dedup(
    docs: DataFrame,
    min_len: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_pattern: str = r"\n\s*\n",
    joiner: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-grain exact dedup, keep-first (the CCNet
    preprocessing step — Wenzek et al., "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data", arXiv:1911.00359: web
    text repeats at PARAGRAPH grain — headers, nav, license blocks —
    long before whole documents repeat).

    Paragraphs split on blank-line runs; matching is on the
    whitespace-collapsed lowercase form (layout and case do not make a
    paragraph novel), hashed to a 64-bit key. The FIRST occurrence in
    (doc_id, position) order survives; every later identical paragraph
    is cut. Paragraphs shorter than ``min_len`` characters (normalized)
    are exempt — never counted as duplicates, always kept — so "Yes."
    does not get deduplicated out of a QA corpus.

    Returns (id_col, text_col, n_paragraphs, n_removed) for EVERY
    input document; text is the surviving paragraphs rejoined with
    blank lines, in original order.

    Scale shape: one explode (after the pre-explode repartition), ONE
    shuffle on the uniform 8-byte paragraph hash for the keep-first
    window — the paragraph text rides that shuffle once, which beats a
    second (id, pos) join shuffle of the same payload — and one
    doc-keyed shuffle to rebuild. Keep-first is deterministic under
    any partitioning (row_number over an explicit total order).
    """
    paras = F.filter(
        F.split(F.col(text_col), sep_pattern), lambda p: F.length(F.trim(p)) > 0
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("_para")), r"\s+", " "))
    exploded = (
        _repartition_for_explode(docs.select(id_col, text_col), id_col)
        .select(id_col, F.posexplode(paras).alias("pos", "_para"))
        .withColumn("_n", norm)
        .withColumn(
            "_h",
            # exempt short paragraphs by giving them a per-(doc,pos)
            # unique key: they form singleton groups, always rank 1
            F.when(
                F.length("_n") >= min_len, F.xxhash64("_n")
            ).otherwise(F.xxhash64(F.col(id_col), F.col("pos"), F.lit("short"))),
        )
    )
    # keep-first = the MIN (doc_id, pos) member of each hash group —
    # expressed as a min_by AGGREGATE, not a row_number window: an
    # aggregate gets map-side partial combine, so a paragraph duplicated
    # 100M times ("Thanks!", nav blocks) collapses to one candidate per
    # map task before the shuffle, where a window would pile every copy
    # onto the single reducer owning that hash
    kept = (
        exploded.groupBy("_h")
        .agg(
            F.min_by(
                F.struct(id_col, "pos", "_para"), F.struct(id_col, "pos")
            ).alias("_w")
        )
        .select(
            F.col(f"_w.{id_col}").alias(id_col),
            F.col("_w.pos").alias("pos"),
            F.col("_w._para").alias("_para"),
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_para"))),
                lambda s: s["_para"],
            ),
        ).alias("_clean_text"),
        F.count("*").alias("_n_kept"),
    )
    # n_paragraphs comes from the DOC side (a row-local recount of the
    # same split): a doc whose every paragraph lost keep-first has no
    # kept rows at all, and must still report its full removal count
    return (
        docs.select(id_col, F.size(paras).alias("n_paragraphs"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_clean_text"), F.lit("")).alias(text_col),
            "n_paragraphs",
            (
                F.col("n_paragraphs") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).alias("n_removed"),
        )
    )


def line_dedup(
    docs: DataFrame,
    min_len: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide LINE-grain exact dedup, keep-first — the grain the
    CCNet reference implementation actually hashes (its "paragraphs"
    are newline-delimited spans, arXiv:1911.00359 §3.1): navigation
    items, cookie banners, and footer lines repeat per-LINE across a
    crawl even inside otherwise-unique paragraphs. Identical machinery,
    plan shape, and keep-first contract as ``paragraph_dedup`` (one
    definition — this is that operator parameterized to split on
    single newlines and rejoin with them); ``min_len`` exempts short
    lines the same way. Returns (id_col, text_col, n_lines,
    n_removed)."""
    return (
        paragraph_dedup(
            docs,
            min_len=min_len,
            id_col=id_col,
            text_col=text_col,
            sep_pattern=r"\n",
            joiner="\n",
        )
        .withColumnRenamed("n_paragraphs", "n_lines")
    )


def source_dup_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Per-source duplication profile over exact fingerprints: how
    much of each source is clones, and how big the worst clone family
    is — the triage number that decides which sources are worth the
    expensive near-dup passes (a source that is 40% exact clones gets
    exact-deduped FIRST; minhash over the raw source wastes bands on
    copies). Uses the SAME whitespace-normalized lowercase md5 rule
    as pipeline.text.fingerprints, so this profile predicts exactly
    what fingerprint-keyed dedup will do.

    One corpus scan into a map-side-combined (source, fingerprint)
    count shuffle; everything after is fingerprint-grain then
    source-grain. Returns (source, n_docs, n_distinct, dup_frac,
    max_clone)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fams = (
        docs.select(F.col(by).alias(by), F.md5(norm).alias("fp"))
        .groupBy(by, "fp")
        .agg(F.count("*").alias("n"))
    )
    return (
        fams.groupBy(by)
        .agg(
            F.sum("n").alias("n_docs"),
            F.count("*").alias("n_distinct"),
            F.max("n").alias("max_clone"),
        )
        .select(
            by,
            "n_docs",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct") / F.col("n_docs"), 4).alias("dup_frac"),
            "max_clone",
        )
    )


def cross_source_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
    unit: str = "shingle",
) -> DataFrame:
    """Pairwise cross-source content-overlap matrix: for every
    unordered source pair (a < b), how many distinct content units
    appear in BOTH, and what fraction of each side's distinct content
    that is. This is the between-source complement of
    ``source_dup_profile`` (within-source): a mixture plan that
    weights two sources 30%+30% but where one heavily overlaps the
    other is really sampling the same text twice — the overlap matrix
    is what the epoch planner should see before weights are chosen.

    ``unit`` picks the grain: ``"shingle"`` (default) counts distinct
    word 3-shingles — the same shingling as the near-dup family — and
    measures phrase-level contamination (non-trivial on any real
    corpus); ``"fingerprint"`` counts whole-document fingerprints
    (pipeline.text.fingerprints' whitespace-normalized lowercase md5
    rule) and measures exact clone families spanning sources (often
    sparse — a hit is actionable).

    Plan shape: one corpus scan to distinct (source, unit) — map-side
    combined; shingles hash to 8-byte xxhash64 join keys as in
    jaccard_pairs (counts identical barring a 64-bit collision); the
    pair join is unit-keyed between rows of the SAME unit only, so
    join fan-out is bounded by (sources sharing that unit choose 2) —
    at most #sources^2 per unit, never corpus x corpus; per-source
    distinct totals broadcast onto the pair rows (source-grain
    dimension). Returns (source_a, source_b, shared, frac_a, frac_b).
    """
    if unit == "shingle":
        # keyless pre-explode spread: the downstream distinct hashes
        # (src, shingle), not src, and a by-source repartition would
        # put each source's whole corpus on one partition
        sfp = (
            _repartition_round_robin(docs.select(F.col(by).alias("src"), text_col))
            .select(
                "src",
                F.explode(F.array_distinct(word_shingles(F.col(text_col)))).alias("shingle"),
            )
            .select("src", F.xxhash64("shingle").alias("fp"))
            .distinct()
        )
    elif unit == "fingerprint":
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        sfp = docs.select(F.col(by).alias("src"), F.md5(norm).alias("fp")).distinct()
    else:
        raise ValueError(f"unknown unit: {unit!r} (want 'shingle' or 'fingerprint')")
    sizes = sfp.groupBy("src").agg(F.count("*").alias("n"))
    a = sfp.alias("a")
    b = sfp.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(F.broadcast(sa), F.col("source_a") == F.col("sa.src"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.src"))
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(F.col("shared") / F.col("sa.n"), 4).alias("frac_a"),
            F.round(F.col("shared") / F.col("sb.n"), 4).alias("frac_b"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
    k: int = 3,
) -> DataFrame:
    """Per-source n-gram novelty — the complement of
    ``cross_source_overlap``: of each source's distinct word
    k-shingles, how many appear in NO other source. High novelty =
    unique content worth its mixture weight; novelty near zero = the
    source is re-crawled/syndicated content the overlap matrix will
    attribute pair-by-pair.

    Same shingle rule as the whole d-family (``word_shingles``), with
    join keys hashed to xxhash64 longs (the d04-certified
    substitution: counts equal barring a 64-bit collision). One
    distinct (source, shingle-hash) relation feeds both the per-source
    sizes and the shingle->n_sources rollup — at 100 TB both are
    map-side-combined aggregates on the hash, and the output is
    |sources| rows. Returns (by, n_shingles, n_exclusive,
    novelty_frac rounded 4)."""
    # examined r14: barriering this twice-consumed relation (eager
    # checkpoint, with or without a pre-explode spread) measured ~1 s
    # SLOWER at sf0.1 than the double-computed single-job plan — the
    # explode is cheap and the two consumers pipeline inside one job,
    # while the barrier pays a synchronous materialization. Left as is.
    sfp = (
        docs.select(F.col(by).alias("_src"), word_shingles(F.col(text_col), k).alias("_sh"))
        .select("_src", F.explode("_sh").alias("_s"))
        .select("_src", F.xxhash64("_s").alias("_h"))
        .distinct()
    )
    spread = sfp.groupBy("_h").agg(F.count("*").alias("_n_sources"))
    return (
        sfp.join(spread, "_h")
        .groupBy(F.col("_src").alias(by))
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("_n_sources") == 1).cast("long")).cast("long").alias("n_exclusive"),
            F.round(
                F.sum((F.col("_n_sources") == 1).cast("long")) / F.count("*"), 4
            ).alias("novelty_frac"),
        )
    )


def cluster_size_profile(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup cluster-size histogram — the dedup QA rollup over
    ``neardup_clusters`` labels: for each cluster size, how many
    clusters have it and how many documents they hold. The number a
    corpus build reads to decide whether near-dup structure is a long
    tail of pairs (size 2) or a few giant boilerplate families (size
    10^4) — the two need different handling (canonical-keep vs
    source-level exclusion), and the mean "dup rate" cannot tell them
    apart.

    Composes the certified clustering (same labels q34 certifies),
    then two tiny aggregates: cluster-grain counts, then size-grain
    rollup — nothing document-grain survives the first groupBy.
    Returns (cluster_size, n_clusters, n_docs), ascending sizes
    excluded singletons? No: singletons INCLUDED (cluster_size 1) —
    the histogram must conserve the corpus (sum(n_docs) = |docs|),
    or the QA number silently hides the deduped mass."""
    labels = neardup_clusters(docs, pairs, id_col=id_col)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            (F.count("*") * F.first("cluster_size")).cast("long").alias("n_docs"),
        )
        .select(F.col("cluster_size").cast("long").alias("cluster_size"), "n_clusters", "n_docs")
    )


def minhash_estimate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH with SIGNATURE-AGREEMENT scoring instead of the
    exact shingle-join verify: est_jaccard = (# agreeing signature
    components) / num_hashes — the unbiased MinHash estimator
    (Broder 1997, the same paper the exact containment metric cites).

    This is the 100 TB scoring path when ``minhash_dedup``'s exact
    verify is the bottleneck: the shingle table is touched ONCE (to
    build signatures), then everything — banding, candidate join,
    scoring — runs on the doc-grain signature table (num_hashes
    md5 strings per doc, ~KB/row vs the shingle table's full text
    mass). The estimator's error is the binomial sqrt(j(1-j)/h), so
    at the default 8 hashes it is a coarse screen; raise num_hashes
    for tighter estimates — cost grows linearly in signature width,
    never in shingle volume. Deterministic (md5 minhash), so the SQL
    oracle replays the estimate exactly, not just in expectation.

    Returns (doc_a, doc_b, est_jaccard) for LSH candidate pairs with
    est_jaccard >= threshold."""
    sh = shingle_table(docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, num_hashes, id_col).localCheckpoint(eager=True)
    free_local_checkpoint(sh)  # the estimate path never re-reads shingles
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col)
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree = sum(
        (F.col(f"a.sig_{j}") == F.col(f"b.sig_{j}")).cast("int")
        for j in range(num_hashes)
    )
    return (
        cands.join(a, F.col("doc_a") == F.col(f"a.{id_col}"))
        .join(b, F.col("doc_b") == F.col(f"b.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(num_hashes), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_estimate_vs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Certification surface for ``minhash_estimate_pairs``: every LSH
    candidate pair carries BOTH the signature-agreement estimate and
    the exact verified Jaccard, plus their absolute error — the
    evidence that the estimate-only serving path is safe at the
    configured signature width (the q74/q60 pattern: the sketch's
    quality claim rides the certified surface). Deterministic end to
    end (md5 minhash), so a SQL oracle replays every column exactly.

    This pays the exact inverted-index verify by construction — run it
    at certification scale (a corpus sample), not on the serving path;
    the serving path is ``minhash_estimate_pairs``. Returns (doc_a,
    doc_b, jaccard, est_jaccard, abs_err) for verified pairs with
    jaccard >= threshold. The result (pair-grain, tiny next to the
    corpus) is materialized eagerly so the corpus-sized shingle
    checkpoint — which BOTH the exact verify and the signatures read —
    can be freed before returning, instead of staying pinned in the
    block manager for the returned DataFrame's lifetime."""
    sh = shingle_table(docs, id_col, text_col, k).localCheckpoint(eager=True)
    # barrier sigs and cands (r14, guide §5 reuse — the
    # minhash_estimate_pairs discipline): sigs feeds THREE consumers
    # (the LSH banding plus both sides of the estimate join) and cands
    # TWO (the exact verify and the estimate join); unbarriered, each
    # consumer re-ran the 8-aggregate signature groupBy / the banded
    # self-join from scratch. Both are doc-grain-thin relations.
    sigs = minhash_signatures(sh, num_hashes, id_col).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col).localCheckpoint(
        eager=True
    )
    exact = jaccard_pairs(sh, cands, threshold, id_col)
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree = sum(
        (F.col(f"a.sig_{j}") == F.col(f"b.sig_{j}")).cast("int")
        for j in range(num_hashes)
    )
    est = (
        cands.join(a, F.col("doc_a") == F.col(f"a.{id_col}"))
        .join(b, F.col("doc_b") == F.col(f"b.{id_col}"))
        .select(
            "doc_a", "doc_b",
            F.round(agree / F.lit(num_hashes), 4).alias("est_jaccard"),
        )
    )
    out = (
        exact.join(est, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "est_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 4).alias("abs_err"),
        )
        .localCheckpoint(eager=True)
    )
    free_local_checkpoint(sh)
    free_local_checkpoint(sigs)
    free_local_checkpoint(cands)
    return out


def quality_canonical_dedup(
    docs: DataFrame,
    scores: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup dedup with QUALITY-AWARE canonical selection: the kept
    member of each near-dup cluster is the highest-``quality_score``
    doc (tie -> lowest id), not the lowest id. Lowest-id keep
    (``apply_neardup_dedup``) is arbitrary when a clone family spans a
    clean original and a boilerplate-wrapped mirror — a training
    corpus wants the clean one, and which copy crawled first is
    noise. Standard practice in LLM dedup pipelines (near-dup cluster
    + best-member selection).

    ``scores`` defaults to ``text.quality_scores`` (the t02-certified
    composite); pass any (id, quality_score) table to rank by another
    signal (an LM perplexity, a classifier). A caller-supplied table
    that misses some ids does NOT drop those docs: the join is a LEFT
    join and unscored docs rank last (nulls-last), so the every-input-
    doc contract holds and an unscored doc never beats a scored one.
    Cluster machinery is the certified q34 chain; the extra cost over
    lowest-id keep is one doc-grain score computation and a
    cluster-grain window. Returns (doc_id, cluster_id, quality_score,
    keep) for EVERY input doc."""
    from .text import quality_scores

    if scores is None:
        scores = quality_scores(docs, id_col, text_col).select(
            id_col, "quality_score"
        )
    pairs = minhash_dedup(docs, id_col, text_col)
    clusters = neardup_clusters(docs, pairs, id_col=id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc_nulls_last(), F.col(id_col)
    )
    return (
        clusters.join(scores, id_col, "left")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select(id_col, "cluster_id", "quality_score", "keep")
    )


def lsh_parameter_table(
    spark, num_hashes: int = 8, s_denominator: int = 16
) -> DataFrame:
    """The LSH S-curve P(candidate | s) = 1 - (1 - s^rows)^bands for
    EVERY (bands, rows) split of the signature, tabulated on the exact
    dyadic lattice s = k/s_denominator — the inspectable form of the
    grid ``tune_lsh_params`` optimizes over, as a driver-checkable
    table (the knob-planning surface behind d02's defaults; SCALE.md's
    round-5 recall notes reason from exactly these curves).

    Exactness across engines: with s_denominator a power of two and
    bands * rows == num_hashes, every probability is the dyadic
    rational (D^b - (D - k^r)^b) / s_den^num_hashes with D = s_den^r —
    all numerators fit a double exactly (k^r <= 15^8 < 2^53), so both
    engines compute the identical double and the rounded column is
    bit-equal, no libm pow discrepancies.

    Output: (bands, rows_per_band, s_16ths, p_candidate) — one row per
    split x lattice point; dimension-grain (divisors(num_hashes) x
    (s_denominator - 1) rows)."""
    splits = [
        (num_hashes // r, r)
        for r in range(1, num_hashes + 1)
        if num_hashes % r == 0
    ]
    grid = spark.createDataFrame(splits, "bands int, rows_per_band int")
    s = spark.range(1, s_denominator).select(F.col("id").cast("int").alias("s_16ths"))
    denom = float(s_denominator**num_hashes)
    x = F.pow(F.col("s_16ths").cast("double"), F.col("rows_per_band"))
    big_d = F.pow(F.lit(float(s_denominator)), F.col("rows_per_band"))
    miss = F.pow(big_d - x, F.col("bands"))  # (D - k^r)^b, exact integer-valued
    p = (F.lit(denom) - miss) / F.lit(denom)
    return grid.crossJoin(s).select(
        "bands",
        "rows_per_band",
        "s_16ths",
        F.round(p, 6).alias("p_candidate"),
    )


def source_dup_rate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source near-dup mass: how much of each source survives the
    certified q34/q48 dedup (cluster by minhash+LSH, keep the lowest
    id per cluster). The mixture-QA counterpart of q72's gate drift —
    q72 says which sources the QUALITY gate decimates, this says which
    sources are mostly COPIES (a crawl that re-serves another source's
    content shows a high dup_rate here and a high overlap row in d13;
    together they localize where dedup spend goes). Reference analog:
    per-source coverage summaries (`report_coverage`,
    DataCatalogController.py) — asset-population accounting at source
    grain.

    The cluster chain is the certified q34 derivation; this adds one
    doc-grain join to sources and a dimension-grain rollup. Returns
    (source, n_docs, n_kept, n_dropped, dup_rate) with dup_rate =
    n_dropped / n_docs rounded to 4."""
    pairs = minhash_dedup(docs, id_col, text_col)
    clusters = neardup_clusters(docs, pairs, id_col=id_col)
    w = Window.partitionBy("cluster_id").orderBy(id_col)
    kept = clusters.withColumn("_keep", F.row_number().over(w) == 1).select(
        id_col, "_keep"
    )
    per = (
        docs.select(id_col, source_col)
        .join(kept, id_col)
        .groupBy(source_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        )
    )
    return per.select(
        F.col(source_col).alias("source"),
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_dropped"),
        F.round((F.col("n_docs") - F.col("n_kept")) / F.col("n_docs"), 4).alias(
            "dup_rate"
        ),
    )


def incremental_neardup_pairs(
    delta_docs: DataFrame,
    resident_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    resident_sigs: DataFrame | None = None,
) -> DataFrame:
    """Daily-batch near-dup against a resident corpus at SIGNATURE
    grain — the d15 estimator composed with the q51/q80 delta
    discipline. Signatures for both sides, d02's banding, but
    candidate pairs are RESTRICTED to those touching the delta: the
    bucket join is delta-side x both-sides, so the resident x resident
    quadrant — which dominates the full self-join quadratically and
    was already adjudicated when the resident corpus was deduped — is
    never generated. Scoring is signature agreement
    (``minhash_estimate_pairs``' Broder rule): the resident TEXT is
    never re-read, only its num_hashes md5 strings per doc.

    At 100 TB the resident signature table is a persisted artifact
    maintained alongside the corpus (exactly like the IVF index's
    centroids); pass it as ``resident_sigs`` (doc_id, sig_0..sig_n-1)
    and the daily cost is shingling the DELTA plus a
    signature-grain join — independent of resident text volume. When
    omitted (certification scale), resident signatures are computed
    from ``resident_docs``. Ids must be unique across both sides (the
    q51 delta contract: a re-crawled identical doc is removed by
    fingerprint before this runs).

    The banding expressions repeat ``lsh_candidate_pairs``' rule
    verbatim INLINE: that certified d02 path self-joins one table and
    cannot express the delta-restricted join without a refactor this
    deliberately avoids (its bytes stay untouched). Returns (doc_a,
    doc_b, est_jaccard, is_cross) where is_cross = exactly one side is
    resident — cross pairs mean "today's crawl duplicates the archive",
    delta-internal pairs mean "today's crawl duplicates itself"."""
    sh_d = shingle_table(delta_docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs_d = minhash_signatures(sh_d, num_hashes, id_col).localCheckpoint(eager=True)
    free_local_checkpoint(sh_d)
    if resident_sigs is None:
        sh_r = shingle_table(resident_docs, id_col, text_col, k).localCheckpoint(
            eager=True
        )
        resident_sigs = minhash_signatures(sh_r, num_hashes, id_col).localCheckpoint(
            eager=True
        )
        free_local_checkpoint(sh_r)
    all_sigs = sigs_d.withColumn("_delta", F.lit(True)).unionByName(
        resident_sigs.withColumn("_delta", F.lit(False))
    )

    rows_per_band = num_hashes // bands

    def _buckets(sigs: DataFrame) -> DataFrame:
        band_cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
        return sigs.select(
            F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
        ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    bd = _buckets(sigs_d).alias("a")
    ba = _buckets(all_sigs).alias("b")
    cands = (
        bd.join(
            ba,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )
    sa = all_sigs.alias("sa")
    sb = all_sigs.alias("sb")
    agree = sum(
        (F.col(f"sa.sig_{j}") == F.col(f"sb.sig_{j}")).cast("int")
        for j in range(num_hashes)
    )
    return (
        cands.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(num_hashes), 4).alias("est_jaccard"),
            (F.col("sa._delta") != F.col("sb._delta")).alias("is_cross"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def shingle_df_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Document-frequency histogram of the shingle vocabulary on
    power-of-two buckets — the evidence surface behind the ``max_df``
    stop-shingle cap: the inverted-index join's cost is sum(df^2) over
    shingles, so the histogram's high buckets ARE the join's hot keys,
    and ``n_rows`` per bucket is exactly the join-side mass a given
    cap would drop. Run it before picking max_df on a new corpus; the
    r8/r11 stress rungs picked 1000 from exactly this shape.

    Bucket arithmetic is integer-exact in any engine:
    bucket = length(bin(df)) - 1 == floor(log2(df)) with no libm log
    (floor(log2(8)) through doubles can land on 2). rows_share divides
    two exact integers. Returns (df_bucket, n_shingles, n_rows,
    rows_share) — one row per occupied power-of-two bucket."""
    sh_h = shingle_table(docs, id_col, text_col, k).select(
        F.xxhash64("shingle").alias("_h")
    )
    df_tbl = sh_h.groupBy("_h").agg(F.count("*").alias("df"))
    bucket = (F.length(F.bin(F.col("df"))) - 1).cast("int")
    per = df_tbl.groupBy(bucket.alias("df_bucket")).agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum("df").cast("long").alias("n_rows"),
    )
    from pyspark.sql.window import Window

    total = F.sum("n_rows").over(Window.partitionBy())
    return per.select(
        "df_bucket",
        "n_shingles",
        "n_rows",
        F.round(F.col("n_rows") / total, 6).alias("rows_share"),
    )


def neardup_clusters_star(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the O(log n)-round scale path for the one
    graph shape ``neardup_clusters``' min-label propagation handles
    badly: LONG CHAINS. Min-label converges in O(component diameter)
    rounds (a paragraph-overlap chain of 10k docs = 10k shuffle
    rounds, i.e. never); star contraction halves every path each
    round-pair, so the same chain closes in ~log2(10k) ≈ 14. Output is
    IDENTICAL to ``neardup_clusters`` (cluster_id = smallest reachable
    doc id, singletons label themselves — asserted in tests), so the
    two are drop-in interchangeable and one oracle serves both.

    Per round: large-star attaches every neighbor v > u to m(u) =
    min(N(u) ∪ {u}); small-star (on high→low directed edges) attaches
    every smaller neighbor to m(u). Both are one groupBy-join each on
    the EDGE list (never corpus-grain), monotone toward the star
    forest fixed point where every non-root points directly at its
    component minimum. Each round eagerly checkpoints the edge list
    (keeps lineage flat, frees the previous round's blocks) and
    convergence is an edge-set equality check (two limit-1 anti-join
    probes, edge-grain). Raises past ``max_rounds`` like its sibling —
    at the proven O(log² n) worst case, 30 rounds covers any
    realistic corpus."""
    from datacatalog_tag_engine_spark.session import free_local_checkpoint

    e = (
        pairs.selectExpr("doc_a as u", "doc_b as v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.unionByName(edges.selectExpr("v as u", "u as v"))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        m = F.least(F.col("_mv"), F.col("u"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        # direct every edge high -> low, then hang each node's smaller
        # neighborhood (plus itself) off its minimum
        hi_lo = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = hi_lo.groupBy("u").agg(F.min("v").alias("_mv"))
        withm = hi_lo.join(mins, "u")
        to_m = withm.select(F.col("v").alias("u"), F.col("_mv").alias("v"))
        self_m = mins.select("u", F.col("_mv").alias("v"))
        return (
            to_m.unionByName(self_m)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    converged = False
    for _ in range(max_rounds):
        nxt = small_star(large_star(e)).localCheckpoint(eager=True)
        # ONE symmetric-difference probe job per round instead of two
        # exceptAll counts (both sides are distinct edge SETS, so a
        # full-outer join with presence markers finds any one-sided
        # edge in a single shuffle) — halves the per-round convergence
        # overhead of the O(log n) loop; decision is value-identical
        same = (
            nxt.select("u", "v", F.lit(1).alias("_l"))
            .join(
                e.select("u", "v", F.lit(1).alias("_r")), ["u", "v"], "full_outer"
            )
            .filter(F.col("_l").isNull() | F.col("_r").isNull())
            .limit(1)
            .count()
            == 0
        )
        free_local_checkpoint(e)
        e = nxt
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star contraction did not reach its fixed point within "
            f"{max_rounds} rounds — raise max_rounds (cost is "
            f"O(log^2 n) rounds, each edge-grain)"
        )
    # fixed point is a star forest directed high -> low: every
    # non-root points at its component min; roots and singletons
    # label themselves
    labels = docs.select(F.col(id_col)).join(
        e.selectExpr(f"u as {id_col}", "v as _root"), id_col, "left"
    )
    # the returned frame READS the final checkpoint (freeing it here
    # would lose the star forest's only copy) — it is edge-grain (one
    # row per non-root node) and releases with the DataFrame
    return labels.select(
        id_col, F.coalesce(F.col("_root"), F.col(id_col)).alias("cluster_id")
    )


SIGSTORE_META_DIR = "_sigstore_meta"


def build_signature_store(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
) -> int:
    """Persist the resident corpus's minhash signatures as a
    maintained ARTIFACT — the dedup family's counterpart of
    ``build_ivf_index``: build once from the deduped archive, append
    each day's accepted delta, and every future
    ``incremental_neardup_from_store`` call joins the delta against
    signatures instead of re-shingling resident TEXT (the d19 cost
    model made durable). Layout: (doc_id, sig_0..sig_{n-1}) parquet at
    ``path`` plus a one-row ``_sigstore_meta`` table pinning
    (k, num_hashes) — signatures from different shingle/hash
    parameters are incomparable, so the store records its space and
    every writer/reader validates against it rather than trusting
    call-site defaults. Returns the stored row count."""
    sh = shingle_table(docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, num_hashes, id_col)
    sigs.write.mode("error").parquet(path)
    free_local_checkpoint(sh)
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(k), int(num_hashes), id_col)], "k int, num_hashes int, id_col string"
    ).coalesce(1).write.mode("error").parquet(f"{path}/{SIGSTORE_META_DIR}")
    return spark.read.parquet(path).count()


def _sigstore_meta(spark, path: str) -> dict:
    # A build that crashed between the data write and the meta write
    # leaves signatures whose data reads fine but whose meta dir is
    # missing; surface that as a clear rebuild instruction instead of a
    # raw parquet path-not-found (r11 review finding).
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(f"{path}/{SIGSTORE_META_DIR}").collect()[0]
    except AnalysisException as exc:
        # ONLY the missing-table shape gets the rebuild advice — a
        # transient I/O or permission failure on a healthy store must
        # not be rewritten into "delete and rebuild" (review finding);
        # anything else propagates untouched.
        raise ValueError(
            f"signature store at {path!r} has no {SIGSTORE_META_DIR} table — "
            "torn build_signature_store (crashed before the meta write) or "
            "not a signature store; remove the directory and rebuild it"
        ) from exc
    return {"k": row["k"], "num_hashes": row["num_hashes"], "id_col": row["id_col"]}


def append_to_signature_store(
    spark,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    skip_existing: bool = True,
) -> int:
    """Append the accepted delta's signatures to the store —
    append-only files, like ``append_to_ivf_index``: existing files
    never move, concurrent readers see either the old or the new
    listing, both valid signature sets. Shingle/hash parameters come
    from the store's meta (never the call site), so an append can
    never silently mix signature spaces. The q51 delta contract
    applies: ids should be new (re-crawled identical docs are removed
    by fingerprint before acceptance).

    ``skip_existing`` (default on) anti-joins the delta against the
    store's resident ids first — an id-grain scan of the store, paid
    so a RETRIED append (the crash-after-partial-write recovery path:
    parquet appends are atomic per file, not per job, so a torn
    append leaves some delta files present) is idempotent instead of
    planting duplicate signatures that would emit duplicate candidate
    pairs downstream. Turn it off only when the caller already proved
    id-novelty. Returns rows appended (after the skip).

    Single-writer assumption: like ``append_to_ivf_index``, the store
    admits ONE writer at a time (concurrent READERS are always safe —
    existing files never move). The appended signatures are
    checkpointed before counting, so the returned count and the
    written rows come from one materialization of the anti-join — the
    resident-id set is read exactly once per call, not once for the
    count and again for the write."""
    meta = _sigstore_meta(spark, path)
    delta = delta_docs
    if skip_existing:
        resident_ids = spark.read.parquet(path).select(meta["id_col"])
        delta = delta_docs.join(resident_ids, meta["id_col"], "left_anti")
    sh = shingle_table(
        delta, meta["id_col"], text_col, meta["k"]
    ).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, meta["num_hashes"], meta["id_col"]).localCheckpoint(
        eager=True
    )
    free_local_checkpoint(sh)
    n = sigs.count()
    if n:
        sigs.write.mode("append").parquet(path)
    free_local_checkpoint(sigs)
    return n


def incremental_neardup_from_store(
    spark,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """``incremental_neardup_pairs`` against a persisted signature
    store: the daily-dedup call whose cost is shingling the DELTA plus
    a signature-grain join — resident text volume never appears in the
    plan. k/num_hashes come from the store's meta; on a store that was
    built from the resident corpus and appended per-delta, output is
    identical to computing resident signatures fresh (asserted in
    tests — the s31 identity discipline applied to the dedup
    artifact)."""
    meta = _sigstore_meta(spark, path)
    resident_sigs = spark.read.parquet(path)
    return incremental_neardup_pairs(
        delta_docs,
        resident_docs=None,
        id_col=meta["id_col"],
        text_col=text_col,
        k=meta["k"],
        num_hashes=meta["num_hashes"],
        bands=bands,
        threshold=threshold,
        resident_sigs=resident_sigs,
    )


def candidate_threshold_sweep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The dedup-threshold DECISION TABLE: every LSH candidate pair
    scored by the signature-agreement estimator (the d15 surface at
    threshold 0 — all candidates, no floor), rolled up per estimate
    value on the exact i/num_hashes lattice, with the cumulative pair
    count a threshold at each lattice edge would KEEP. The d20
    histogram prices the shingle cap; this prices the THRESHOLD — the
    two tables together are the evidence behind every near-dup
    parameter choice, replacing folklore defaults with counted mass.

    Estimates are exact dyadic rationals (agreeing-components /
    num_hashes), so the lattice rollup is integer-exact in both
    engines. Candidate-grain input (LSH-bucketed, never all-pairs),
    dimension-grain output (<= num_hashes + 1 rows). Returns
    (est_jaccard, n_pairs, frac_pairs, cum_pairs_at_or_above)."""
    pairs = minhash_estimate_pairs(
        docs, id_col, text_col, k, num_hashes, bands, threshold=0.0
    )
    per = pairs.groupBy("est_jaccard").agg(F.count("*").cast("long").alias("n_pairs"))
    w_all = Window.partitionBy()
    w_desc = (
        Window.partitionBy()
        .orderBy(F.desc("est_jaccard"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "est_jaccard",
        "n_pairs",
        F.round(F.col("n_pairs") / F.sum("n_pairs").over(w_all), 6).alias("frac_pairs"),
        F.sum("n_pairs").over(w_desc).cast("long").alias("cum_pairs_at_or_above"),
    )


def winnowing_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    min_shared: int = 2,
    min_overlap: float | None = None,
    with_sizes: bool = False,
) -> DataFrame:
    """Cross-document copy detection over winnowing fingerprints — the
    consumer of ``text.winnowing_fingerprints`` (MOSS, SIGMOD'03): two
    documents sharing ANY substring of length >= w + k - 1 share a
    fingerprint by the winnowing guarantee, so the fingerprint
    bucket-join finds contained copies of bounded length that
    whole-document minhash (needs high global Jaccard) and shingle
    containment (pays a far denser join — every shingle is a row;
    winnowing keeps ~2/(w+1) of them) both price badly.

    Same scale discipline as the shingle containment path: distinct
    (doc, fp) rows, the HOT fingerprint set (df > ``max_df`` —
    boilerplate headers/footers) removed via the bounded broadcast
    anti-join (never the rare-side semi-join — the rare set is
    vocabulary-grain), then a fingerprint-bucketed self-join counted
    at pair grain. ``overlap`` is containment-style: shared
    fingerprints over the SMALLER document's fingerprint count, so a
    short doc pasted into a long one still scores ~1.0. Both the
    numerator and the denominator count SURVIVING fingerprints (after
    the hot-set removal) — one fingerprint universe, so a
    boilerplate-heavy contained copy still scores ~1.0 on its genuine
    shared content instead of being silently diluted by capped
    fingerprints that could never appear in ``n_shared`` (review
    finding). Candidates come only from shared fingerprints — never
    all-pairs.

    Join cost is bounded by construction the same way the shingle
    containment path's is: the cap limits per-fingerprint fan-out, so
    candidate pairs <= fp_rows x max_df regardless of corpus size.
    Natural-language corpora share many k-char grams incidentally, so
    the pair SURFACE is dense at low evidence — ``min_shared`` (and
    ``min_overlap``, the containment-style floor vs the smaller doc)
    are the output-grain screens; tune them per task (copy audit wants
    min_overlap >= 0.5, contamination sweeps run loose).

    Returns (doc_a, doc_b, n_shared, overlap) with doc_a < doc_b,
    filtered to ``n_shared >= min_shared`` (a single shared hash is
    noise at 32-bit fingerprint width) and, when ``min_overlap`` is
    set, ``overlap >= min_overlap``. ``with_sizes=True`` appends each
    side's surviving-fingerprint count (n_a, n_b) — the evidence
    ``winnowing_dedup``'s smaller-doc rule reads, exposed so the
    consumer never recomputes the fingerprint table."""
    from .text import winnowing_fingerprints

    fps = (
        winnowing_fingerprints(docs, id_col, text_col)
        .select(id_col, "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    join_side = fps
    if max_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        join_side = fps.join(F.broadcast(hot), "fp", "left_anti")
    # EXPLICIT fp repartition at cluster width before the pair join:
    # the join's INPUT is thin (16-byte rows) but its OUTPUT fans out
    # ~100x (candidate pairs), and AQE coalesces the fp exchange on
    # input bytes — at sf0.1 that left the 72M-pair join + partial
    # count running 11-wide on 32 cores (measured: tail 18.9 -> 12.1s
    # at width 32). An explicit keyed repartition is exempt from AQE
    # coalescing; both self-join sides inherit it, so the join adds no
    # further exchange. Width rides spark.sql.shuffle.partitions — the
    # session's cluster-scale knob, not a local constant.
    width = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    join_side = join_side.repartition(width, "fp")
    # sizes AFTER the hot-set removal: n_shared counts surviving
    # fingerprints only, so the denominator must too (same universe)
    sizes = join_side.groupBy(id_col).agg(F.count("*").alias("n"))
    a = join_side.select(F.col(id_col).alias("doc_a"), "fp")
    b = join_side.select(F.col(id_col).alias("doc_b"), "fp")
    # EXPLICIT pair-key repartition between the join and the count
    # (r14, probed): candidate-pair keys are nearly unique per map
    # partition (incidences of one (a, b) pair live under different
    # fps), so the default map-side partial aggregate reduced almost
    # nothing yet paid a full hash-map/spill-sort pass over all
    # incidences before the exchange. Clustering the exchange on the
    # pair key first makes the (still partial+final) aggregate run
    # fused after the shuffle where every key's rows are co-located —
    # one effective reduction pass. Probe at sf0.1 (72M incidences):
    # 9.5 -> 3.7 s; the exchange carries the same thin rows either way.
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .repartition(width, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("_nb"))
    # the returned plan reads the fps checkpoint (sizes + both join
    # sides), so it must NOT be freed here — like the containment
    # path's sh_h, its blocks release when the caller drops the frame
    cols = [
        F.col("doc_a"),
        F.col("doc_b"),
        F.col("n_shared"),
        F.round(F.col("n_shared") / F.least("_na", "_nb"), 4).alias("overlap"),
    ]
    if with_sizes:
        cols += [F.col("_na").alias("n_a"), F.col("_nb").alias("n_b")]
    out = shared.join(sa, "doc_a").join(sb, "doc_b").select(*cols)
    if min_overlap is not None:
        out = out.filter(F.col("overlap") >= min_overlap)
    return out


def cluster_purity(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-cluster provenance purity of a near-dup clustering — the QA
    surface for CROSS-SOURCE duplication: a cluster mixing sources is
    a mirror/scrape relationship (one canonical will erase the other
    source's copy — often the intent, sometimes a licensing problem),
    while pure clusters are in-source boilerplate. q88 aggregates the
    drop per source; this keeps cluster grain so the mixed clusters
    are enumerable and auditable.

    One join at doc grain, then cluster-grain aggregation; the
    majority source resolves with a deterministic (count desc, source
    asc) window at (cluster, source) grain — dimension-sized relative
    to the corpus. Returns (cluster_id, n_docs, n_sources,
    majority_source, majority_share)."""
    j = clusters.select(id_col, "cluster_id").join(
        docs.select(id_col, group_col), id_col
    )
    per = j.groupBy("cluster_id", group_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_n"), F.asc(group_col)
    )
    ranked = per.withColumn("_rn", F.row_number().over(w))
    totals = per.groupBy("cluster_id").agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sources"),
    )
    top = ranked.filter(F.col("_rn") == 1).select(
        "cluster_id",
        F.col(group_col).alias("majority_source"),
        F.col("_n").alias("_top_n"),
    )
    return totals.join(top, "cluster_id").select(
        "cluster_id",
        "n_docs",
        "n_sources",
        "majority_source",
        F.round(F.col("_top_n") / F.col("n_docs"), 4).alias("majority_share"),
    )


def winnowing_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    min_shared: int = 2,
    min_overlap: float = 0.8,
) -> DataFrame:
    """Contained-copy removal driven by winnowing overlap — the
    consumer that turns d25's pair surface into a corpus decision:
    for every pair whose containment-style overlap clears
    ``min_overlap``, the SMALLER side (fewer surviving fingerprints;
    tie -> larger id) is dropped — the contained copy goes, the
    containing original stays. This is the substring-grain complement
    of ``quality_canonical_dedup``: minhash clusters need high WHOLE-
    document similarity, while a short doc pasted into a long one
    near-dups nothing globally yet is pure redundancy; winnowing's
    guarantee (any shared run >= w + k - 1 chars shares a fingerprint)
    makes exactly that pair visible, and this rule deletes the copy.

    Drops are independent PAIR decisions, deliberately not a cluster
    canonical: containment is not symmetric (A⊂B, B⊂C does not relate
    A and C textually the way a near-dup clique does), so a doc drops
    iff SOME qualifying pair ranks it smaller — chains resolve to
    "everything contained in anything goes, the maximal docs stay".
    Cost is d25's bucketed pair join (bounded by the hot-set cap)
    plus one pair-grain aggregation — the corpus is never re-scanned.
    Returns (doc_id, keep, n_containers) for EVERY input doc, where
    n_containers counts qualifying pairs that rank the doc smaller."""
    pairs = winnowing_overlap_pairs(
        docs,
        id_col,
        text_col,
        max_df=max_df,
        min_shared=min_shared,
        min_overlap=min_overlap,
        with_sizes=True,
    )
    # the dropped side of each qualifying pair: smaller fingerprint
    # count, tie -> larger id (keep the lowest id, the q34 convention).
    # winnowing_overlap_pairs guarantees doc_a < doc_b, so the
    # otherwise-branch dropping doc_b IS the tie rule — no explicit
    # equal-count arm needed
    dropped = pairs.select(
        F.when(F.col("n_a") < F.col("n_b"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias(id_col)
    )
    counts = dropped.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_containers")
    )
    return docs.select(id_col).join(counts, id_col, "left").select(
        id_col,
        F.col("n_containers").isNull().alias("keep"),
        F.coalesce(F.col("n_containers"), F.lit(0).cast("long")).alias(
            "n_containers"
        ),
    )


def winnowing_contamination(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    min_shared: int = 2,
) -> DataFrame:
    """Train/test contamination at SUBSTRING grain — the winnowing
    form of t24's n-gram decontamination: a train doc is flagged when
    it shares >= ``min_shared`` winnowing fingerprints with any test
    doc, which by the winnowing guarantee catches any verbatim run of
    w + k - 1 characters (a leaked benchmark answer inside an
    otherwise-novel page), where whole-document similarity and even
    fixed-n-gram containment can dilute below threshold. The join is
    fingerprint-bucketed train x test (never within-split pairs — the
    quadrant that dominates d25 is skipped entirely), with the same
    bounded hot-fingerprint cap computed over BOTH splits (boilerplate
    shared by every page must not read as contamination).

    Returns one row per CONTAMINATED train doc: (doc_id, n_test_docs,
    n_shared_max, n_shared_total) — n_test_docs counts distinct test
    docs hit, n_shared_max the strongest single-doc evidence. Clean
    train docs are absent (the caller anti-joins to drop, the t24
    convention). At 100 TB the test side is tiny (benchmarks), so the
    per-fingerprint fan-out is test-bounded; the cap keeps the train
    side's hot keys out of the join either way."""
    from .text import winnowing_fingerprints

    # d25's barrier discipline: each side's fingerprint stream is
    # consumed TWICE in one plan (the hot-set union AND the pair
    # join), and the distinct exchanges feeding those consumers are
    # not identical subtrees, so ReuseExchange cannot dedup them —
    # plan-audited (r14): 12 parquet scans / 4 Generate fingerprint
    # runs without the barrier. Fingerprinting is the expensive HOF
    # scan; materialize it once per side (measured r14: d28 11.7 ->
    # ~6s at sf0.1). At 100 TB the fingerprint table is its own
    # parquet artifact (build_winnowing_store); localCheckpoint is
    # the single-session analog.
    tr = (
        winnowing_fingerprints(train, id_col, text_col)
        .select(id_col, "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    te = (
        winnowing_fingerprints(test, id_col, text_col)
        .select(id_col, "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    if max_df is not None:
        both = tr.select("fp").unionAll(te.select("fp"))
        hot = (
            both.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        tr = tr.join(F.broadcast(hot), "fp", "left_anti")
        te = te.join(F.broadcast(hot), "fp", "left_anti")
    # same exploding-join width fix as winnowing_overlap_pairs: the fp
    # join's output fans out far beyond its thin input, so pin the
    # exchange at cluster width instead of letting AQE coalesce it on
    # input bytes
    width = int(train.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    tr = tr.repartition(width, "fp")
    te = te.repartition(width, "fp")
    # pair-key repartition before the count — the d25 partial-agg fix
    # (pair keys nearly unique per map partition; see
    # winnowing_overlap_pairs)
    hits = (
        tr.select(F.col(id_col).alias("train_id"), "fp")
        .join(te.select(F.col(id_col).alias("test_id"), "fp"), "fp")
        .repartition(width, "train_id", "test_id")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return hits.groupBy("train_id").agg(
        F.countDistinct("test_id").cast("long").alias("n_test_docs"),
        F.max("n_shared").alias("n_shared_max"),
        F.sum("n_shared").alias("n_shared_total"),
    ).select(
        F.col("train_id").alias(id_col),
        "n_test_docs",
        "n_shared_max",
        "n_shared_total",
    )


def threshold_sweep_vs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    dedup_threshold: float = 0.5,
) -> DataFrame:
    """The d24 decision table joined against GROUND TRUTH — d16's
    estimate-vs-exact discipline applied at lattice grain instead of
    pair grain: every LSH candidate carries both its signature
    estimate and its exact verified Jaccard, rolled up per estimate
    value with the precision evidence a threshold choice actually
    needs. d24 says how much pair mass each threshold keeps; this says
    how much of that mass is REAL (exact >= ``dedup_threshold``), so
    the operator answers "estimate >= 0.625 keeps 1,204 pairs at 0.91
    precision" with counted mass on both axes.

    Pays the exact inverted-index verify by construction — a
    certification-scale table (run on a corpus sample), not a serving
    path; the serving path stays ``minhash_estimate_pairs``.
    Dimension-grain output (<= num_hashes + 1 rows). Returns
    (est_jaccard, n_pairs, mean_exact_micro, mean_abs_err_micro,
    n_true, dedup_precision): the exact-Jaccard means ride the 1e4
    micro lattice (d16's per-pair values are round-4, so micro units
    are exact integers and the mean is a rounded exact-integer
    division — engine-identical, the s28 drift_micro discipline);
    n_true counts pairs with exact jaccard >= ``dedup_threshold``."""
    pairs = minhash_estimate_vs_exact(
        docs, id_col, text_col, k, num_hashes, bands, threshold=0.0
    )
    return (
        pairs.groupBy("est_jaccard")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.round(F.col("jaccard") * 10000).cast("long")) / F.count("*")
            )
            .cast("long")
            .alias("mean_exact_micro"),
            F.round(
                F.sum(F.round(F.col("abs_err") * 10000).cast("long")) / F.count("*")
            )
            .cast("long")
            .alias("mean_abs_err_micro"),
            F.sum((F.col("jaccard") >= dedup_threshold).cast("long")).alias(
                "n_true"
            ),
        )
        .select(
            "est_jaccard",
            "n_pairs",
            "mean_exact_micro",
            "mean_abs_err_micro",
            "n_true",
            F.round(F.col("n_true") / F.col("n_pairs"), 4).alias("dedup_precision"),
        )
    )


def copy_audit_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    max_df: int | None = 1000,
    min_shared: int = 2,
    min_overlap: float = 0.8,
) -> DataFrame:
    """Per-source rollup of the contained-copy audit — the q88 pattern
    applied to winnowing: for every source, how many documents the
    d27 rule would drop as contained copies, and how many of those are
    contained in ANOTHER source's documents (the scrape/mirror signal:
    a source whose drops are mostly cross-source is republishing
    someone else's corpus; within-source drops are boilerplate). Uses
    the SAME pair surface and drop rule as ``winnowing_dedup`` (pairs
    from ``winnowing_overlap_pairs`` with sizes; smaller side drops,
    tie -> larger id), attributed to sources with two id-grain joins
    and rolled up once — dimension-grain output, one row per source.

    Returns (source, n_docs, n_dropped, drop_frac,
    n_dropped_by_other_source)."""
    pairs = winnowing_overlap_pairs(
        docs,
        id_col,
        text_col,
        max_df=max_df,
        min_shared=min_shared,
        min_overlap=min_overlap,
        with_sizes=True,
    )
    # doc_a < doc_b by construction: ties (n_a == n_b) resolve to
    # dropping doc_b — the larger id — via the otherwise branch
    a_drops = F.col("n_a") < F.col("n_b")
    edges = pairs.select(
        F.when(a_drops, F.col("doc_a")).otherwise(F.col("doc_b")).alias("_dropped"),
        F.when(a_drops, F.col("doc_b")).otherwise(F.col("doc_a")).alias("_container"),
    )
    src = docs.select(id_col, group_col)
    attributed = edges.join(
        src.select(F.col(id_col).alias("_dropped"), F.col(group_col).alias("_dsrc")),
        "_dropped",
    ).join(
        src.select(
            F.col(id_col).alias("_container"), F.col(group_col).alias("_csrc")
        ),
        "_container",
    )
    per_dropped = attributed.groupBy("_dropped").agg(
        F.first("_dsrc").alias("_dsrc"),
        F.max((F.col("_dsrc") != F.col("_csrc")).cast("int")).alias("_x"),
    )
    dropped_per_src = per_dropped.groupBy(F.col("_dsrc").alias(group_col)).agg(
        F.count("*").cast("long").alias("n_dropped"),
        F.sum("_x").cast("long").alias("n_dropped_by_other_source"),
    )
    totals = src.groupBy(group_col).agg(F.count("*").cast("long").alias("n_docs"))
    return totals.join(dropped_per_src, group_col, "left").select(
        group_col,
        "n_docs",
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        F.round(F.coalesce("n_dropped", F.lit(0)) / F.col("n_docs"), 4).alias(
            "drop_frac"
        ),
        F.coalesce("n_dropped_by_other_source", F.lit(0)).alias(
            "n_dropped_by_other_source"
        ),
    )


WINNOWSTORE_META_DIR = "_winnowstore_meta"


def build_winnowing_store(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    w: int | None = None,
) -> int:
    """Persist the archive's winnowing fingerprints as a maintained
    ARTIFACT — the copy-audit family's ``build_signature_store``:
    fingerprint the corpus once, append each accepted delta, and every
    future ``incremental_winnowing_overlap`` call joins the delta's
    fingerprints against the STORE instead of re-fingerprinting
    resident text (d25/d28 at daily cadence re-scan everything; the
    store makes the daily cost delta-proportional). Layout: DISTINCT
    (doc_id, fp) rows — the d25 join surface, position dropped
    deliberately (overlap counts fingerprints, never positions) — plus
    a one-row ``_winnowstore_meta`` pinning (k, w, id_col):
    fingerprints from different (k, w) are incomparable, so the store
    records its space and every writer/reader validates against it.
    Returns the stored row count."""
    from .text import WINNOW_K, WINNOW_W, winnowing_fingerprints

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    fps = (
        winnowing_fingerprints(docs, id_col, text_col, k=k, w=w)
        .select(id_col, "fp")
        .distinct()
    )
    fps.write.mode("error").parquet(path)
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(k), int(w), id_col)], "k int, w int, id_col string"
    ).coalesce(1).write.mode("error").parquet(f"{path}/{WINNOWSTORE_META_DIR}")
    return spark.read.parquet(path).count()


def _winnowstore_meta(spark, path: str) -> dict:
    # same torn-build contract as _sigstore_meta: a missing meta table
    # is a rebuild instruction, anything else propagates untouched
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(f"{path}/{WINNOWSTORE_META_DIR}").collect()[0]
    except AnalysisException as exc:
        raise ValueError(
            f"winnowing store at {path!r} has no {WINNOWSTORE_META_DIR} table — "
            "torn build_winnowing_store (crashed before the meta write) or "
            "not a winnowing store; remove the directory and rebuild it"
        ) from exc
    return {"k": row["k"], "w": row["w"], "id_col": row["id_col"]}


def append_to_winnowing_store(
    spark,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    skip_existing: bool = True,
) -> int:
    """Append the accepted delta's fingerprints — append-only files
    (concurrent readers see either listing, both valid); (k, w) come
    from the store's meta, never the call site. ``skip_existing``
    anti-joins the delta against resident ids so a RETRIED append is
    idempotent (the torn-append recovery contract, same as the
    signature store). Single-writer, like its siblings. Returns rows
    appended (after the skip)."""
    from .text import winnowing_fingerprints
    from ..session import free_local_checkpoint

    meta = _winnowstore_meta(spark, path)
    delta = delta_docs
    if skip_existing:
        resident_ids = spark.read.parquet(path).select(meta["id_col"]).distinct()
        delta = delta_docs.join(resident_ids, meta["id_col"], "left_anti")
    fps = (
        winnowing_fingerprints(
            delta, meta["id_col"], text_col, k=meta["k"], w=meta["w"]
        )
        .select(meta["id_col"], "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = fps.count()
    if n:
        fps.write.mode("append").parquet(path)
    free_local_checkpoint(fps)
    return n


def incremental_winnowing_overlap(
    spark,
    path: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    max_df: int | None = 1000,
    min_shared: int = 2,
    min_overlap: float | None = None,
) -> DataFrame:
    """Daily copy-audit against the persisted fingerprint store — the
    d19/d23 cost model applied to d25: fingerprint the DELTA, join it
    against the store's (doc, fp) rows, and restrict candidate pairs
    to those touching the delta — the resident x resident quadrant
    (already audited when the archive was admitted) is never
    generated. Resident TEXT is never read; the daily cost is delta
    fingerprinting plus a fingerprint-grain join against the store
    (column-pruned parquet — the artifact IS the join surface).

    The hot-fingerprint cap and both documents' surviving-fingerprint
    sizes are computed over store ∪ delta (one fingerprint universe,
    the d25 numerator==denominator rule). On a store built from the
    resident corpus and appended per-delta, output equals the fresh
    two-sided computation (asserted in tests — the s31/d23 identity
    discipline). Ids must be unique across store and delta (the q51
    delta contract, same as ``incremental_neardup_pairs``; the ingest
    loop's retry split is how a caller restores it after a crash).
    Returns (doc_a, doc_b, n_shared, overlap, is_cross) where
    is_cross = exactly one side resident."""
    from .text import winnowing_fingerprints

    meta = _winnowstore_meta(spark, path)
    id_col = meta["id_col"]
    resident = spark.read.parquet(path).select(id_col, "fp").withColumn(
        "_delta", F.lit(False)
    )
    delta = (
        winnowing_fingerprints(
            delta_docs, id_col, text_col, k=meta["k"], w=meta["w"]
        )
        .select(id_col, "fp")
        .distinct()
        .withColumn("_delta", F.lit(True))
        .localCheckpoint(eager=True)
    )
    allfps = resident.unionByName(delta)
    join_side = allfps
    if max_df is not None:
        hot = (
            allfps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        join_side = allfps.join(F.broadcast(hot), "fp", "left_anti")
    sizes = join_side.groupBy(id_col).agg(F.count("*").alias("n"))
    # DELTA-SIDED pair generation: the two-sided self-join emitted the
    # FULL candidate pair surface (resident x resident included) and
    # only then filtered to delta-touching rows — at a real daily
    # delta/archive ratio that is archive²-shaped work for delta-shaped
    # output. Joining delta fps against the whole universe generates
    # ONLY delta-touching candidates (cost ∝ delta x universe). A
    # delta-delta pair appears in both orientations, so its raw match
    # count is exactly 2 x n_shared (per shared fp: (d1,d2) and
    # (d2,d1)) — `div 2` restores the count; mixed pairs appear once.
    # The explicit width repartition is the d25 exploding-join fix
    # (AQE coalesces the thin fp exchange on input bytes, leaving the
    # fan-out join under-parallelized); filter preserves the
    # partitioning, so the join adds no extra exchange.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = join_side.repartition(width, "fp")
    d_side = keyed.filter(F.col("_delta")).select(
        F.col(id_col).alias("doc_x"), "fp"
    )
    all_side = keyed.select(
        F.col(id_col).alias("doc_y"), "fp", F.col("_delta").alias("_dy")
    )
    raw = (
        d_side.join(all_side, "fp")
        .filter(F.col("doc_x") != F.col("doc_y"))
        .select(
            F.least("doc_x", "doc_y").alias("doc_a"),
            F.greatest("doc_x", "doc_y").alias("doc_b"),
            "_dy",
            (F.col("doc_x") < F.col("doc_y")).alias("_xlt"),
        )
    )
    # per pair: _dd (both delta) iff any matched row's other side is
    # delta; for mixed pairs every row has the same orientation, so
    # max(_xlt) says whether the delta doc is the smaller id
    # pair-key repartition before the count — the d25 partial-agg fix
    # (pair keys nearly unique per map partition; see
    # winnowing_overlap_pairs)
    shared = (
        raw.repartition(width, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").cast("long").alias("_cnt"),
            F.max("_dy").alias("_dd"),
            F.max("_xlt").alias("_xlt"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("_dd"), F.expr("_cnt div 2"))
            .otherwise(F.col("_cnt"))
            .alias("n_shared"),
            (F.col("_dd") | F.col("_xlt")).alias("_da"),
            (F.col("_dd") | ~F.col("_xlt")).alias("_db"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("_nb"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("_na", "_nb"), 4).alias("overlap"),
            (F.col("_da") != F.col("_db")).alias("is_cross"),
        )
    )
    if min_overlap is not None:
        out = out.filter(F.col("overlap") >= min_overlap)
    return out


def winnowing_overlap_verify(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    max_df: int | None = 1000,
    min_shared: int = 2,
    min_overlap: float = 0.8,
) -> DataFrame:
    """Certification surface for the winnowing copy-detection path —
    the d16 discipline applied to d25: every qualifying winnowing pair
    carries BOTH its fingerprint-sample overlap (what d25/d27 decide
    on: ~2/(w+1) of the grams, df-capped) and the EXACT distinct-gram
    containment of the same pair, plus the absolute error. Winnowing
    GUARANTEES detection (any shared run >= w + k - 1 chars shares a
    fingerprint) but the overlap RATIO is a sample statistic — this
    table is the evidence the sampled ratio tracks the true one
    closely enough to rank drop decisions on, run at certification
    scale exactly like d16/d30.

    The exact side re-derives gram HASHES (the same md5 rule — no
    selection, no df cap) for PAIR MEMBERS ONLY: pair membership is
    orders of magnitude below the corpus, so the exact verify is
    bounded by the audit's own output, never a second corpus pass.
    Returns (doc_a, doc_b, n_shared, overlap, n_shared_exact,
    overlap_exact, abs_err) rounded 4."""
    from .text import winnowing_fingerprints, WINNOW_K

    k = WINNOW_K if k is None else k
    pairs = winnowing_overlap_pairs(
        docs,
        id_col,
        text_col,
        max_df=max_df,
        min_shared=min_shared,
        min_overlap=min_overlap,
    ).localCheckpoint(eager=True)
    member_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .unionByName(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    members = docs.join(F.broadcast(member_ids), id_col, "left_semi")
    # full distinct gram hashes (winnowing's hash WITHOUT the window
    # selection): explode the fused hash transform, distinct per doc
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hs = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - k + 1),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(t, i, k)), 1, 8), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    grams = (
        members.select(F.col(id_col), F.explode(hs).alias("gh")).distinct()
    )
    gsizes = grams.groupBy(id_col).agg(F.count("*").alias("gn"))
    a = grams.select(F.col(id_col).alias("doc_a"), "gh")
    b = grams.select(F.col(id_col).alias("doc_b"), "gh")
    exact = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_i"))
    )
    return (
        pairs.join(exact, ["doc_a", "doc_b"], "left")
        .join(
            gsizes.select(F.col(id_col).alias("doc_a"), F.col("gn").alias("_ga")),
            "doc_a",
        )
        .join(
            gsizes.select(F.col(id_col).alias("doc_b"), F.col("gn").alias("_gb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "overlap",
            F.coalesce(F.col("_i"), F.lit(0)).cast("long").alias("n_shared_exact"),
            F.round(
                F.coalesce(F.col("_i"), F.lit(0))
                / F.least(F.col("_ga"), F.col("_gb")),
                4,
            ).alias("overlap_exact"),
            F.round(
                F.abs(
                    F.col("overlap")
                    - F.coalesce(F.col("_i"), F.lit(0))
                    / F.least(F.col("_ga"), F.col("_gb"))
                ),
                4,
            ).alias("abs_err"),
        )
    )


def containment_vs_jaccard_grid(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The WHY-two-dedup-grains table: every LSH candidate pair scored
    with exact Jaccard AND exact containment (shared / smaller side),
    rolled onto a (jaccard decile, containment decile) grid. The
    off-diagonal mass IS the argument for running d25/d27 next to
    d15/q34: a short doc pasted into a long one sits at containment
    ~1.0 with Jaccard near min(|A|,|B|)/|B| — far below any sane
    whole-document dedup threshold — and this table counts exactly
    that population on the real corpus (the reference decides
    update-vs-replace by exact config identity; a training-data
    curator decides keep-vs-drop on these two axes).

    One shingle pass shared by signatures and the exact verify (the
    d16 plan shape: candidate-bounded inverted-index join, never
    all-pairs), one grid aggregate; <= 121 rows out. Deciles ride the
    1e4 micro lattice with INTEGER division (floor of a double*10
    differs at representation boundaries; round(x*1e4) // 1000 cannot).
    Returns (j_decile, c_decile, n_pairs) with deciles 0..10 (10 =
    exactly 1.0)."""
    sh = shingle_table(docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, num_hashes, id_col)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, id_col)
    sh_h = sh.select(
        F.col(id_col), F.xxhash64("shingle").alias("_h")
    ).localCheckpoint(eager=True)
    sizes = sh_h.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh_h.select(F.col(id_col).alias("doc_a"), "_h")
    b = sh_h.select(F.col(id_col).alias("doc_b"), "_h")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "_h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_i"))
    )
    scored = (
        inter.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("_na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("_nb")),
            "doc_b",
        )
        .select(
            F.round(
                F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 4
            ).alias("_j"),
            F.round(F.col("_i") / F.least("_na", "_nb"), 4).alias("_c"),
        )
    )
    grid = (
        scored.select(
            F.floor(F.round(F.col("_j") * 10000).cast("long") / 1000)
            .cast("long")
            .alias("j_decile"),
            F.floor(F.round(F.col("_c") * 10000).cast("long") / 1000)
            .cast("long")
            .alias("c_decile"),
        )
        .groupBy("j_decile", "c_decile")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        # grid-sized; materialized eagerly so the corpus-sized shingle
        # checkpoints can be freed before returning (the d16 pattern)
        .localCheckpoint(eager=True)
    )
    free_local_checkpoint(sh)
    free_local_checkpoint(sh_h)
    return grid
