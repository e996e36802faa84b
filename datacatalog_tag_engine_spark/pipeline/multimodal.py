"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs
over mapInPandas.

The Spark-side contract is real and tested — schemas, batch iteration,
partition sizing — while the actual media decode is stubbed: the
container has no image/audio libraries, so ``decode_image`` raises
NotImplementedError unless ``fake=True`` picks the deterministic fake
decoder (parses the tiny fake header written by ``make_fake_media``).

At 100 TB: binary payloads dominate partition size, so media tables are
read with a small files.maxPartitionBytes and processed by mapInPandas
(streaming batches, no full-partition materialization); feature
extraction emits narrow rows so downstream shuffles never carry the
payload bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

_MAGIC = b"FAKEMEDIA"


def make_fake_media(spark, n: int = 16) -> DataFrame:
    """Deterministic fake media rows: payload = magic + packed
    (width, height, duration_ms, n_frames)."""
    rows = []
    for i in range(n):
        w, h, dur, frames = 16 + i, 9 + i, 1000 + 10 * i, 24 + i
        payload = _MAGIC + struct.pack("<iiii", w, h, dur, frames)
        rows.append(
            {
                "media_id": i,
                "kind": ["image", "audio", "video"][i % 3],
                "payload": bytearray(payload),
                "mime": "application/x-fake",
                "meta_width": w,
                "meta_height": h,
                "meta_duration_ms": dur,
            }
        )
    # tiny fixture: parallelize straight into ~rows/8 slices so the
    # Pandas-UDF stage doesn't spawn one Python worker per near-empty
    # partition. NOT createDataFrame().coalesce(k): coalescing a
    # python-parallelized relation makes each task re-open every parent
    # pickle sub-partition through the JVM bridge — measured ~3s vs
    # ~0.2s for a 16-row identity mapInPandas.
    from ..session import local_df

    return local_df(spark, rows, MEDIA_SCHEMA, slices=max(1, n // 8))


def decode_payload(payload: bytes, fake: bool = True) -> dict:
    """Decode one media payload into features.

    fake=True parses the FAKEMEDIA header; fake=False is where a real
    decoder (PIL/librosa/ffmpeg) would plug in — unavailable in this
    container, so it raises.
    """
    if not fake:
        raise NotImplementedError("real media decode needs PIL/librosa/ffmpeg — not in this container")
    # a truncated header (magic present, fewer than 16 body bytes) is
    # malformed the same way a wrong-magic payload is: all-None features,
    # never a struct.error that aborts the whole Spark task
    if (
        payload is None
        or len(payload) < len(_MAGIC) + 16
        or bytes(payload[: len(_MAGIC)]) != _MAGIC
    ):
        return {"width": None, "height": None, "duration_ms": None, "n_frames": None}
    w, h, dur, frames = struct.unpack("<iiii", bytes(payload[len(_MAGIC) : len(_MAGIC) + 16]))
    return {"width": w, "height": h, "duration_ms": dur, "n_frames": frames}


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_sample_ms", T.ArrayType(T.IntegerType()), True),
    ]
)


def extract_features(media: DataFrame, sample_frames: int = 4, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: decode header features and sample
    frame timestamps (evenly spaced). Arrow batches stream through the
    Python worker; output drops the payload so downstream stages stay
    narrow."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                feats = decode_payload(row["payload"], fake=fake)
                dur = feats["duration_ms"]
                samples = (
                    [int(dur * i / sample_frames) for i in range(sample_frames)]
                    if dur is not None
                    else None
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "payload_bytes": len(row["payload"]) if row["payload"] is not None else None,
                        "width": feats["width"],
                        "height": feats["height"],
                        "duration_ms": dur,
                        "n_frames": feats["n_frames"],
                        "frame_sample_ms": samples,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Pure-SQL resize planning from typed metadata (no decode): target
    dimensions preserving aspect ratio — the JVM-side half of a
    decode+resize pipeline; the pixel work would live in a Pandas UDF
    beside extract_features."""
    w, h = F.col("meta_width"), F.col("meta_height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return media.select(
        "media_id",
        "kind",
        w.alias("src_width"),
        h.alias("src_height"),
        F.round(w * scale).cast("int").alias("dst_width"),
        F.round(h * scale).cast("int").alias("dst_height"),
    )


# --- perceptual hashing (payload-level image near-dup, r8) -----------------

# The average-hash grid: GRID x GRID grayscale cells, one fingerprint
# bit per cell (cell value above the image mean -> 1). 8x8 = the
# classic 64-bit aHash (the DCT-free member of the pHash family).
PHASH_GRID = 8


def _fake_pixel_grid(w: int, h: int, seed: int) -> list[int]:
    """Deterministic fake decode of an image payload into the GRID x
    GRID grayscale cells a real decoder would average-pool down to.

    The container has no image codecs, so — like ``decode_payload`` —
    the pixels are synthesized from the typed header: a per-cell
    integer pattern in 0..255 that (a) varies per cell within an image,
    (b) decorrelates across images with different (w, h) (the
    (cx, cy)-dependent multiplier term, so two different images differ
    in ~half their bits, not by a uniform offset that average-hash
    would erase), and (c) perturbs ``seed`` cells by +128 mod 256 —
    each perturbed cell flips its bit, so payloads sharing (w, h) with
    small seeds are NEAR-duplicates (hamming <= seed + mean wobble)
    while distinct (w, h) are far apart. Everything is integer
    arithmetic, so the m02 oracle replays it exactly in SQL."""
    vals = []
    for cy in range(PHASH_GRID):
        for cx in range(PHASH_GRID):
            v = (w * 37 + h * 53 + (cx * 13 + cy * 29 + 1) * (3 + w % 13)) % 256
            flips = sum(
                1 for c in range(seed) if (w * 7 + c * 11) % 64 == cy * PHASH_GRID + cx
            )
            if flips % 2 == 1:
                v = (v + 128) % 256
            vals.append(v)
    return vals


def make_fake_image_corpus(spark, n_groups: int = 6, group_size: int = 3) -> DataFrame:
    """Fake image corpus for payload-level dedup: ``n_groups`` base
    images, each with ``group_size`` near-duplicate variants (seed j
    perturbs j pixel cells — re-encodes/crops of the same creative).
    media_id = group * group_size + variant; payload = the FAKEMEDIA
    header + a 4-byte variant seed (``decode_payload`` ignores the
    extra bytes, so these rows flow through every existing media
    operator unchanged)."""
    rows = []
    for g in range(n_groups):
        w, h = 64 + g, 48 + g
        for j in range(group_size):
            payload = _MAGIC + struct.pack("<iiii", w, h, 0, 1) + struct.pack("<i", j)
            rows.append(
                {
                    "media_id": g * group_size + j,
                    "kind": "image",
                    "payload": bytearray(payload),
                    "mime": "application/x-fake",
                    "meta_width": w,
                    "meta_height": h,
                    "meta_duration_ms": 0,
                }
            )
    from ..session import local_df

    return local_df(spark, rows, MEDIA_SCHEMA, slices=max(1, len(rows) // 8))


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)


def image_phash(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-image 64-bit average hash over the decoded pixel grid:
    (media_id, phash). mapInPandas directly on the media table — the
    payload bytes are consumed INSIDE the scan stage and only the
    8-byte fingerprint ever reaches a shuffle (plan-asserted in
    tests/test_plans.py), which is what makes payload-level dedup
    viable when payloads dominate partition size at 100 TB.

    The bit rule is integer-exact (64 * cell > sum(cells), no float
    mean), and bit 63 packs as two's complement, so the fingerprint is
    SQL-replayable. ``fake=False`` is where PIL/ffmpeg would decode
    real pixels — unavailable in this container, so it raises (the
    ``decode_payload`` pattern)."""
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/ffmpeg — not in this container"
        )

    hdr = len(_MAGIC)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                p = row["payload"]
                if (
                    p is None
                    or len(p) < hdr + 16
                    or bytes(p[:hdr]) != _MAGIC
                ):
                    out.append({"media_id": row["media_id"], "phash": None})
                    continue
                w, h, _dur, _frames = struct.unpack("<iiii", bytes(p[hdr : hdr + 16]))
                seed = (
                    struct.unpack("<i", bytes(p[hdr + 16 : hdr + 20]))[0]
                    if len(p) >= hdr + 20
                    else 0
                )
                vals = _fake_pixel_grid(w, h, seed)
                s = sum(vals)
                fp = 0
                for cell, v in enumerate(vals):
                    if 64 * v > s:
                        fp |= 1 << cell
                if fp >= 1 << 63:  # two's-complement into int64
                    fp -= 1 << 64
                out.append({"media_id": row["media_id"], "phash": fp})
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, PHASH_SCHEMA)


# --- audio fingerprinting (chromaprint-shaped, r9 queue) -------------------

AUDIO_FP_FRAMES = 17  # 16 temporal deltas x 4 bands = 64 bits
AUDIO_FP_BANDS = 4


def _fake_band_energy(dur: int, seed: int, t: int, b: int) -> int:
    """Deterministic fake sub-band energy for frame t, band b of an
    audio payload — the stand-in for an FFT band sum (no audio libs in
    this container). Integer arithmetic only, so the SQL oracle replays
    it; ``seed`` perturbs a few (t, b) cells the same way the image
    fake perturbs pixels, making same-duration payloads with small
    seeds NEAR-duplicates under the delta fingerprint."""
    v = (dur * 31 + (t * 17 + b * 41 + 1) * (5 + dur % 11)) % 1024
    flips = sum(
        1
        for c in range(seed)
        if (dur * 13 + c * 7) % (AUDIO_FP_FRAMES * AUDIO_FP_BANDS)
        == t * AUDIO_FP_BANDS + b
    )
    if flips % 2 == 1:
        v = (v + 512) % 1024
    return v


def make_fake_audio_corpus(spark, n_groups: int = 6, group_size: int = 3) -> DataFrame:
    """Fake audio corpus: ``n_groups`` base clips x ``group_size``
    re-encode variants (seed j perturbs j energy cells). Payload layout
    matches the image corpus (header + 4-byte seed)."""
    rows = []
    for g in range(n_groups):
        dur = 30_000 + 700 * g
        for j in range(group_size):
            payload = _MAGIC + struct.pack("<iiii", 0, 0, dur, 0) + struct.pack("<i", j)
            rows.append(
                {
                    "media_id": g * group_size + j,
                    "kind": "audio",
                    "payload": bytearray(payload),
                    "mime": "application/x-fake",
                    "meta_width": 0,
                    "meta_height": 0,
                    "meta_duration_ms": dur,
                }
            )
    from ..session import local_df

    return local_df(spark, rows, MEDIA_SCHEMA, slices=max(1, len(rows) // 8))


def audio_fingerprint(media: DataFrame, fake: bool = True) -> DataFrame:
    """Chromaprint-shaped 64-bit audio fingerprint: (media_id, afp).
    Bit (t, b) is the TEMPORAL DELTA sign energy(t+1, b) > energy(t, b)
    — the encoding AcoustID's chromaprint uses (delta signs survive
    volume/codec changes; absolute energies do not). 16 deltas x 4
    bands pack to one long (bit 63 two's-complement, the image-phash
    rule), so near-dup detection is `hamming_neardup_pairs` verbatim.
    Same scan shape as image_phash: payload consumed inside the scan
    stage, only the 8-byte fingerprint shuffles. ``fake=False`` is the
    real-decoder seam (librosa/ffmpeg) — unavailable here, raises."""
    if not fake:
        raise NotImplementedError(
            "real audio decode needs librosa/ffmpeg — not in this container"
        )

    hdr = len(_MAGIC)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                p = row["payload"]
                if p is None or len(p) < hdr + 16 or bytes(p[:hdr]) != _MAGIC:
                    out.append({"media_id": row["media_id"], "afp": None})
                    continue
                _w, _h, dur, _fr = struct.unpack("<iiii", bytes(p[hdr : hdr + 16]))
                seed = (
                    struct.unpack("<i", bytes(p[hdr + 16 : hdr + 20]))[0]
                    if len(p) >= hdr + 20
                    else 0
                )
                fp = 0
                bit = 0
                for t in range(AUDIO_FP_FRAMES - 1):
                    for b in range(AUDIO_FP_BANDS):
                        if _fake_band_energy(dur, seed, t + 1, b) > _fake_band_energy(
                            dur, seed, t, b
                        ):
                            fp |= 1 << bit
                        bit += 1
                if fp >= 1 << 63:
                    fp -= 1 << 64
                out.append({"media_id": row["media_id"], "afp": fp})
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(run, schema)


# --- video frame-sequence near-dup (r9 queue) ------------------------------


def make_fake_video_corpus(spark, n_groups: int = 4, group_size: int = 3) -> DataFrame:
    """Fake video corpus: groups share (w, h, duration); variant seed j
    perturbs every sampled frame's pixel grid in j cells (a re-encode /
    watermark overlay)."""
    rows = []
    for g in range(n_groups):
        w, h, dur = 128 + g, 72 + g, 60_000 + 900 * g
        for j in range(group_size):
            payload = (
                _MAGIC + struct.pack("<iiii", w, h, dur, 24) + struct.pack("<i", j)
            )
            rows.append(
                {
                    "media_id": g * group_size + j,
                    "kind": "video",
                    "payload": bytearray(payload),
                    "mime": "application/x-fake",
                    "meta_width": w,
                    "meta_height": h,
                    "meta_duration_ms": dur,
                }
            )
    from ..session import local_df

    return local_df(spark, rows, MEDIA_SCHEMA, slices=max(1, len(rows) // 8))


FRAME_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)


def video_frame_phashes(
    media: DataFrame, sample_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Per-sampled-frame perceptual hash: (media_id, frame_idx, phash).
    Frames sample evenly across the duration (the extract_features
    rule); each frame's pixel grid is the image fake with the frame
    index folded into the pattern (frame t of a re-encode matches
    frame t of the original — temporal alignment is what makes
    frame-wise dedup meaningful). One payload decode emits
    sample_frames narrow rows; the payload itself never leaves the
    scan stage."""
    if not fake:
        raise NotImplementedError(
            "real video decode needs ffmpeg — not in this container"
        )

    hdr = len(_MAGIC)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                p = row["payload"]
                if p is None or len(p) < hdr + 16 or bytes(p[:hdr]) != _MAGIC:
                    # null-phash row (frame_idx -1) instead of skipping:
                    # an all-invalid pandas batch would otherwise yield a
                    # zero-column DataFrame that fails Arrow conversion
                    # (image_phash / audio_fingerprint do the same)
                    out.append(
                        {"media_id": row["media_id"], "frame_idx": -1, "phash": None}
                    )
                    continue
                w, h, _dur, _fr = struct.unpack("<iiii", bytes(p[hdr : hdr + 16]))
                seed = (
                    struct.unpack("<i", bytes(p[hdr + 16 : hdr + 20]))[0]
                    if len(p) >= hdr + 20
                    else 0
                )
                for t in range(sample_frames):
                    # frame content varies by t (h offset keeps the
                    # arithmetic in the image fake's shape); the variant
                    # seed perturbs the same cells in every frame
                    vals = _fake_pixel_grid(w, h + 7 * t, seed)
                    s = sum(vals)
                    fp = 0
                    for cell, v in enumerate(vals):
                        if 64 * v > s:
                            fp |= 1 << cell
                    if fp >= 1 << 63:
                        fp -= 1 << 64
                    out.append(
                        {"media_id": row["media_id"], "frame_idx": t, "phash": fp}
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, FRAME_PHASH_SCHEMA)


def manifest_stats(features: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Per-kind media-manifest rollup over ``extract_features`` output
    — the corpus-level answer to "what is actually in this media
    bucket" (row counts, payload mass, dimension/duration envelope)
    that a multimodal training-data build publishes next to the text
    corpus_stats (q31). Typed-metadata-only: the aggregate reads the
    narrow feature rows, so payload bytes stay in the upstream decode
    scan exactly as in every other multimodal operator.

    One group-grain aggregate, |kinds| result rows. Width/height
    aggregate only where present (images/videos), duration only where
    present (audio/videos) — nulls are skipped by the aggregates and
    the per-kind counts say how many rows carried each attribute.
    Returns (kind, n_items, total_payload_bytes, n_with_dims,
    max_width, max_height, n_with_duration, total_duration_ms,
    max_frames)."""
    return features.groupBy(kind_col).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("payload_bytes").cast("long").alias("total_payload_bytes"),
        F.count("width").cast("long").alias("n_with_dims"),
        F.max("width").cast("int").alias("max_width"),
        F.max("height").cast("int").alias("max_height"),
        F.count("duration_ms").cast("long").alias("n_with_duration"),
        F.sum("duration_ms").cast("long").alias("total_duration_ms"),
        F.max("n_frames").cast("int").alias("max_frames"),
    )


def payload_size_profile(features: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Per-kind payload-size envelope over ``extract_features`` output
    — the storage-planning companion to ``manifest_stats`` (that one
    sums mass; this one shapes it): exact p50/p90 plus min/max of
    payload_bytes per kind. Shard sizing, decode-worker memory limits,
    and outlier hunts (a 2 GB "image") all read this table. Exact
    percentiles at kind grain are fine at any corpus size — the
    aggregate is over the narrow feature rows (payload bytes already
    dropped upstream), grouped into |kinds| rows; swap
    percentile_approx in only if a single kind's row count itself
    becomes a straggler, and document the epsilon (the q74 rule).

    Returns (kind, n_items, min_bytes, p50_bytes, p90_bytes,
    max_bytes)."""
    return features.groupBy(F.col(kind_col).alias("kind")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.min("payload_bytes").cast("long").alias("min_bytes"),
        F.round(F.expr("percentile(payload_bytes, 0.5)"), 2).alias("p50_bytes"),
        F.round(F.expr("percentile(payload_bytes, 0.9)"), 2).alias("p90_bytes"),
        F.max("payload_bytes").cast("long").alias("max_bytes"),
    )


def neardup_rate_profile(
    parts: list[tuple[str, DataFrame, DataFrame, str]],
) -> DataFrame:
    """Per-kind near-dup exposure rollup — the m-family's q88: one row
    per modality summarizing how much of the corpus its payload
    near-dup pass (m02 phash / m03 audio fingerprint / m04 frame
    phashes) would collapse. ``parts`` is [(kind, items, pairs,
    id_col)] where ``items`` is the modality's corpus and ``pairs``
    its pair surface (id_a/id_b prefixed columns or doc_a/doc_b —
    the first two columns are taken as the pair sides). Everything
    stays item/pair-grain: ids are projected, unioned with a kind
    literal, and aggregated once; payloads never enter the plan.
    Returns (kind, n_items, n_dup_pairs, n_items_in_pairs,
    dup_item_rate rounded 4)."""
    item_union = None
    pair_union = None
    for kind, items, pairs, id_col in parts:
        # string cast, NOT long: the union only needs a common id type
        # for counting, and string is lossless for any id — a long cast
        # would silently NULL non-numeric ids and collapse a whole
        # modality's items into one distinct value
        iu = items.select(
            F.lit(kind).alias("kind"), F.col(id_col).cast("string").alias("_id")
        )
        a_col, b_col = pairs.columns[:2]
        pu = pairs.select(
            F.lit(kind).alias("kind"),
            F.col(a_col).cast("string").alias("_a"),
            F.col(b_col).cast("string").alias("_b"),
        )
        item_union = iu if item_union is None else item_union.unionByName(iu)
        pair_union = pu if pair_union is None else pair_union.unionByName(pu)
    n_items = item_union.groupBy("kind").agg(
        F.count("*").cast("long").alias("n_items")
    )
    n_pairs = pair_union.groupBy("kind").agg(
        F.count("*").cast("long").alias("n_dup_pairs")
    )
    in_pairs = (
        pair_union.select("kind", F.col("_a").alias("_id"))
        .unionByName(pair_union.select("kind", F.col("_b").alias("_id")))
        .distinct()
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n_items_in_pairs"))
    )
    return (
        n_items.join(n_pairs, "kind", "left")
        .join(in_pairs, "kind", "left")
        .select(
            "kind",
            "n_items",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_items_in_pairs", F.lit(0)).alias("n_items_in_pairs"),
            F.round(
                F.coalesce("n_items_in_pairs", F.lit(0)) / F.col("n_items"), 4
            ).alias("dup_item_rate"),
        )
    )
