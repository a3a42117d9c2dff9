"""Multimodal column plumbing (north-star Phase 4).

Images/audio/video are opaque `binary` columns with typed metadata
structs; decode / feature-extract run as Arrow-batched pandas
iterators via `mapInPandas`. The container has no image/audio codecs,
so the decode kernel is a clearly-marked deterministic STUB — but the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is
real and is what matters at scale: binary payloads never pass through
Python row-at-a-time, only as Arrow buffers per batch.

Scale notes: binary columns make wide rows — the session would set
`spark.sql.files.maxPartitionBytes` lower for such tables so a
partition stays memory-resident; metadata-only queries prune the
binary column at the parquet scan (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loaders import load_table

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta STRUCT<codec: STRING, n_bytes: BIGINT, sample_rate: INT>"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "width INT, height INT, checksum STRING"
)


def synthesize_media(d: DataFrame) -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes of
    the text (stands in for an image/audio blob), typed metadata."""
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i))))) for i in range(4)]
    )  # 4 x 16 md5 bytes = 64-byte deterministic blob
    media_type = F.when(F.col("doc_id") % 3 == 0, "image").when(
        F.col("doc_id") % 3 == 1, "audio"
    ).otherwise("video")
    return d.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("stub").alias("codec"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: container has no codecs (Pillow/ffmpeg absent).
    Derives deterministic fake (width, height) from the payload header.
    A real deployment swaps this body for PIL.Image.open / libav —
    the signature and the Arrow batching around it stay identical.
    """
    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    return 16 + payload[0] % 64, 16 + payload[1] % 64


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: one pandas DataFrame per batch
    in, one out — the mapInPandas shape a real decoder would use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


@register(
    "multimodal_features",
    # The stub decode is fully deterministic (payload = 4x md5(text||i)
    # unhexed; width/height from the first two payload bytes), so DuckDB
    # can replicate every output value: bytes come back out of the hex
    # digits of md5, and distinct-checksum count equals distinct-payload
    # count (md5 is injective on this fixture). DuckDB's md5() is
    # VARCHAR-only, so the oracle counts distinct payload hex instead of
    # distinct md5(payload) — identical cardinality.
    oracle="""
        WITH f AS (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   (strpos('0123456789abcdef', substr(md5(text || '0'), 1, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5(text || '0'), 2, 1)) - 1 AS b0,
                   (strpos('0123456789abcdef', substr(md5(text || '0'), 3, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5(text || '0'), 4, 1)) - 1 AS b1,
                   md5(text || '0') || md5(text || '1')
                     || md5(text || '2') || md5(text || '3') AS payload_hex
            FROM documents
        )
        SELECT media_type,
               COUNT(*) AS n_media,
               CAST(COUNT(*) * 64 AS BIGINT) AS total_bytes,
               ROUND(AVG(16 + b0 % 64), 6) AS avg_width,
               ROUND(AVG(16 + b1 % 64), 6) AS avg_height,
               COUNT(DISTINCT payload_hex) AS n_distinct_payloads
        FROM f
        GROUP BY media_type
        ORDER BY media_type
    """,
    tags=("multimodal", "pandas-udf"),
    doc="Binary media columns -> mapInPandas feature extraction (stub decode): "
    "per-media-type size and dimension stats.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(d))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.countDistinct("checksum").alias("n_distinct_payloads"),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_metadata_scan",
    oracle="""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               COUNT(*) AS n_media,
               CAST(COUNT(*) * 64 AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal", "metadata"),
    doc="Metadata-only scan of the media table: the binary payload column is "
    "pruned at the source (never read) — verify with .explain ReadSchema.",
)
def multimodal_metadata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = synthesize_media(d)
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.col("meta.n_bytes")).cast("bigint").alias("total_bytes"),
        )
    )


FRAME_BYTES = 8  # stub frame size -> 8 frames per 64-byte payload
FRAME_STRIDE = 3  # keep every 3rd frame (fps-resampling analog)


@register(
    "multimodal_frame_sample",
    # deterministic end-to-end: frames are fixed-size payload slices,
    # so DuckDB recomputes every sampled frame from the payload hex
    oracle=f"""
        WITH f AS (
            SELECT doc_id,
                   md5(text || '0') || md5(text || '1')
                     || md5(text || '2') || md5(text || '3') AS payload_hex
            FROM documents
            WHERE doc_id % 3 = 2  -- the video rows
        ),
        frames AS (
            SELECT doc_id, i AS frame_idx,
                   substr(payload_hex, i * {FRAME_BYTES * 2} + 1,
                          {FRAME_BYTES * 2}) AS frame_hex
            FROM f, LATERAL unnest(range(0, 64 // {FRAME_BYTES})) AS t(i)
            WHERE i % {FRAME_STRIDE} = 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS frames_sampled,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS videos,
               CAST(COUNT(*) / COUNT(DISTINCT doc_id) AS BIGINT)
                   AS frames_per_video,
               CAST(COUNT(DISTINCT frame_hex) AS BIGINT) AS distinct_frames
        FROM frames
    """,
    tags=("multimodal", "pandas-udf", "video"),
    doc=f"Video frame sampling: payloads slice into {FRAME_BYTES}-byte "
    f"stub frames, every {FRAME_STRIDE}rd kept (the fps-resampling "
    "shape) — one mapInPandas pass emitting a row per SAMPLED frame, "
    "so downstream per-frame featurizers never see dropped frames. "
    "Arrow-batched; a real deployment swaps the slicer for "
    "libav keyframe extraction with the same batch signature.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = synthesize_media(d).filter(F.col("media_type") == "video")

    frame_schema = "doc_id BIGINT, frame_idx INT, frame_hex STRING"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hex": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload) // FRAME_BYTES, FRAME_STRIDE):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_hex"].append(
                        payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES].hex()
                    )
            yield pd.DataFrame(out)

    frames = media.select("doc_id", "payload").mapInPandas(
        kernel, schema=frame_schema
    )
    return frames.agg(
        F.count("*").alias("frames_sampled"),
        F.countDistinct("doc_id").alias("videos"),
        (F.count("*") / F.countDistinct("doc_id")).cast("bigint").alias(
            "frames_per_video"
        ),
        F.countDistinct("frame_hex").alias("distinct_frames"),
    )


RESIZE_MAX_SIDE = 224  # target max dimension (vision-model input prep)


@register(
    "multimodal_resize_plan",
    # the stub decode dims are integer functions of the first two
    # payload bytes; aspect-preserving integer resize math replays in SQL
    oracle=f"""
        WITH dims AS (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   16 + ((strpos('0123456789abcdef', substr(md5(text || '0'), 1, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5(text || '0'), 2, 1)) - 1) % 64 AS w,
                   16 + ((strpos('0123456789abcdef', substr(md5(text || '0'), 3, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5(text || '0'), 4, 1)) - 1) % 64 AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        resized AS (
            SELECT media_type, w, h,
                   CAST(w * {RESIZE_MAX_SIDE} // greatest(w, h) AS INT) AS out_w,
                   CAST(h * {RESIZE_MAX_SIDE} // greatest(w, h) AS INT) AS out_h
            FROM dims
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS images,
               CAST(SUM(CASE WHEN greatest(out_w, out_h) = {RESIZE_MAX_SIDE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS max_side_exact,
               CAST(SUM(CASE WHEN out_w * h >= out_h * w - h
                              AND out_h * w >= out_w * h - w
                             THEN 1 ELSE 0 END) AS BIGINT) AS aspect_preserved,
               CAST(MIN(out_w) AS BIGINT) AS min_out_w,
               CAST(MAX(out_h) AS BIGINT) AS max_out_h
        FROM resized
    """,
    tags=("multimodal", "image"),
    doc=f"Image resize planning: aspect-preserving integer scaling of "
    f"the decoded dims to max side {RESIZE_MAX_SIDE} (vision-model "
    "input prep). The geometry is pure JVM-side integer expressions "
    "over the decode output — the actual pixel resample is the stubbed "
    "codec step; its TARGET SHAPES (what the pipeline schedules "
    "batches around) are computed and verified here.",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(d)).filter(
        F.col("media_type") == "image"
    )
    mx = F.greatest("width", "height")
    resized = feats.select(
        "width",
        "height",
        F.floor(F.col("width") * RESIZE_MAX_SIDE / mx).cast("int").alias("out_w"),
        F.floor(F.col("height") * RESIZE_MAX_SIDE / mx).cast("int").alias("out_h"),
    )
    return resized.agg(
        F.count("*").alias("images"),
        F.sum(
            (F.greatest("out_w", "out_h") == RESIZE_MAX_SIDE).cast("int")
        ).cast("bigint").alias("max_side_exact"),
        F.sum(
            (
                (F.col("out_w") * F.col("height") >= F.col("out_h") * F.col("width") - F.col("height"))
                & (F.col("out_h") * F.col("width") >= F.col("out_w") * F.col("height") - F.col("width"))
            ).cast("int")
        ).cast("bigint").alias("aspect_preserved"),
        F.min("out_w").cast("bigint").alias("min_out_w"),
        F.max("out_h").cast("bigint").alias("max_out_h"),
    )
