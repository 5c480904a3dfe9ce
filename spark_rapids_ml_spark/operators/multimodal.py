"""Multimodal column handling: struct bundling, binary payloads, and
the decode/feature-extract plumbing for image/audio/video columns.

Design: media lives as an opaque ``binary`` column next to typed
metadata (a struct), the layout every large multimodal dataset uses
(WebDataset/Parquet-of-bytes). Decode / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the same batch-staging shape
the reference uses for its GPU hop (RapidsRowMatrix.scala:177-199,
iterator → contiguous buffer → vectorized kernel), with Arrow batches
in place of the JNI buffer.

The actual codec call is STUBBED (no image/audio libs in this
container): ``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives
"pixels" from the payload bytes — so schema, partitioning, UDF
signatures and batch shapes are all real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "mm_struct_bundle",
    tags=("multimodal", "struct"),
    oracle="""
WITH b AS (
  SELECT doc_id,
         {'body': text, 'meta': {'lang': lang, 'src': source, 'chars': n_chars}} AS bundle
  FROM documents
)
SELECT doc_id,
       bundle.meta.lang AS lang,
       bundle.meta.src AS src,
       CAST(bundle.meta.chars AS BIGINT) AS chars,
       CAST(LENGTH(bundle.body) AS BIGINT) AS body_len
FROM b
WHERE bundle.meta.chars > 400 AND bundle.meta.lang IN ('en', 'es')
ORDER BY doc_id
""",
)
def mm_struct_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundle (text, metadata) into a nested struct, then filter and
    project through the nested fields — Catalyst prunes the struct to
    the accessed leaves (schema pruning), so unread fields of a wide
    multimodal row are never decoded from parquet."""
    d = load(spark, sf_dir, "documents")
    bundled = d.select(
        "doc_id",
        F.struct(
            F.col("text").alias("body"),
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("src"),
                F.col("n_chars").alias("chars"),
            ).alias("meta"),
        ).alias("bundle"),
    )
    return (
        bundled.where(
            (F.col("bundle.meta.chars") > 400) & (F.col("bundle.meta.lang").isin("en", "es"))
        )
        .select(
            "doc_id",
            F.col("bundle.meta.lang").alias("lang"),
            F.col("bundle.meta.src").alias("src"),
            F.col("bundle.meta.chars").cast("bigint").alias("chars"),
            F.length("bundle.body").cast("bigint").alias("body_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "mm_binary_payload",
    tags=("multimodal", "binary"),
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
WHERE doc_id <= 200
ORDER BY doc_id
""",
)
def mm_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload passthrough: size + checksum only — the
    engine never interprets media bytes outside an explicit decode
    stage, so scans stay column-pruned and cheap."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# decode / feature-extract plumbing (stubbed codec)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("std_px", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FAKE_W, FAKE_H = 16, 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: tile the payload bytes into a
    FAKE_H x FAKE_W uint8 'image'. Stands in for PIL/libjpeg."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = FAKE_W * FAKE_H
    tiled = np.resize(raw, need)  # cycles bytes deterministically
    return tiled.reshape(FAKE_H, FAKE_W)


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of image payloads. Real codecs are unavailable in
    this environment — callers must opt into the deterministic fake."""
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/opencv) not available in this build; "
            "pass fake=True for the deterministic stub decoder"
        )
    return [_fake_decode(p) for p in payloads]


def extract_image_features(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode + feature-extract stage.

    Arrow streams (id, payload) batches into Python; each batch is
    decoded and reduced to fixed-size features (per-column means) —
    the exact per-partition batch shape a real GPU/codec stage needs.
    Scale: linear, no shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf[payload_col], fake=True)
            rows = []
            for i, img in enumerate(imgs):
                rows.append(
                    {
                        "doc_id": int(pdf[id_col].iloc[i]),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_px": float(img.mean()),
                        "std_px": float(img.std()),
                        "feature": img.mean(axis=0).astype(np.float64).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


@register("mm_image_decode_features", tags=("multimodal", "decode"), oracle=None)
def mm_image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub pipeline over binary payloads: mapInPandas batches →
    fake decode → per-image stats + a 16-dim feature vector (exploded
    to scalars for the rows-only check; tests/test_multimodal.py
    asserts values against a local numpy replay)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    feats = extract_image_features(payloads, "payload")
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.round("mean_px", 6).alias("mean_px"),
        F.round("std_px", 6).alias("std_px"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 16), 6).alias("f15"),
    ).orderBy("doc_id")


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)

FRAME_LEN = 64


def sample_audio_frames(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stage (audio/video analogue of decode): split each
    payload into fixed-length frames, one output row per frame —
    mapInPandas with a row-expanding output, the shape real
    frame-samplers (ffmpeg) need."""

    cols = [f.name for f in AUDIO_FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fully vectorized framing: concatenate every payload into one
        # NaN-padded buffer, reshape to (total_frames, FRAME_LEN), and
        # compute all frame stats as masked column-wise numpy ops — the
        # only Python-level loop is one O(1) slice-copy per row (forced
        # by variable-length binaries), never per frame or per sample.
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            sigs = [
                np.frombuffer(b, dtype=np.uint8).astype(np.float64) - 128.0
                for b in pdf[payload_col]
            ]
            n_frames = np.array([max(1, len(s) // FRAME_LEN) for s in sigs])
            total = int(n_frames.sum())
            buf = np.full(total * FRAME_LEN, np.nan)
            pos = 0
            for s, nf in zip(sigs, n_frames):
                take = min(len(s), nf * FRAME_LEN)  # drop the sub-frame tail
                buf[pos : pos + take] = s[:take]
                pos += nf * FRAME_LEN
            fr = buf.reshape(-1, FRAME_LEN)
            valid = ~np.isnan(fr)
            cnt = valid.sum(axis=1)
            filled = np.where(valid, fr, 0.0)
            rms = np.sqrt(
                np.divide(
                    (filled**2).sum(axis=1),
                    cnt,
                    out=np.zeros(total),
                    where=cnt > 0,
                )
            )
            zc = (
                (np.diff(np.sign(filled), axis=1) != 0)
                & valid[:, 1:]
                & valid[:, :-1]
            ).sum(axis=1)
            starts = np.cumsum(n_frames) - n_frames
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(np.int64), n_frames),
                    "frame_idx": np.arange(total) - np.repeat(starts, n_frames),
                    "rms": rms,
                    "zero_crossings": zc.astype(np.int64),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, AUDIO_FRAME_SCHEMA)


@register("mm_audio_frame_sample", tags=("multimodal", "decode"), oracle=None)
def mm_audio_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stub over binary payloads (rows-only check +
    numpy-replay assertions in tests/test_multimodal.py)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = sample_audio_frames(payloads, "payload")
    return frames.select(
        "doc_id",
        "frame_idx",
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
    ).orderBy("doc_id", "frame_idx")
