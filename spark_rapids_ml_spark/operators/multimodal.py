"""Multimodal column handling: struct bundling, binary payloads, and
the decode/feature-extract plumbing for image/audio/video columns.

Design: media lives as an opaque ``binary`` column next to typed
metadata (a struct), the layout every large multimodal dataset uses
(WebDataset/Parquet-of-bytes). Decode / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the same batch-staging shape
the reference uses for its GPU hop (RapidsRowMatrix.scala:177-199,
iterator → contiguous buffer → vectorized kernel), with Arrow batches
in place of the JNI buffer.

The codecs are REAL for uncompressed formats: binary PPM images and
RIFF/PCM WAV audio are parsed by dependency-free numpy parsers
(functions/codecs.py), and the declared queries transcode the text
corpus into genuine PPM/WAV payloads so the decode stages exercise a
true parse-validate-extract pipeline. Compressed codecs (JPEG/FLAC —
no PIL/libsndfile in this build) would slot in at the same call
sites; ``decode_image_batch`` raises NotImplementedError for payloads
that aren't PPM unless ``fake=True`` selects the deterministic stub.
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
    StringType,
    StructField,
    StructType,
)

from spark_rapids_ml_spark.functions.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
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
# decode / feature-extract plumbing (real PPM/WAV codecs)
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
    FAKE_H x FAKE_W uint8 'image'. Kept for tests of the plumbing."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = FAKE_W * FAKE_H
    tiled = np.resize(raw, need)  # cycles bytes deterministically
    return tiled.reshape(FAKE_H, FAKE_W)


def ppm_from_text(text: str, w: int = FAKE_W, h: int = FAKE_H) -> bytes:
    """Deterministically transcode a text row into a REAL binary PPM:
    tile the utf-8 bytes into an (h, w, 3) RGB raster and serialize
    with the P6 writer. The testdata has no image column, so the
    declared query manufactures genuine on-format payloads this way —
    the downstream decode is a real parse, not a stub."""
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return encode_ppm(np.resize(raw, w * h * 3).reshape(h, w, 3))


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of image payloads.

    Binary PPM (P6) decodes for real (pure-numpy parser,
    functions/codecs.py). Compressed codecs (PIL/opencv) are not in
    this build: non-PPM payloads raise unless the caller opts into the
    deterministic fake tiler."""
    out: list[np.ndarray] = []
    for p in payloads:
        p = bytes(p)
        if p[:2] == b"P6":
            out.append(decode_ppm(p))
        elif fake:
            out.append(_fake_decode(p))
        else:
            raise NotImplementedError(
                "compressed image codecs (PIL/opencv) not available in this "
                "build and payload is not an uncompressed P6 PPM; pass "
                "fake=True for the deterministic stub decoder"
            )
    return out


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
            imgs = decode_image_batch(pdf[payload_col])
            rows = []
            for i, img in enumerate(imgs):
                # feature = per-column mean; channel axis averaged for
                # RGB so the feature length is the image width
                col_mean = img.mean(axis=(0, 2)) if img.ndim == 3 else img.mean(axis=0)
                rows.append(
                    {
                        "doc_id": int(pdf[id_col].iloc[i]),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_px": float(img.mean()),
                        "std_px": float(img.std()),
                        "feature": col_mean.astype(np.float64).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


@register(
    "mm_image_decode_features",
    tags=("multimodal", "decode"),
    oracle="""
-- The PPM payload is a deterministic transcode of documents.text:
-- np.resize cycles the utf-8 bytes to 384 = 16*8*3 values, so pixel
-- k (flattened) is char code (k % n_chars). The text is pure ASCII
-- (verified across sfs), so ascii(substr(..)) IS the byte. All
-- means are exact-integer sums over fixed counts -> bit-identical
-- doubles across engines (emitted raw); std is the one inexact
-- value (two-pass vs var_pop), rounded to 6dp on both sides.
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
px AS (
  SELECT d.doc_id, g.k,
         ascii(substr(d.text, CAST(g.k % d.L AS INTEGER) + 1, 1)) AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, 383)) AS k) g
),
agg AS (
  SELECT doc_id,
         CAST(SUM(v) AS DOUBLE) AS s,
         CAST(SUM(v * v) AS DOUBLE) AS ss,
         CAST(SUM(CASE WHEN k % 48 < 3 THEN v END) AS DOUBLE) AS s_f0,
         CAST(SUM(CASE WHEN k % 48 >= 45 THEN v END) AS DOUBLE) AS s_f15
  FROM px GROUP BY doc_id
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       s / 384.0 AS mean_px,
       ROUND(SQRT((ss - s * s / 384.0) / 384.0), 6) AS std_px,
       s_f0 / 24.0 AS f0,
       s_f15 / 24.0 AS f15
FROM agg
ORDER BY doc_id
""",
)
def mm_image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-decode pipeline: each row's text is transcoded into
    a genuine binary PPM payload (Arrow-batched pandas_udf), and the
    decode stage parses the PPM format for real (header validation +
    raster reshape, functions/codecs.py) before feature extraction.
    The DuckDB oracle recomputes the features from the text directly
    (the transcode is deterministic integer arithmetic over char
    codes); tests/test_quality.py additionally asserts values against
    a local encode→decode numpy replay."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(ppm_from_text)

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_ppm("text").alias("payload"))
    feats = extract_image_features(payloads, "payload")
    # mean_px/f0/f15 are exact integer sums over fixed divisors ->
    # bit-identical doubles in numpy and the oracle: emit RAW (a
    # round() here could disagree on exact decimal ties, e.g. odd/128
    # multiples). std involves cancellation + sqrt: round both sides.
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.col("mean_px"),
        F.round("std_px", 6).alias("std_px"),
        F.element_at("feature", 1).alias("f0"),
        F.element_at("feature", 16).alias("f15"),
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


def wav_from_text(text: str, sample_rate: int = 8000) -> bytes:
    """Deterministically transcode a text row into a REAL 8-bit PCM
    WAV whose samples are the utf-8 bytes — genuine RIFF container,
    parsed (not assumed) by the frame-sampling stage."""
    return encode_wav(
        np.frombuffer(text.encode("utf-8"), dtype=np.uint8), sample_rate, bits=8
    )


def sample_audio_frames(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling stage (audio/video analogue of decode): parse
    each WAV payload (real RIFF/PCM parser, functions/codecs.py) and
    split the signal into fixed-length frames, one output row per
    frame — mapInPandas with a row-expanding output, the shape real
    frame-samplers (ffmpeg) need."""

    cols = [f.name for f in AUDIO_FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode, then fully vectorized framing: concatenate every
        # signal into one NaN-padded buffer, reshape to
        # (total_frames, FRAME_LEN), and compute all frame stats as
        # masked column-wise numpy ops — the only Python-level loop is
        # one O(1) slice-copy per row (forced by variable-length
        # signals), never per frame or per sample.
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            sigs = [decode_wav(bytes(b))[0] for b in pdf[payload_col]]
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


@register(
    "mm_audio_frame_sample",
    tags=("multimodal", "decode"),
    oracle="""
-- The WAV payload's 8-bit PCM samples ARE the utf-8 bytes of
-- documents.text; decode_wav centers them at 0 (byte - 128). Framing:
-- nf = max(1, len // 64), sub-frame tail dropped when len >= 64,
-- single NaN-padded frame when len < 64 (min corpus doc is 44 chars,
-- so that path is live). rms = sqrt(sum(v^2)/cnt) is EXACT integer
-- arithmetic until one division + sqrt -> bit-identical raw doubles.
-- Zero crossings count adjacent same-frame pairs with differing
-- sign(v), sign(0) = 0 (byte 128).
WITH d AS (
  SELECT doc_id, text,
         GREATEST(1, n_chars // 64) AS nf,
         LEAST(n_chars, GREATEST(1, n_chars // 64) * 64) AS take
  FROM documents WHERE doc_id <= 50
),
samp AS (
  SELECT d.doc_id,
         g.s // 64 AS frame_idx,
         g.s AS s,
         ascii(substr(d.text, CAST(g.s AS INTEGER) + 1, 1)) - 128 AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, d.take - 1)) AS s) g
),
sgn AS (
  SELECT doc_id, frame_idx, v,
         CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sg,
         LAG(CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END)
           OVER (PARTITION BY doc_id, frame_idx ORDER BY s) AS prev_sg
  FROM samp
)
SELECT doc_id,
       frame_idx,
       SQRT(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)) AS rms,
       CAST(SUM(CASE WHEN prev_sg IS NOT NULL AND sg <> prev_sg
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM sgn
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
""",
)
def mm_audio_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio pipeline: text rows transcoded to genuine 8-bit PCM
    WAV payloads, parsed by the RIFF/PCM decoder, then frame-sampled.
    The DuckDB oracle recomputes frames from the text bytes directly
    (the transcode is deterministic); numpy-replay assertions live in
    tests/test_quality.py."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        return texts.map(wav_from_text)

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    payloads = d.select("doc_id", to_wav("text").alias("payload"))
    frames = sample_audio_frames(payloads, "payload")
    # rms is exact-integer sum / cnt then sqrt: bit-identical to the
    # oracle's double, so emit RAW (rounding could hit decimal ties).
    return frames.select(
        "doc_id",
        "frame_idx",
        "rms",
        "zero_crossings",
    ).orderBy("doc_id", "frame_idx")


RESIZE_FACTOR = 2  # 2x nearest-neighbor downsample

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("mean_px_resized", DoubleType()),
    ]
)


def resize_nearest(img: np.ndarray, factor: int = RESIZE_FACTOR) -> np.ndarray:
    """Nearest-neighbor downsample by integer factor via strided
    slicing — the dependency-free resize kernel (PIL/cv2 would slot in
    here for fractional/antialiased resizes)."""
    return img[::factor, ::factor]


@register(
    "mm_image_resize",
    tags=("multimodal", "decode"),
    oracle="""
-- Same deterministic text->PPM transcode as mm_image_decode_features
-- (pixel k = char code (k % n_chars), 8x16x3 raster). The 2x
-- nearest-neighbor downsample keeps even rows i = k // 48 and even
-- cols j = (k % 48) // 3 -> 4*8*3 = 96 pixels. Both means are exact
-- integer sums over fixed divisors -> raw bit-identical doubles.
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
px AS (
  SELECT d.doc_id, g.k,
         ascii(substr(d.text, CAST(g.k % d.L AS INTEGER) + 1, 1)) AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, 383)) AS k) g
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS out_w,
       CAST(4 AS BIGINT) AS out_h,
       CAST(SUM(v) AS DOUBLE) / 384.0 AS mean_px,
       CAST(SUM(CASE WHEN (k // 48) % 2 = 0 AND ((k % 48) // 3) % 2 = 0
                     THEN v END) AS DOUBLE) / 96.0 AS mean_px_resized
FROM px
GROUP BY doc_id
ORDER BY doc_id
""",
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → RESIZE → feature pipeline: real PPM payloads are
    parsed and 2x-downsampled (nearest-neighbor) inside one
    mapInPandas stage — the thumbnail/preprocess step of an image
    pipeline, batch shape identical to a GPU resize kernel's. DuckDB
    oracle recomputes both means from the text transcode; numpy
    replay in tests/test_quality.py.

    Scale: linear, no shuffle; resize shrinks the payload 4x before
    any downstream exchange — do reductions AFTER cheap shrink stages.
    """

    @F.pandas_udf("binary")
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(ppm_from_text)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf["payload"])
            rows = []
            for i, img in enumerate(imgs):
                small = resize_nearest(img)
                rows.append(
                    {
                        "doc_id": int(pdf["doc_id"].iloc[i]),
                        "out_w": small.shape[1],
                        "out_h": small.shape[0],
                        "mean_px": float(img.mean()),
                        "mean_px_resized": float(small.mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_ppm("text").alias("payload"))
    out = payloads.mapInPandas(run, RESIZE_SCHEMA)
    # both means are exact integer sums / fixed divisors: emit RAW
    # doubles (bit-identical to the oracle; rounding risks ties).
    return out.select(
        "doc_id",
        "out_w",
        "out_h",
        "mean_px",
        "mean_px_resized",
    ).orderBy("doc_id")


VIDEO_MAGIC = b"VID0"
VIDEO_FRAMES = 8
VIDEO_STRIDE = 3  # sample frames 0, 3, 6

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("mean_px", DoubleType()),
    ]
)


def video_from_text(text: str, n_frames: int = VIDEO_FRAMES) -> bytes:
    """Deterministically transcode a text row into a REAL multi-frame
    video container: magic + uint32 frame count, then length-prefixed
    PPM frames where frame f's flattened pixel k is the char code at
    (k + f) % len — i.e. each frame is the same raster advanced by one
    byte, a deterministic stand-in for temporal motion. The container
    is genuinely parsed (magic + length walks) by the sampling stage."""
    import struct

    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    L = len(raw)
    out = [VIDEO_MAGIC, struct.pack("<I", n_frames)]
    for f in range(n_frames):
        rolled = np.concatenate([raw[f % L :], raw[: f % L]])
        frame = encode_ppm(np.resize(rolled, FAKE_W * FAKE_H * 3).reshape(FAKE_H, FAKE_W, 3))
        out.append(struct.pack("<I", len(frame)))
        out.append(frame)
    return b"".join(out)


def sample_video_frames(
    df: DataFrame, payload_col: str, id_col: str = "doc_id", stride: int = VIDEO_STRIDE
) -> DataFrame:
    """Frame-sampling stage for video columns: parse the container
    (magic check + length-prefixed frame walk), decode ONLY every
    stride-th frame through the real PPM parser, and reduce each to a
    feature — the decode-skipping access pattern a 100 TB video corpus
    requires (bytes of unsampled frames are never decoded).

    Scale: linear in payload bytes, no shuffle; per-batch work bounded
    by Arrow batch size x payload size, identical to the image tier.
    """
    import struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                buf = bytes(pdf[payload_col].iloc[i])
                if buf[:4] != VIDEO_MAGIC:
                    raise ValueError("bad video magic")
                (n_frames,) = struct.unpack_from("<I", buf, 4)
                off = 8
                for f in range(n_frames):
                    (flen,) = struct.unpack_from("<I", buf, off)
                    off += 4
                    if f % stride == 0:
                        img = decode_ppm(buf[off : off + flen])
                        rows.append(
                            {
                                "doc_id": int(pdf[id_col].iloc[i]),
                                "frame_idx": f,
                                "mean_px": float(img.mean()),
                            }
                        )
                    off += flen
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, VIDEO_FRAME_SCHEMA)


@register(
    "mm_video_frame_sample",
    tags=("multimodal", "decode"),
    oracle=f"""
-- frame f pixel k (flattened, 384 = 16*8*3 values) is the char code
-- at (k + f) % n_chars; sampled frames are 0, 3, 6 of 8. Means are
-- exact integer sums over 384 -> bit-identical doubles (emitted raw).
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
fr AS (SELECT unnest([0, 3, 6]) AS frame_idx),
px AS (
  SELECT d.doc_id, fr.frame_idx, g.k,
         ascii(substr(d.text, CAST((g.k + fr.frame_idx) % d.L AS INTEGER) + 1, 1)) AS v
  FROM d, fr, LATERAL (SELECT unnest(generate_series(0, 383)) AS k) g
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(SUM(v) AS DOUBLE) / 384.0 AS mean_px
FROM px
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
""",
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline: rows become genuine multi-frame containers
    (length-prefixed PPM frames under a magic header), and the
    sampling stage walks the container and decodes ONLY every 3rd
    frame — unsampled frame bytes are skipped, the access pattern that
    makes sampled processing of a 100 TB video corpus affordable. The
    DuckDB oracle recomputes the sampled-frame means from the text
    arithmetic, so container round-trip + selective decode are both
    hash-verified (cf. mm_image_decode_features, mm_audio_frame_sample
    for the image/audio tiers).
    """
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_video(texts: pd.Series) -> pd.Series:
        return texts.map(video_from_text)

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_video("text").alias("payload"))
    return sample_video_frames(payloads, "payload").orderBy("doc_id", "frame_idx")


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", StringType()),
        StructField("n_set_bits", LongType()),
    ]
)


@register(
    "mm_image_perceptual_hash",
    tags=("multimodal", "dedup"),
    oracle="""
-- average-hash over the decoded 16x8 RGB raster: per-pixel brightness
-- s_k = r+g+b where channel c of flattened pixel k is the char code
-- at (3k + c) % n_chars; bit_k = 1 iff s_k * 128 > S (total sum) —
-- all integer arithmetic, bit-exact cross-engine.
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
px AS (
  SELECT d.doc_id, g.k,
         ascii(substr(d.text, CAST((3 * g.k) % d.L AS INTEGER) + 1, 1))
       + ascii(substr(d.text, CAST((3 * g.k + 1) % d.L AS INTEGER) + 1, 1))
       + ascii(substr(d.text, CAST((3 * g.k + 2) % d.L AS INTEGER) + 1, 1)) AS s
  FROM d, LATERAL (SELECT unnest(generate_series(0, 127)) AS k) g
),
tot AS (SELECT doc_id, SUM(s) AS total FROM px GROUP BY doc_id),
bits AS (
  SELECT px.doc_id, px.k,
         CASE WHEN px.s * 128 > tot.total THEN '1' ELSE '0' END AS bit
  FROM px JOIN tot ON px.doc_id = tot.doc_id
)
SELECT doc_id,
       string_agg(bit, '' ORDER BY k) AS phash,
       CAST(SUM(CASE WHEN bit = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_set_bits
FROM bits
GROUP BY doc_id
ORDER BY doc_id
""",
)
def mm_image_perceptual_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over REAL decoded images — the bridge
    between the multimodal tier and the dedup tier: each payload is
    parsed by the PPM decoder, per-pixel brightness is compared to the
    image mean (integer-exact: s_k·128 > Σs), and the 128-bit
    signature is the near-duplicate key image dedup banding operates
    on (identical crops/re-encodes collide; the banded Hamming search
    of dedup_simhash_hamming_pairs applies unchanged to these
    signatures). The DuckDB oracle recomputes the bits from the text
    transcode arithmetic, so decode + hash are both value-checked.

    Scale: stateless mapInPandas over payload batches (no shuffle);
    the signature table is what ships to the dedup join — 16 bytes a
    row instead of the image.
    """
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(ppm_from_text)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                img = decode_ppm(bytes(pdf["payload"].iloc[i]))
                s = img.astype(np.int64).sum(axis=2).reshape(-1)  # per-pixel r+g+b
                total = int(s.sum())
                bits = (s * s.size > total).astype(np.uint8)
                rows.append(
                    {
                        "doc_id": int(pdf["doc_id"].iloc[i]),
                        "phash": "".join("1" if b else "0" for b in bits),
                        "n_set_bits": int(bits.sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PHASH_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_ppm("text").alias("payload"))
    return payloads.mapInPandas(run, PHASH_SCHEMA).orderBy("doc_id")


_TENSOR_BATCH = 64  # vectors per exported tensor batch
_TENSOR_DIM = 64  # embedding dim (testdata contract)


@register(
    "mm_tensor_export_batches",
    tags=("multimodal", "llm-pipe", "sink", "scale"),
    oracle=f"""
SELECT vec_id // {_TENSOR_BATCH} AS batch_id,
       COUNT(*) AS n_rows,
       CAST(COUNT(*) * {_TENSOR_DIM} * 4 AS BIGINT) AS n_bytes,
       CAST(SUM(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                        x -> floor(x * 1000)))) AS BIGINT) AS checksum
FROM embeddings
GROUP BY 1
ORDER BY batch_id
""",
)
def mm_tensor_export_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-tensor export — the LAST stage of a data pipeline:
    embeddings are packed into fixed-shape float32 tensor batches
    (the bytes a training loader mmaps), batch membership keyed by
    vec_id div 64 so the batching is deterministic and shuffle-local
    (no global sort). Each applyInPandas group materializes the
    actual (n, 64) float32 buffer via numpy .tobytes(), then
    re-reads THAT buffer (np.frombuffer) to report byte length and
    an integer content checksum (sum of floor(v*1000)) — so the hash
    oracle verifies the exported bytes, not just the row bookkeeping.

    Scale: one shuffle on batch_id (at 100 TB: range-partition by id
    so consecutive batches co-locate into right-sized output files);
    each group is a bounded 64x64 buffer; float32→float64 widening
    is exact, and floor() keeps the checksum engine-identical.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") / _TENSOR_BATCH).cast("bigint").alias("batch_id")
    )
    schema = StructType(
        [
            StructField("batch_id", LongType()),
            StructField("n_rows", LongType()),
            StructField("n_bytes", LongType()),
            StructField("checksum", LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        tensor = np.stack([np.asarray(v, dtype=np.float32) for v in pdf["embedding"]])
        buf = tensor.tobytes()  # the exported training batch
        back = np.frombuffer(buf, dtype=np.float32).reshape(tensor.shape)
        checksum = int(np.floor(back.astype(np.float64) * 1000).sum())
        return pd.DataFrame(
            {
                "batch_id": [int(pdf["batch_id"].iloc[0])],
                "n_rows": [len(pdf)],
                "n_bytes": [len(buf)],
                "checksum": [checksum],
            }
        )

    return (
        e.groupBy("batch_id").applyInPandas(pack, schema).orderBy("batch_id")
    )


AUG_CROP_W = 8  # crop the left half of the flipped raster

AUG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("mean_aug", DoubleType()),
        StructField("weighted_checksum", LongType()),
    ]
)


@register(
    "mm_image_augment_flip_crop",
    tags=("multimodal", "decode", "llm-pipe"),
    oracle=f"""
-- Same text->PPM transcode as mm_image_decode_features (8x16x3,
-- pixel k = char code (k % n_chars)). The augmentation is horizontal
-- flip (col j -> 15-j) then an ASYMMETRIC crop of the flipped left
-- half (original cols 15..8), so the flip is observable; the
-- position-weighted checksum pins pixel ORDER, not just the bag of
-- values. Augmented flat index n in an (8, {AUG_CROP_W}, 3) raster
-- maps to original k = row*48 + (15 - col)*3 + ch.
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
px AS (
  SELECT d.doc_id, g.n,
         ascii(substr(d.text,
           CAST(((g.n // {AUG_CROP_W * 3}) * 48
                 + (15 - ((g.n % {AUG_CROP_W * 3}) // 3)) * 3
                 + (g.n % 3)) % d.L AS INTEGER) + 1, 1)) AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, {8 * AUG_CROP_W * 3 - 1})) AS n) g
)
SELECT doc_id,
       CAST({AUG_CROP_W} AS BIGINT) AS out_w,
       CAST(8 AS BIGINT) AS out_h,
       CAST(SUM(v) AS DOUBLE) / {8 * AUG_CROP_W * 3}.0 AS mean_aug,
       CAST(SUM(v * n) AS BIGINT) AS weighted_checksum
FROM px
GROUP BY doc_id
ORDER BY doc_id
""",
)
def mm_image_augment_flip_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation (horizontal flip + asymmetric crop)
    over REAL decoded rasters — the train-time transform stage of an
    image data pipeline, run where augmentation belongs at scale: in
    the same mapInPandas batch as the decode, before any shuffle.
    The crop is the LEFT half of the FLIPPED image (original right
    half, mirrored), and the output carries a position-weighted
    checksum so the hash pins pixel ORDER — a flip that forgot to
    reverse, or a crop of the wrong half, changes the checksum even
    when the pixel bag is identical. Random aug at training time is
    this exact kernel with a seeded per-(epoch, doc) RNG choosing the
    params — the deterministic fixture pins the geometry.

    Scale: linear, zero shuffle, payload shrinks 2x before any
    downstream exchange (same discipline as mm_image_resize);
    real codec in, integer-exact features out.
    """

    @F.pandas_udf("binary")
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(ppm_from_text)

    weights = np.arange(8 * AUG_CROP_W * 3, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf["payload"])
            rows = []
            for i, img in enumerate(imgs):
                aug = img[:, ::-1, :][:, :AUG_CROP_W, :]  # flip then crop
                flat = aug.reshape(-1).astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(pdf["doc_id"].iloc[i]),
                        "out_w": aug.shape[1],
                        "out_h": aug.shape[0],
                        "mean_aug": float(flat.sum()) / flat.size,
                        "weighted_checksum": int((flat * weights).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUG_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_ppm("text").alias("payload"))
    return payloads.mapInPandas(run, AUG_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# tile impurity (image-complexity scoring)
# ---------------------------------------------------------------------------

TILE_ROWS, TILE_COLS = 2, 2  # 2x2 grid over the 16x8 raster
TILE_BUCKETS = 8  # brightness (r+g+b in 0..767 inclusive-range 768) bins
_TILE_DIV = 768 // TILE_BUCKETS  # 96: bucket = brightness // _TILE_DIV
_TILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tile", LongType()),
        StructField("n_px", LongType()),
        StructField("impurity_micro", LongType()),
    ]
)


@register(
    "mm_image_tile_impurity",
    tags=("multimodal", "quality"),
    oracle=f"""
-- per-tile Gini impurity of brightness buckets over the decoded
-- 16x8 raster: pixel k sits in tile (row//4)*2 + (col//8); brightness
-- bucket = (r+g+b)//{_TILE_DIV}; impurity_micro = 1e6*(n^2 - SUM(c^2))//n^2 —
-- pure integer arithmetic, bit-exact cross-engine.
WITH d AS (
  SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100
),
px AS (
  SELECT d.doc_id, g.k,
         ((g.k // 16) // 4) * {TILE_COLS} + ((g.k % 16) // 8) AS tile,
         (ascii(substr(d.text, CAST((3 * g.k) % d.L AS INTEGER) + 1, 1))
        + ascii(substr(d.text, CAST((3 * g.k + 1) % d.L AS INTEGER) + 1, 1))
        + ascii(substr(d.text, CAST((3 * g.k + 2) % d.L AS INTEGER) + 1, 1))) // {_TILE_DIV} AS bucket
  FROM d, LATERAL (SELECT unnest(generate_series(0, 127)) AS k) g
),
cnt AS (SELECT doc_id, tile, bucket, COUNT(*) AS c FROM px GROUP BY 1, 2, 3),
imp AS (
  SELECT doc_id, tile, SUM(c) AS n, SUM(c * c) AS sc2
  FROM cnt GROUP BY doc_id, tile
)
SELECT doc_id, CAST(tile AS BIGINT) AS tile, CAST(n AS BIGINT) AS n_px,
       CAST((1000000 * (n * n - sc2)) // (n * n) AS BIGINT) AS impurity_micro
FROM imp ORDER BY doc_id, tile
""",
)
def mm_image_tile_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-level image complexity: the 16×8 decoded raster splits
    into a 2×2 tile grid; each tile scores the Gini impurity of its
    brightness-bucket histogram (1 − Σpᵢ², in micro fixed-point via
    exact integers). Flat tiles (sky, padding, letterboxes) score near
    0, busy tiles near 1 — the per-region complexity signal a
    multimodal curation pipeline uses to drop blank/boilerplate
    regions before captioning or OCR, and the deterministic stand-in
    for the entropy score (log2 is a libm call; Gini is rational).

    Scale: the decode is stateless mapInPandas over payload batches
    (real P6 parse, no shuffle); only (doc, tile, n, impurity) rows —
    4 per image — leave the stage. The DuckDB oracle recomputes every
    bucket count from the text-transcode arithmetic, so decode, tiling
    and histogram are all value-checked.
    """
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(ppm_from_text)

    th, tw = FAKE_H // TILE_ROWS, FAKE_W // TILE_COLS  # 4 x 8 tiles

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                img = decode_ppm(bytes(pdf["payload"].iloc[i]))
                s = img.astype(np.int64).sum(axis=2)  # (h, w) brightness
                buckets = s // _TILE_DIV
                for tr in range(TILE_ROWS):
                    for tc in range(TILE_COLS):
                        tb = buckets[tr * th : (tr + 1) * th, tc * tw : (tc + 1) * tw]
                        n = tb.size
                        _vals, cts = np.unique(tb, return_counts=True)
                        sc2 = int((cts.astype(np.int64) ** 2).sum())
                        rows.append(
                            {
                                "doc_id": int(pdf["doc_id"].iloc[i]),
                                "tile": tr * TILE_COLS + tc,
                                "n_px": n,
                                "impurity_micro": (1_000_000 * (n * n - sc2)) // (n * n),
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _TILE_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_ppm("text").alias("payload"))
    return payloads.mapInPandas(run, _TILE_SCHEMA).orderBy("doc_id", "tile")


# ---------------------------------------------------------------------------
# energy segmentation (VAD shape)
# ---------------------------------------------------------------------------

SEG_FRAME = 64  # samples per analysis frame (matches mm_audio_frame_sample)
_SEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_voiced", LongType()),
        StructField("n_segments", LongType()),
        StructField("longest_run", LongType()),
    ]
)


@register(
    "mm_audio_energy_segments",
    tags=("multimodal", "decode"),
    oracle=f"""
-- VAD-style segmentation over the decoded PCM: frame energy is the
-- exact integer SUM(v^2); a frame is VOICED iff its energy exceeds
-- the doc's mean frame energy (energy * nf > total — integer cross-
-- multiplication, no division); voiced runs found by gap-and-islands.
WITH d AS (
  SELECT doc_id, text,
         GREATEST(1, n_chars // {SEG_FRAME}) AS nf,
         LEAST(n_chars, GREATEST(1, n_chars // {SEG_FRAME}) * {SEG_FRAME}) AS take
  FROM documents WHERE doc_id <= 50
),
samp AS (
  SELECT d.doc_id, g.s // {SEG_FRAME} AS frame_idx,
         ascii(substr(d.text, CAST(g.s AS INTEGER) + 1, 1)) - 128 AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, d.take - 1)) AS s) g
),
fe AS (SELECT doc_id, frame_idx, SUM(v * v) AS energy FROM samp GROUP BY 1, 2),
tote AS (SELECT doc_id, SUM(energy) AS tot, COUNT(*) AS nf FROM fe GROUP BY doc_id),
flag AS (
  SELECT f.doc_id, f.frame_idx, (f.energy * t.nf > t.tot) AS voiced
  FROM fe f JOIN tote t USING (doc_id)
),
isl AS (
  SELECT doc_id, frame_idx, voiced,
         frame_idx - ROW_NUMBER() OVER (PARTITION BY doc_id, voiced ORDER BY frame_idx) AS grp
  FROM flag
),
runs AS (
  SELECT doc_id, COUNT(*) AS run_len FROM isl WHERE voiced GROUP BY doc_id, grp
)
SELECT t.doc_id, CAST(t.nf AS BIGINT) AS n_frames,
       CAST(COALESCE((SELECT SUM(run_len) FROM runs r WHERE r.doc_id = t.doc_id), 0) AS BIGINT) AS n_voiced,
       CAST(COALESCE((SELECT COUNT(*) FROM runs r WHERE r.doc_id = t.doc_id), 0) AS BIGINT) AS n_segments,
       CAST(COALESCE((SELECT MAX(run_len) FROM runs r WHERE r.doc_id = t.doc_id), 0) AS BIGINT) AS longest_run
FROM tote t ORDER BY t.doc_id
""",
)
def mm_audio_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation over REAL decoded audio: the
    RIFF/PCM payload is parsed, framed at SEG_FRAME (64) samples, and a
    frame is VOICED iff its exact integer energy Σv² exceeds the doc's
    mean frame energy (compared by integer cross-multiplication — no
    division, no FP). Voiced runs collapse to per-doc segment stats
    (count, coverage, longest run) — the trim/silence-split decision a
    speech-data pipeline makes before transcription, and the audio
    sibling of mm_image_tile_impurity's region scoring.

    Scale: decode + framing + the in-doc island scan all happen inside
    one stateless mapInPandas batch (a doc's frame list is bounded by
    its own length); only the 5-number summary per doc leaves the
    stage. The oracle recomputes frames from the text-transcode bytes
    and finds runs with SQL gap-and-islands — decode, energy rule and
    segmentation are all value-checked.
    """
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        return texts.map(wav_from_text)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                sig, _sr = decode_wav(bytes(pdf["payload"].iloc[i]))
                v = sig.astype(np.int64)
                nf = max(1, len(v) // SEG_FRAME)
                take = min(len(v), nf * SEG_FRAME)
                v = v[:take]
                if len(v) < nf * SEG_FRAME:  # short doc: single padded frame
                    e = np.array([int((v * v).sum())], dtype=np.int64)
                else:
                    e = (v * v).reshape(nf, SEG_FRAME).sum(axis=1)
                tot = int(e.sum())
                voiced = e * nf > tot
                n_voiced = int(voiced.sum())
                n_seg = longest = cur = 0
                for fl in voiced:
                    if fl:
                        cur += 1
                        if cur == 1:
                            n_seg += 1
                        longest = max(longest, cur)
                    else:
                        cur = 0
                rows.append(
                    {
                        "doc_id": int(pdf["doc_id"].iloc[i]),
                        "n_frames": int(nf),
                        "n_voiced": n_voiced,
                        "n_segments": n_seg,
                        "longest_run": longest,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _SEG_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    payloads = d.select("doc_id", to_wav("text").alias("payload"))
    return payloads.mapInPandas(run, _SEG_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# shot-boundary analysis (frame differencing)
# ---------------------------------------------------------------------------

_SAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("max_sad_frame", LongType()),
        StructField("max_sad", LongType()),
        StructField("min_sad", LongType()),
        StructField("total_sad", LongType()),
    ]
)


@register(
    "mm_video_shot_boundary",
    tags=("multimodal", "decode"),
    oracle="""
-- SAD (sum of absolute differences) between consecutive decoded
-- frames: frame f's raster byte j is the char code at
-- ((j % L) + f) % L (the container transcode's roll-by-f), so the
-- oracle recomputes every per-pair SAD with pure integer arithmetic.
WITH d AS (SELECT doc_id, text, n_chars AS L FROM documents WHERE doc_id <= 100),
sad AS (
  SELECT d.doc_id, fr.f,
         SUM(ABS(ascii(substr(d.text, CAST(((g.j % d.L) + fr.f) % d.L AS INTEGER) + 1, 1))
               - ascii(substr(d.text, CAST(((g.j % d.L) + fr.f - 1) % d.L AS INTEGER) + 1, 1)))) AS sad
  FROM d
  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS f) fr
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, 383)) AS j) g
  GROUP BY d.doc_id, fr.f
),
pick AS (
  SELECT doc_id, f, sad,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sad DESC, f) AS rk
  FROM sad
),
tot AS (SELECT doc_id, SUM(sad) AS total_sad, MIN(sad) AS min_sad FROM sad GROUP BY doc_id)
SELECT t.doc_id, CAST(8 AS BIGINT) AS n_frames,
       CAST(p.f AS BIGINT) AS max_sad_frame,
       CAST(p.sad AS BIGINT) AS max_sad,
       CAST(t.min_sad AS BIGINT) AS min_sad,
       CAST(t.total_sad AS BIGINT) AS total_sad
FROM tot t JOIN pick p ON t.doc_id = p.doc_id AND p.rk = 1
ORDER BY t.doc_id
""",
)
def mm_video_shot_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary analysis over the REAL video container: every
    frame is decoded (full container walk, unlike the stride-sampling
    tier) and consecutive frames are compared by SAD — the sum of
    absolute per-byte differences, the classic cut-detection metric —
    reported as the per-doc argmax candidate boundary (deterministic
    smallest-frame tie-break) plus min/total SAD, the statistics a
    curation pipeline thresholds to pick keyframes for captioning.
    All integer arithmetic; the oracle recomputes every SAD from the
    transcode's roll-by-f byte rule, so container walk + decode +
    differencing are all value-checked.

    Scale: stateless mapInPandas over payload batches; frame diffs
    happen inside the batch in numpy and only 6 numbers per doc leave
    the stage. The sampling tier (mm_video_frame_sample) handles the
    cheap pass; this is the dense pass run on the sampled subset.
    """
    import struct

    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def to_video(texts: pd.Series) -> pd.Series:
        return texts.map(video_from_text)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                buf = bytes(pdf["payload"].iloc[i])
                if buf[:4] != VIDEO_MAGIC:
                    raise ValueError("bad video magic")
                (n_frames,) = struct.unpack_from("<I", buf, 4)
                off = 8
                frames = []
                for _f in range(n_frames):
                    (flen,) = struct.unpack_from("<I", buf, off)
                    off += 4
                    frames.append(decode_ppm(buf[off : off + flen]).astype(np.int64))
                    off += flen
                sads = [
                    int(np.abs(frames[f] - frames[f - 1]).sum())
                    for f in range(1, n_frames)
                ]
                arr = np.array(sads)
                best = int(arr.argmax()) + 1  # ties: argmax takes first = smallest f
                rows.append(
                    {
                        "doc_id": int(pdf["doc_id"].iloc[i]),
                        "n_frames": n_frames,
                        "max_sad_frame": best,
                        "max_sad": int(arr.max()),
                        "min_sad": int(arr.min()),
                        "total_sad": int(arr.sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _SAD_SCHEMA.fields])

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    payloads = d.select("doc_id", to_video("text").alias("payload"))
    return payloads.mapInPandas(run, _SAD_SCHEMA).orderBy("doc_id")
