"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode libraries (PIL/librosa/ffmpeg) are not in this container, so the
decode kernel is STUBBED behind ``decode_image_stub`` — a deterministic fake
that unpacks bytes into a fixed-shape feature vector. Everything around it
(binary schema, mapInPandas batching, partition sizing, output schema) is
the real production plumbing: swapping the stub for a real decoder changes
one function body and nothing else.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..queries import load, register

FEATURE_DIM = 8


def as_media_table(docs: DataFrame) -> DataFrame:
    """Model documents as media blobs: an opaque binary payload + typed
    metadata columns — the canonical multimodal layout (blob stays opaque,
    metadata is queryable/skippable)."""
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        F.octet_length("text").alias("n_bytes"),
        F.lit("application/fake-image").alias("mime_type"),
        (F.octet_length("text") % 640).alias("width"),
        (F.octet_length("text") % 480).alias("height"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           'application/fake-image' AS mime_type,
           strlen(text) % 640 AS width,
           strlen(text) % 480 AS height
    FROM documents
    """,
    description="binary media table: opaque payload + typed metadata columns "
    "(metadata queries never touch the blob → column pruning wins)",
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf: str) -> DataFrame:
    return as_media_table(load(spark, sf, "documents")).drop("payload")


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode kernel. Production would be e.g.:

        img = PIL.Image.open(io.BytesIO(payload)).resize((224, 224))
        return np.asarray(img, dtype=np.float32) / 255.0

    PIL is not installed in this container (NotImplementedError on the real
    path); the deterministic fake folds bytes into FEATURE_DIM buckets so
    the full pipeline remains testable end-to-end.
    """
    if not payload:
        payload = b"\x00"  # empty blob decodes as one zero byte, not NaN
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    # float64 throughout: byte sums are exact integers in double, so the
    # feature means are engine-reproducible (the DuckDB oracle recomputes
    # them from codepoints) — a float32 accumulator would drift in the
    # 7th digit and break the cross-engine hash
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def resize_stub(payload: bytes, width: int = 224, height: int = 224) -> bytes:
    """STUB resize kernel (production: PIL ``Image.open(...).resize((w, h))``
    re-encoded; PIL absent in this container). The deterministic fake
    tiles/truncates bytes to exactly width*height so downstream batch
    shapes are production-real."""
    target = width * height
    reps = -(-target // max(len(payload), 1))
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """mapInPandas resize: payload → fixed-size payload + updated metadata
    (the third multimodal kernel alongside decode and frame-sample)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                resize_stub(p, width, height) for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = width * height
            yield out

    return media.mapInPandas(run, schema=media.schema)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow-batched, one Python process
    per task, batch size bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch so decoded images never blow executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(p).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


@register(
    "multimodal_features",
    oracle="""
    WITH a AS (
      SELECT doc_id, text, strlen(text) AS n FROM documents
      WHERE NOT regexp_matches(text, '[^ -~]') AND strlen(text) >= 1
    ), s AS (
      SELECT doc_id, n,
             CAST(list_sum(list_transform(generate_series(1, n),
                                          i -> ascii(text[i])))
                  AS DOUBLE) AS bsum
      FROM a
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           round(bsum / ceil(n / 8.0) / 255.0, 6) AS feature_sum
    FROM s
    """,
    description="binary→feature extraction via mapInPandas (stub decode "
    "kernel, real Arrow batching/schema/partitioning). The stub folds "
    "payload bytes into 8 column means, so sum(features) reduces to "
    "total_byte_sum / ceil(n/8) / 255 — which DuckDB recomputes from "
    "codepoints, making the Arrow round-trip itself hash-checked. Both "
    "engines restrict to ASCII-printable docs so byte == codepoint "
    "(the frame-sample oracle already relies on the same invariant).",
    tags=("multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").where(
        (~F.col("text").rlike("[^ -~]")) & (F.length("text") >= 1)
    )
    media = as_media_table(docs)
    feats = extract_features(media)
    # summarize to keep driver-side comparison small and schema stable
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda a, v: a + v.cast("double")
            ),
            6,
        ).alias("feature_sum"),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Video-style frame sampling analogue: slice the payload into fixed
    windows and keep every Nth — demonstrates offset-windowed binary
    processing without decoding (substring on BinaryType is JVM-side)."""
    n_frames = F.floor(F.col("n_bytes") / every_n_bytes).cast("int")
    # guard: sequence(0, -1) would produce a DESCENDING [0, -1] sequence
    # for payloads shorter than one frame — emit no frames instead
    frames = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    return media.select(
        "doc_id",
        F.explode(frames).alias("frame_idx"),
        F.col("payload")
        .substr(F.lit(1) + F.col("frame_idx") * every_n_bytes, F.lit(16))
        .alias("frame_bytes"),
    ).where(F.col("frame_idx") % 2 == 0)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (SELECT doc_id, text, strlen(text) AS n_bytes FROM documents)
    SELECT doc_id, frame_idx,
           hex(encode(substring(text, CAST(1 + frame_idx * 100 AS INT), 16)))
             AS frame_hex
    FROM m, UNNEST(generate_series(0,
                CAST(floor(n_bytes / 100) AS INT) - 1)) AS t(frame_idx)
    WHERE floor(n_bytes / 100) > 0 AND frame_idx % 2 = 0
    """,
    description="video-style frame sampling: fixed-offset binary windows, "
    "every 2nd kept — pure JVM substr on BinaryType, no decode; emitted as "
    "hex so the driver's pandas canonicalizer can hash it (bytearray cells "
    "are unhashable); frame_sample() keeps the binary-native API",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = as_media_table(load(spark, sf, "documents"))
    frames = frame_sample(media, every_n_bytes=100)
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame_bytes").alias("frame_hex")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (pHash): the image analogue of SimHash text
# dedup. Decode is the container-stubbed step; the DCT / median-threshold /
# bit-pack math below is the real pHash algorithm, numpy-vectorized per
# Arrow batch.
# ---------------------------------------------------------------------------

_PHASH_SIDE = 32  # decode target: 32x32 grayscale
_PHASH_BITS = 63  # 8x8 low-frequency block minus the DC coefficient
_dct_cache: dict[int, np.ndarray] = {}


def _dct_matrix(n: int = _PHASH_SIDE) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    if n not in _dct_cache:
        k = np.arange(n, dtype=np.float64)
        d = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n)
        )
        d[0] /= np.sqrt(2.0)
        _dct_cache[n] = d
    return _dct_cache[n]


def _decode_gray_stub(payload: bytes) -> np.ndarray:
    """STUB decode: tile/truncate bytes to a 32x32 grayscale image.
    Production would be PIL open → convert('L') → resize((32, 32));
    PIL is absent in this container. Deterministic, so identical payloads
    hash identically and the full dedup path is testable."""
    if not payload:
        payload = b"\x00"  # tiling an empty blob would stay empty
    target = _PHASH_SIDE * _PHASH_SIDE
    reps = -(-target // len(payload))
    return (
        np.frombuffer((payload * reps)[:target], dtype=np.uint8)
        .astype(np.float64)
        .reshape(_PHASH_SIDE, _PHASH_SIDE)
    )


def phash_batch(payloads) -> np.ndarray:
    """pHash a batch of payloads → int64[n]. One einsum pair does the 2-D
    DCT for the whole batch (D @ img @ D^T per image); bits are the 8x8
    low-frequency block (minus DC) thresholded at its own median."""
    imgs = np.stack([_decode_gray_stub(p) for p in payloads])
    d = _dct_matrix()
    low = np.einsum("ij,njk,lk->nil", d[:8], imgs, d[:8], optimize=True)
    block = low.reshape(len(imgs), 64)[:, 1:]  # drop DC term
    med = np.median(block, axis=1, keepdims=True)
    bits = block > med
    powers = (np.int64(1) << np.arange(_PHASH_BITS, dtype=np.int64))
    return (bits.astype(np.int64) * powers).sum(axis=1)


PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def phash_media(media: DataFrame) -> DataFrame:
    """payload → 63-bit perceptual hash via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": phash_batch(pdf["payload"].to_numpy()),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


@register(
    "multimodal_phash_pairs",
    oracle=None,  # numpy DCT kernel; determinism + separation in tests
    description="perceptual-hash (pHash) image near-dup pairs: stub decode "
    "to 32x32 grayscale, real DCT-II + median-threshold 63-bit hash, then "
    "pigeonhole LSH — 7 blocks of 9 bits (Hamming<=6 implies >=1 equal "
    "block), join on (block_idx, block_val), exact Hamming via "
    "bit_count(xor). Bucketed candidate generation, never all-pairs — the "
    "same scale shape as dedup_simhash, so a 100 TB image corpus shuffles "
    "only (block, hash, id) tuples.",
    tags=("multimodal", "dedup", "pandas_udf", "llm-pipeline"),
)
def multimodal_phash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # deterministic duplicate injection (same device as doc_pii_scrub):
    # generated payloads have no near-dups at small scale factors, which
    # made this query return 0 rows — proving nothing about the pair
    # path. Clone every 97th doc under doc_id + 10^12 — far above any
    # plausible generated doc_id (even sf=100 stays under 10^9), so clone
    # ids can never collide with real ones; production callers use
    # phash_media + the block join on their own media table unseeded.
    clones = docs.where(F.col("doc_id") % 97 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000_000_000)
    )
    media = as_media_table(docs.unionByName(clones))
    fps = phash_media(media)
    n_blocks, bits_per = 7, 9
    blocks = fps.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", bits_per * b).bitwiseAND(
                        F.lit((1 << bits_per) - 1)
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    a = blocks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("fp_a"),
        "block_idx",
        "block_val",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("fp_b"),
        "block_idx",
        "block_val",
    )
    cand = (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )
