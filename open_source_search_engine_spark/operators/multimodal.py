"""Multimodal columns — image/audio/video as opaque ``binary`` with
typed metadata (training-data-pipeline component; no analog in the
reference, which is text-only — Gigablast stores images only as
thumbnails inside TitleRecs, XmlDoc.cpp thumbnail code, unused here).

Design for 100 TB: blobs ride through scans untouched (parquet binary
columns, column-pruned away unless selected); metadata extraction is
pure column algebra; decode/feature work happens in Arrow-batched
``mapInPandas`` so Python touches whole batches, never rows.

The actual image/audio codecs are NOT in this container, so
``decode_image`` is a clearly-marked stub (NotImplementedError unless
PIL appears) and ``extract_features`` uses a deterministic fake
"decoder" (bytes → normalized float vector) — the Spark-side plumbing
(schemas, batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 32


def blob_meta(media: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """(id, n_bytes, sha256) per blob — pure JVM column ops."""
    return media.select(
        F.col(id_col),
        F.octet_length(F.col(blob_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(blob_col), 256).alias("sha256"),
    ).orderBy(id_col)


def frame_sample(
    media: DataFrame,
    every: int = 2,
    frame_bytes: int = FRAME_BYTES,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from each blob
    (video-frame-sampling shape). Pure column algebra: sequence +
    explode + substring — no Python, fully codegen, and the explode
    parallelizes frames across tasks at scale."""
    n_frames = F.floor((F.octet_length(F.col(blob_col)) - 1) / frame_bytes) + 1
    idx = F.explode(
        F.filter(
            F.sequence(F.lit(0), n_frames.cast("int") - 1),
            lambda i: i % every == 0,
        )
    ).alias("frame_idx")
    out = media.select(F.col(id_col), F.col(blob_col), idx)
    return out.select(
        id_col,
        "frame_idx",
        F.substring(
            F.col(blob_col), F.col("frame_idx") * frame_bytes + 1, frame_bytes
        ).alias("frame"),
    ).orderBy(id_col, "frame_idx")


THUMB_BYTES = 8
THUMB_STRIDE = 4


def byte_thumbnail(
    media: DataFrame,
    n_out: int = THUMB_BYTES,
    stride: int = THUMB_STRIDE,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Decode-free 'resize': sample every ``stride``-th byte of the
    blob into an ``n_out``-byte thumbnail — the downsampling PLUMBING
    (schema, stride math, codegen column ops) a real image resize
    slots into once codecs exist (decode_image stub). Positions past
    the blob end contribute nothing (short blobs give short thumbs),
    mirroring substr semantics in both engines."""
    parts = [
        F.substring(F.col(blob_col), 1 + j * stride, 1) for j in range(n_out)
    ]
    return media.select(
        F.col(id_col), F.concat(*parts).alias("thumb")
    ).orderBy(id_col)


def decode_image(media: DataFrame, blob_col: str = "blob") -> DataFrame:
    """STUB — real image decode needs PIL/opencv, absent in this
    container. The mapInPandas shape below is the production plumbing;
    only the marked line changes when a codec is available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow; container has no image codecs "
            "(stub per project brief — Spark plumbing is in extract_features)"
        ) from exc
    raise NotImplementedError("wire PIL decode into extract_features")  # pragma: no cover


def extract_features(
    media: DataFrame,
    dim: int = 8,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Deterministic fake 'decoder': first ``dim`` bytes of each blob,
    zero-padded, scaled to [0,1]. Arrow-batched mapInPandas — the
    exact harness a real (PIL/ffmpeg) feature extractor plugs into."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            mat = np.zeros((len(pdf), dim), dtype=np.float32)
            for i, b in enumerate(blobs):  # bounded by batch; bytes ops are C
                head = np.frombuffer(bytes(b)[:dim], dtype=np.uint8)
                mat[i, : head.size] = head / 255.0
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "features": list(mat)}
            )

    return media.select(id_col, blob_col).mapInPandas(
        it, f"{id_col} long, features array<float>"
    )


def driver_queries():
    def _media(s, d):
        return (
            s.read.parquet(f"{d}/documents.parquet")
            .select(
                F.col("doc_id").alias("media_id"),
                F.encode(F.col("text"), "utf-8").alias("blob"),
            )
        )

    return {
        "multimodal_blob_meta": lambda s, d: blob_meta(_media(s, d)),
        "multimodal_frame_sample": lambda s, d: frame_sample(_media(s, d), every=2)
        .withColumn("frame", F.decode(F.col("frame"), "utf-8")),
        "multimodal_thumbnail": lambda s, d: byte_thumbnail(_media(s, d))
        .withColumn("thumb", F.decode(F.col("thumb"), "utf-8")),
        # exploded (media_id, dim_idx, value): driver-hashable (the
        # raw array<float> column broke the driver's canonical sort),
        # and — because the fixture text is pure ASCII — expressible in
        # DuckDB too (byte i == ord(char i)), giving the feature stub a
        # real value oracle instead of a rows-only check
        "multimodal_features": lambda s, d: extract_features(_media(s, d))
        .select("media_id", F.posexplode("features").alias("dim_idx", "value"))
        .select(
            "media_id",
            "dim_idx",
            F.round(F.col("value").cast("double"), 5).alias("value"),
        )
        .orderBy("media_id", "dim_idx"),
    }


def driver_oracles():
    return {
        "multimodal_blob_meta": f"""
SELECT doc_id AS media_id,
       strlen(text)::BIGINT AS n_bytes,
       sha256(text) AS sha256
FROM documents ORDER BY media_id""",
        "multimodal_frame_sample": f"""
WITH f AS (
  SELECT doc_id AS media_id,
         unnest(generate_series(0, ((strlen(text) - 1) // {FRAME_BYTES})::INT)) AS frame_idx,
         text
  FROM documents
)
SELECT media_id, frame_idx,
       substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
FROM f WHERE frame_idx % 2 = 0
ORDER BY media_id, frame_idx""",
        "multimodal_thumbnail": f"""
SELECT doc_id AS media_id,
       {" || ".join(f"substr(text, {1 + j * THUMB_STRIDE}, 1)" for j in range(THUMB_BYTES))} AS thumb
FROM documents ORDER BY media_id""",
        # fake-decoder oracle: blob byte i of the utf-8-encoded text ==
        # ord(char i) because the fixture is pure ASCII (verified:
        # text == encode(text) for every row); float32/255 rounds to
        # the same 5 dp as float64/255 for all 256 byte values
        "multimodal_features": """
WITH f AS (
  SELECT doc_id AS media_id, unnest(range(0, 8))::INT AS dim_idx, text
  FROM documents
)
SELECT media_id, dim_idx,
       ROUND(CASE WHEN dim_idx < strlen(text)
                  THEN ord(substr(text, dim_idx + 1, 1)) / 255.0
                  ELSE 0.0 END, 5) AS value
FROM f ORDER BY media_id, dim_idx""",
    }
