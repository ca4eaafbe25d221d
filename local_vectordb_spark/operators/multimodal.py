"""Multimodal column plumbing (north-star ops, SURVEY §2.5).

Image/audio/video payloads are opaque BINARY columns plus typed
metadata. The Spark-side contract that matters at scale — schema,
Arrow batch shape, partition-preserving mapInPandas, bounded batch
memory via maxRecordsPerBatch — is real and tested; the codec call is
selected by an executor-side import probe: real PIL (image) /
soundfile (audio) decode when the libraries are importable, otherwise
the clearly-marked deterministic fake below. A deployment with the
libs installed gets real metadata with no code change; this container
has neither, so tests pin the fake path end-to-end and drive the
selection logic directly with a synthetic module.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("digest", StringType()),
    ]
)


def to_media_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table from the documents fixture: the UTF-8 bytes
    of `text` stand in for an encoded payload. Demonstrates the BINARY
    column contract without shipping real media."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB: deterministic stand-in for a real codec. Derives fake
    dimensions from byte length so the pipeline is testable end-to-end
    without media libraries; `_decode_one` routes here when the real
    codec is unavailable (or on codec="fake").
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


def _decode_one(payload, media_type: str, codec: str = "auto") -> tuple[int, int, int]:
    """Decode one payload to (width, height, n_frames).

    codec="auto": real decode when the library for this media_type is
    importable AND the payload parses; anything else falls back to the
    deterministic fake so a mixed/dirty corpus never kills the job.
    codec="real": no fallback — ImportError/parse errors propagate
    (use for corpora where silent fallback would poison metadata).
    codec="fake": always the stub (bit-stable across deployments).
    Runs executor-side inside the mapInPandas batch, so the import
    probe reflects the workers' environment, not the driver's.
    """
    if codec not in ("auto", "real", "fake"):
        raise ValueError(f"codec must be auto|real|fake, got {codec!r}")
    if codec == "fake":
        return _fake_decode(payload)
    try:
        if media_type == "image":
            import io

            from PIL import Image

            with Image.open(io.BytesIO(bytes(payload))) as img:
                return (
                    int(img.width),
                    int(img.height),
                    int(getattr(img, "n_frames", 1)),
                )
        if media_type == "audio":
            import io

            import soundfile

            data, _rate = soundfile.read(io.BytesIO(bytes(payload)))
            return (0, 0, int(len(data)))
        raise ImportError(f"no codec wired for media_type={media_type!r}")
    except Exception:
        if codec == "real":
            raise
        return _fake_decode(payload)


def decode_media(
    media: DataFrame, batch_hint: int | None = None, codec: str = "auto"
) -> DataFrame:
    """Decode/feature-extract via mapInPandas — the scale-correct shape
    for codec work: Arrow-batched, partition-preserving (no shuffle),
    per-batch memory bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    (lower it for large payloads). Output drops the payload column so
    downstream stages don't carry bytes they no longer need. See
    `_decode_one` for codec selection.
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_one(p, t, codec)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "digest": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes a frame index per
    sampled frame (JVM-side sequence — the decode of each frame would
    be a second mapInPandas over (media_id, frame_idx))."""
    frames = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
    )
    return (
        decoded.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
