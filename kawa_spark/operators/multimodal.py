"""Multimodal columns: opaque binary media + typed metadata.

The contract input carries ``html:binary`` (BASELINE.json:15); a
training-data pipeline at 100 TB treats images/audio/video the same
way: an opaque ``binary`` column plus typed metadata, decoded only
inside Arrow-batched UDFs on the executors (never the driver).

The image/audio decode libraries are not in this container, so the
DECODE step is a clearly-marked deterministic stub
(``KAWA_FAKE_DECODE``) — but everything Spark-level is real and tested:
schema, ``mapInPandas`` batch shape, partitioning, metadata pushdown.
Swap ``_decode_stub`` for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic", StringType()),
        StructField("content_md5", StringType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

# magic-byte sniffing table (typed metadata WITHOUT decoding — stays
# native so Catalyst prunes the binary column when only meta is used)
_MAGIC = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),
    ("3c68746d", "html"),
    ("3c21646f", "html"),
]


def media_meta(df: DataFrame, media_col: str = "html", url_col: str = "url") -> DataFrame:
    """Typed metadata for a binary column — ALL native expressions
    (hex-prefix magic sniff, length, md5); no UDF, no decode."""
    hex8 = F.lower(F.hex(F.substring(F.col(media_col), 1, 4)))
    magic = F.lit("unknown")
    for prefix, name in reversed(_MAGIC):
        magic = F.when(hex8.startswith(prefix), name).otherwise(magic)
    return df.select(
        F.col(url_col).alias("url"),
        F.octet_length(media_col).alias("n_bytes"),
        magic.alias("magic"),
        F.md5(media_col).alias("content_md5"),
    )


KAWA_FAKE_DECODE = True  # stub marker: replace _decode_stub with a real
#                          decoder (PIL / ffmpeg) to drop this flag


def _decode_stub(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic FAKE decode: width/height/frames/features derived
    from a sha1 of the payload. Real Spark plumbing, fake pixels —
    the container ships no imaging libraries (NotImplementedError-free
    so the batch path is exercised end-to-end in tests)."""
    digest = hashlib.sha1(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    n_frames = 1 + digest[2] % 8
    feats = (
        np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0
    )
    return width, height, n_frames, feats


def decode_media(
    df: DataFrame, media_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """binary media -> (url, width, height, n_frames, features) via
    ``mapInPandas`` — the UDTF shape a real decoder uses (one row in,
    one row + feature vector out; frame-sampled video would yield
    several). Arrow moves the bytes column executor-side in batches; a
    real cluster sizes batches with arrow.maxRecordsPerBatch to bound
    worker memory."""
    cols = df.select(F.col(url_col).alias("url"), F.col(media_col).alias("media"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in DECODE_SCHEMA.fields}
            for url, payload in zip(pdf["url"], pdf["media"]):
                w, h, nf, feats = _decode_stub(
                    bytes(payload) if payload is not None else b""
                )
                out["url"].append(url)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema=DECODE_SCHEMA)
