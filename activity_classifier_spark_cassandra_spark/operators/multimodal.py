"""Multimodal columns: image / audio / video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The Spark-side plumbing here is real and tested — schemas, batch
iteration, partition behavior, UDF signatures — while the actual
codec work is stubbed: this container has no image/audio libraries,
so ``decode`` parses a deterministic fake header (see
``encode_fake_image``) and raises ``NotImplementedError`` for real
codecs.  Swapping in PIL/libav later changes only the marked inner
functions, not the dataflow.

Scale design: mapInPandas streams Arrow record batches through one
Python worker per core — no per-row pickling (the 10-100x win over
row-at-a-time UDFs), no shuffle (pure per-partition map), and the
binary payload is never shipped to the driver.  Feature extraction
prunes the payload column as early as possible so downstream
exchanges carry only small typed columns.

The reference has no multimodal surface (accelerometer rows only);
this is north-star scope per the build brief / SURVEY.md §2.12.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- fake codec
# 16-byte deterministic header: magic "FIMG", u16 width, u16 height,
# u8 channels, u8 modality, u16 sample_rate(kHz*10 for audio), u32 crc.
_MAGIC = b"FIMG"
_HEADER = ">4sHHBBHI"
_HEADER_LEN = struct.calcsize(_HEADER)

MODALITY_IMAGE = 0
MODALITY_AUDIO = 1
MODALITY_VIDEO = 2


def encode_fake_image(
    width: int,
    height: int,
    channels: int = 3,
    modality: int = MODALITY_IMAGE,
    sample_rate: int = 0,
    payload: bytes = b"",
) -> bytes:
    """Deterministic stand-in encoder for test fixtures."""
    crc = (width * 31 + height * 17 + channels) & 0xFFFFFFFF
    return (
        struct.pack(
            _HEADER, _MAGIC, width, height, channels, modality, sample_rate, crc
        )
        + payload
    )


def _decode_header(data: bytes) -> tuple[int, int, int, int, int] | None:
    """STUB decode: parse the fake header. A real implementation would
    dispatch on actual magic bytes (PNG/JPEG/WAV/...) to a codec lib."""
    if data is None or len(data) < _HEADER_LEN:
        return None
    magic, w, h, c, m, sr, _crc = struct.unpack(
        _HEADER, bytes(data[:_HEADER_LEN])
    )
    if magic != _MAGIC:
        # Real codecs (PNG/JPEG/WAV) are not available in this
        # container; the dataflow treats unknown blobs as undecodable.
        raise NotImplementedError(
            "real image/audio codecs are stubbed in this environment"
        )
    return w, h, c, m, sr


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("modality", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_media_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract binary media via mapInPandas.

    Input needs (media_id, content: binary); output drops the payload
    (column pruning at the first opportunity — the whole point at
    100 TB) and carries typed metadata only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in MEDIA_FEATURES_SCHEMA.fieldNames()}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    hdr = _decode_header(blob)
                except NotImplementedError:
                    hdr = None
                ok = hdr is not None
                w, h, c, m, _sr = hdr if ok else (0, 0, 0, -1, 0)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["modality"].append(m)
                out["n_pixels"].append(int(w) * int(h))
                out["payload_bytes"].append(
                    max(0, (len(blob) if blob is not None else 0) - _HEADER_LEN)
                )
                out["decode_ok"].append(ok)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        batches, schema=MEDIA_FEATURES_SCHEMA
    )


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: compute target dims declaratively from the
    extracted metadata (no Python).  The actual pixel resample is the
    stubbed codec step; the plan (scale factor, target dims) is pure
    Column math and fully pushdown/codegen-friendly."""
    feats = extract_media_features(df)
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(
    df: DataFrame, every_n: int = 10, ts_col: str = "frame_idx"
) -> DataFrame:
    """Frame sampling for video rows exploded to (media_id, frame_idx):
    keep every n-th frame — a pure filter, no Python, scales as a scan."""
    return df.filter((F.col(ts_col) % every_n) == 0)


# ------------------------------------------------------------ query
@F.pandas_udf(T.BinaryType())
def _encode_media_udf(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
    """Deterministic in-query media synthesis: dims derived from the
    document row, so the oracle can predict every decoded field in
    closed form without ever touching bytes."""
    return pd.Series(
        [
            encode_fake_image(
                width=int(n % 512) + 1,
                height=int(d % 512) + 1,
                channels=3,
                payload=b"x" * int(n % 64),
            )
            for d, n in zip(doc_id, n_chars)
        ]
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing, driver-checkable: synthesize a
    binary media column per document (Arrow-batched pandas UDF), run
    the mapInPandas decode/feature-extract, and return the typed
    metadata.  The binary payload exists only inside the two Python
    stages — it is pruned before anything shuffles.  The oracle
    recomputes every field from the same arithmetic on (doc_id,
    n_chars), so a wrong header parse, a lost batch, or a truncated
    payload all hash-mismatch."""
    from ..sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        _encode_media_udf(F.col("doc_id"), F.col("n_chars")).alias("content"),
    )
    return extract_media_features(docs)


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CAST((n_chars % 512) + 1 AS INTEGER) AS width,
       CAST((doc_id % 512) + 1 AS INTEGER) AS height,
       3 AS channels,
       0 AS modality,
       CAST(((n_chars % 512) + 1) * ((doc_id % 512) + 1) AS BIGINT)
         AS n_pixels,
       CAST(n_chars % 64 AS BIGINT) AS payload_bytes,
       TRUE AS decode_ok
FROM documents
"""
