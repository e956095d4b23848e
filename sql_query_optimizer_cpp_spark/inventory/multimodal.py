"""Multimodal inventory: binary-payload metadata extraction.

The Spark side pushes real bytes through Arrow into mapInPandas; the oracle
reconstructs the same metadata from the md5 hex, proving the binary
round-trip (hex -> bytes -> pandas -> typed columns) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..operators.multimodal import (
    attach_binary_payload,
    extract_binary_meta,
    extract_features,
    resize_meta,
    sample_frames,
)

_ORACLE = """
SELECT doc_id,
       CAST(32 AS BIGINT) AS n_bytes,
       substr(md5(text), 1, 8) AS magic,
       CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 1024 + 16 AS width,
       CAST(('0x' || substr(md5(text), 13, 4)) AS BIGINT) % 1024 + 16 AS height
FROM documents
"""


@register(
    "multimodal_meta",
    oracle=_ORACLE,
    doc="binary-column plumbing: md5-derived 32-byte payloads through "
    "BinaryType + Arrow + mapInPandas, header-style width/height parse "
    "(decode itself is stubbed — no codec libs in this environment)",
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return extract_binary_meta(attach_binary_payload(t["documents"]))


# Integer fit-to-256-box: DuckDB's `//` and Python's `//` are both exact
# floor division on BIGINT, so the resize plan is bit-portable.
_RESIZE_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 1024 + 16
               AS width,
           CAST(('0x' || substr(md5(text), 13, 4)) AS BIGINT) % 1024 + 16
               AS height
    FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= 256 THEN width
            ELSE (width * 256) // greatest(width, height) END AS new_width,
       CASE WHEN greatest(width, height) <= 256 THEN height
            ELSE (height * 256) // greatest(width, height) END AS new_height,
       (CASE WHEN greatest(width, height) <= 256 THEN width
             ELSE (width * 256) // greatest(width, height) END)
       * (CASE WHEN greatest(width, height) <= 256 THEN height
               ELSE (height * 256) // greatest(width, height) END)
       * 3 AS out_bytes
FROM m
"""


@register(
    "multimodal_resize",
    oracle=_RESIZE_ORACLE,
    doc="fit-to-box resize planning over payload headers: mapInPandas parses "
    "width/height and computes target dims + RGB buffer size with pure "
    "integer math (the pixel resample itself is behind the decode stub)",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return resize_meta(attach_binary_payload(t["documents"]))


# u32 / 2^32 is a dyadic rational: the double is exact in both engines.
_FEATURES_ORACLE = """
SELECT d.doc_id,
       CAST(r.i AS BIGINT) AS dim,
       CAST(('0x' || substr(md5(text) || md5(reverse(text)), r.i * 8 + 1, 8))
            AS BIGINT) / 4294967296.0 AS value
FROM documents d CROSS JOIN range(8) AS r(i)
"""


@register(
    "multimodal_features",
    oracle=_FEATURES_ORACLE,
    doc="feature extraction: payload -> fixed 8-dim array<double> via "
    "mapInPandas (model-embedding stand-in, normalized u32 chunks so the "
    "vector is oracle-checkable), posexploded to (doc_id, dim, value)",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    feats = extract_features(attach_binary_payload(t["documents"]))
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim", "value")
    ).withColumn("dim", F.col("dim").cast("bigint"))


_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(f.i AS BIGINT) AS frame_idx,
       substr(md5(text) || md5(reverse(text)), f.i * 8 + 1, 8) AS frame_hex
FROM documents CROSS JOIN (VALUES (0), (3), (6)) AS f(i)
"""


@register(
    "multimodal_frame_sample",
    oracle=_FRAMES_ORACLE,
    doc="video-style frame sampling: payload as 8 x 4-byte frames, every "
    "3rd emitted as a row — a flatMap-shaped mapInPandas (output batch "
    "longer than input batch), zero shuffle",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return sample_frames(attach_binary_payload(t["documents"]))
