"""Multimodal inventory: binary-payload metadata extraction.

The Spark side pushes real bytes through Arrow into mapInPandas; the oracle
reconstructs the same metadata from the md5 hex, proving the binary
round-trip (hex -> bytes -> pandas -> typed columns) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from ..catalog import load_tables
from ..operators.multimodal import attach_binary_payload, extract_binary_meta

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
