"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
*decode* step is stubbed (``decode_image`` raises ``NotImplementedError``
unless PIL appears), but everything Spark-side is real and tested:

- binary columns travel as ``BinaryType`` (Arrow-backed, no base64 blowup),
- metadata extraction runs in ``mapInPandas`` — per-partition Arrow batches,
  bytes arrive in pandas as Python ``bytes`` objects, output is a typed
  struct-like schema,
- the fixture payload is deterministic (md5-derived from document text) so
  the extraction output is oracle-checkable in DuckDB.

At 100 TB: binary payloads dominate row size, so the partitioning knob is
``spark.sql.files.maxPartitionBytes`` (bytes per task, not rows); metadata
extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, magic string, width bigint, height bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic fake 32-byte binary payload (md5-derived) —
    stands in for an image blob; the plumbing (BinaryType column through
    Arrow) is identical for real payloads."""
    payload_hex = F.concat(F.md5(F.col(text_col)), F.md5(F.reverse(F.col(text_col))))
    return df.withColumn("payload", F.to_binary(payload_hex, F.lit("hex")))


def extract_binary_meta(df_with_payload: DataFrame) -> DataFrame:
    """Typed metadata from binary payloads via mapInPandas (Arrow batches).

    width/height are parsed from the payload's leading bytes the way a real
    header parse would (big-endian u16 fields) — deterministic, so the
    DuckDB oracle can replicate them from the hex."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "magic": payloads.map(lambda b: b[:4].hex()),
                    "width": payloads.map(
                        lambda b: int.from_bytes(b[4:6], "big") % 1024 + 16
                    ).astype("int64"),
                    "height": payloads.map(
                        lambda b: int.from_bytes(b[6:8], "big") % 1024 + 16
                    ).astype("int64"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _extract, schema=META_SCHEMA
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to pixels.  STUB: the container has no image
    codec libraries; the Spark-side plumbing above is the tested surface."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. Pillow) "
            "which is not available in this environment"
        ) from exc
