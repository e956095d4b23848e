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


RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, "
    "new_width bigint, new_height bigint, out_bytes bigint"
)


def resize_meta(df_with_payload: DataFrame, max_dim: int = 256) -> DataFrame:
    """Fit-to-box resize planning over binary payload headers (mapInPandas).

    A real pipeline decodes pixels and resamples; the codec step is stubbed
    here (see :func:`decode_image`), so this computes the *resize plan* —
    target dims preserving aspect ratio, pure integer math so the DuckDB
    oracle reproduces it bit-exactly — plus the output buffer size
    (``new_w * new_h * 3`` RGB bytes), which is what a capacity planner
    actually needs.  Reference analog: the metadata passes in
    ``engine/src/query_optimizer.cpp`` are likewise plan-only.

    At 100 TB: embarrassingly parallel, zero shuffle; batch size is governed
    by Arrow (``spark.sql.execution.arrow.maxRecordsPerBatch``), and the
    payload bytes never leave the executor.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            p = pdf["payload"]
            w = p.map(lambda b: int.from_bytes(b[4:6], "big") % 1024 + 16)
            h = p.map(lambda b: int.from_bytes(b[6:8], "big") % 1024 + 16)
            g = pd.concat([w, h], axis=1).max(axis=1)
            # integer floor-div scaling: exact in both engines, no FP rounding
            nw = pd.Series(
                [wi if gi <= max_dim else (wi * max_dim) // gi
                 for wi, gi in zip(w, g)], index=p.index)
            nh = pd.Series(
                [hi if gi <= max_dim else (hi * max_dim) // gi
                 for hi, gi in zip(h, g)], index=p.index)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int64"),
                    "height": h.astype("int64"),
                    "new_width": nw.astype("int64"),
                    "new_height": nh.astype("int64"),
                    "out_bytes": (nw * nh * 3).astype("int64"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _resize, schema=RESIZE_SCHEMA
    )


FEATURES_SCHEMA = "doc_id bigint, features array<double>"


def extract_features(df_with_payload: DataFrame, dims: int = 8) -> DataFrame:
    """Fixed-size feature vector from binary payloads (mapInPandas).

    Stands in for an image-embedding model: each 4-byte big-endian chunk of
    the payload becomes one dimension, normalized to ``[0, 1)`` by dividing
    by 2^32.  The division is dyadic so the doubles are bit-identical in
    every engine — the vector is oracle-checkable, unlike a real model's
    output.  Output shape (``array<double>`` of fixed length) matches what
    a real embedding UDF would emit, so downstream ANN/near-dup operators
    (operators/similarity.py) compose with it unchanged.

    At 100 TB: zero shuffle; Arrow transfers the binary column in and the
    list column out as contiguous buffers.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["payload"].map(
                        lambda b: [
                            int.from_bytes(b[i * 4 : i * 4 + 4], "big") / 2**32
                            for i in range(dims)
                        ]
                    ),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _features, schema=FEATURES_SCHEMA
    )


FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_hex string"


def sample_frames(
    df_with_payload: DataFrame, frame_bytes: int = 4, stride: int = 3
) -> DataFrame:
    """Every-``stride``-th frame from a video-style payload (mapInPandas).

    Treats the payload as a concatenation of fixed-size frames and emits one
    row per sampled frame — the 1-in-k frame-sampling step of a video
    curation pipeline.  Output cardinality exceeds input (flatMap shape),
    which mapInPandas supports natively: each input batch yields a longer
    output batch, still one Arrow exchange, still zero shuffle.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hexes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hexes.append(
                        payload[i * frame_bytes : (i + 1) * frame_bytes].hex()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _frames, schema=FRAMES_SCHEMA
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
