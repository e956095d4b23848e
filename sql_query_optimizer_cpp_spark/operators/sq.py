"""Scalar quantization (SQ8) embedding compression + compressed search.

Beyond-reference surface (the reference engine has no vector machinery —
its similarity story stops at delegating scans to MySQL,
engine/src/plan_executor.cpp:53-63); this module adds the second
canonical compression family next to :mod:`.pq` — the FAISS
``IndexScalarQuantizer`` (QT_8bit) shape:

- TRAINING is one aggregation, not k-means: per DIMENSION the corpus
  min/max pin a uniform 256-level grid (``lo``, ``step = (hi-lo)/255``)
  — no sampling, no iterations, no seeds, which makes SQ the
  train-light tier of the compression ladder (4x smaller codes, zero
  training drift to manage);
- a vector is ENCODED as one small code per component:
  ``floor((x - lo) / step)`` clamped to [0, 255] — at 100 TB this is
  4x storage (a float32 component becomes one byte; here the
  relational long form ``(id, pos, code)`` stands in for the packed
  byte layout, exactly as :mod:`.pq` does for its codes);
- search scores the EXACT query against the midpoint RECONSTRUCTION
  ``xh = lo + (code + 0.5) * step`` — compressed-exhaustive search
  (FAISS's IndexScalarQuantizer contract): no candidate pruning, the
  win is that the corpus-sized read is 4x smaller and the raw
  embeddings are never touched at search time.  Compose with the IVF
  posting lists for pruning (the IVF-SQ shape) the same way
  :func:`.pq.ivf_pq_topk` composes PQ with the coarse quantizer.

Compression-ladder position: SQ8 (4x, no training, near-exact recall)
vs PQ (16x at the defaults, trained sub-quantizers, approximate
recall).  A 100 TB pipeline typically serves SQ8 where recall is
precious and PQ/IVFPQ where the corpus-sized scan must shrink hardest.

Determinism/portability: min/max are order-independent aggregates (no
fp-accumulation issues), the grid arithmetic is plain IEEE-754 binary64
evaluated with IDENTICAL expression shapes in Spark and the DuckDB
oracle (same parenthesization — no reassociation), and every SUM goes
through the module-wide DECIMAL(28,20) trick, so codes and cosines are
bit-identical across engines (pinned by
tests/test_operators.py::test_sq8_codes_match_duckdb_replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import DIM, _comp, normsq_expr

SQ_LEVELS = 255  # 8-bit grid: codes 0..255, step = (hi - lo) / 255


def _dsum(col):
    """Order-independent exact sum of doubles (the module-wide trick)."""
    return F.sum(F.col(col).cast("decimal(28,20)")).cast("double")


def train_sq(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-dimension uniform grid: ``(pos int, lo double, step double)``
    with ``lo = min(x_pos)`` and ``step = (max - min) / 255`` over the
    corpus.  ONE aggregation over the component explosion — min/max
    partial-aggregate map-side and are exactly order-independent, so
    unlike the k-means quantizers there is nothing to sample, seed, or
    iterate.  A constant dimension (hi == lo) gets step 0 (code 0,
    reconstruction exactly lo).  The grid is ``dim`` rows — driver
    metadata, broadcast everywhere it is used."""
    return (
        _comp(df, id_col, emb_col)
        .groupBy("pos")
        .agg(F.min("xd").alias("lo"), F.max("xd").alias("hi"))
        .select(
            "pos",
            "lo",
            ((F.col("hi") - F.col("lo")) / F.lit(float(SQ_LEVELS))).alias(
                "step"
            ),
        )
    )


def _code_col():
    """Encode expression over (xd, lo, step): clamp(floor((xd-lo)/step))
    — the SAME IEEE-754 shape the DuckDB oracle evaluates, so the
    boundary component (xd == hi, where (hi-lo)/step lands on 255 ± one
    rounding) floors identically in both engines."""
    return F.when(F.col("step") == 0.0, F.lit(0)).otherwise(
        F.least(
            F.lit(SQ_LEVELS),
            F.floor((F.col("xd") - F.col("lo")) / F.col("step")).cast("int"),
        )
    )


def sq_encode(
    df: DataFrame,
    grid: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus against the grid: ``(id, pos, code int)`` —
    one small int per component (the 4x compressed relation the search
    scans instead of raw embeddings).  One corpus scan joined to the
    broadcast grid; no shuffle of embeddings."""
    if grid is None:
        grid = train_sq(df, id_col, emb_col)
    return (
        _comp(df, id_col, emb_col)
        .join(F.broadcast(grid), "pos")
        .select(id_col, "pos", _code_col().alias("code"))
    )


def sq_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    grid: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Compressed-exhaustive top-k: approximate cosine between the EXACT
    query and each candidate's midpoint reconstruction
    ``xh = lo + (code + 0.5) * step``, computed entirely from the codes
    relation + the broadcast grid — raw embeddings are read for the
    ``n_queries`` query vectors only.  The candidate side is one scan
    of the codes joined to the broadcast query components; the one
    shuffle is the ``(query, candidate)`` partial-dot aggregation
    (map-side combined, decimal-exact).  No pruning by design — this is
    the FAISS IndexScalarQuantizer contract; compose with IVF posting
    lists when the 4x-compressed exhaustive scan is still too much.
    Output: ``(query_id, neighbor_id, cos_sim, rn)``."""
    if grid is None:
        grid = train_sq(df, id_col, emb_col)
    codes = sq_encode(df, grid, id_col, emb_col)
    rec = codes.join(F.broadcast(grid), "pos").select(
        id_col,
        "pos",
        (
            F.col("lo") + (F.col("code") + F.lit(0.5)) * F.col("step")
        ).alias("xh"),
    )
    qmask = F.col(id_col) < n_queries
    qcomp = _comp(df.where(qmask), id_col, emb_col).select(
        F.col(id_col).alias("query_id"), "pos", F.col("xd").alias("qd")
    )
    qn = df.where(qmask).select(
        F.col(id_col).alias("query_id"),
        F.expr(normsq_expr(emb_col, duck=False, exact=True)).alias("q_nsq"),
    )
    cand = (
        rec.join(F.broadcast(qcomp), "pos")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("pd", F.col("qd") * F.col("xh"))
        .withColumn("ps", F.col("xh") * F.col("xh"))
        .groupBy("query_id", id_col)
        .agg(_dsum("pd").alias("dotq"), _dsum("ps").alias("xh_nsq"))
    )
    scored = cand.join(F.broadcast(qn), "query_id").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            F.col("dotq") / (F.sqrt("q_nsq") * F.sqrt("xh_nsq")), 6
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )
