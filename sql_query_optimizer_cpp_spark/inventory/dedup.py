"""Dedup inventory queries over ``documents``, with full SQL oracles.

The MinHash/SimHash oracles are generated programmatically from the same
seeds and band layout as the Spark operators, so even the approximate
pipelines are hash-compared end-to-end (not rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from ..catalog import load_tables
from ..functions import (
    hash64_sql,
    minhash_params,
    minhash_transform_sql,
    pround,
)
from ..operators import dedup as D
from ..operators.text import content_fingerprint_sql

NUM_HASHES = 16
BANDS = 4
SIMHASH_BITS = 16
SIMHASH_BANDS = 4
THRESHOLD = 0.8


# --- exact dedup -------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="SELECT "
    + content_fingerprint_sql("text")
    + " AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_copies "
    "FROM documents GROUP BY 1",
    doc="exact dedup: hash-groupBy on normalized content, min-id representative",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.exact_dedup(t["documents"])


# --- n-gram Jaccard (exact) ----------------------------------------------------
def _ex_cte(table: str = "documents") -> str:
    return (
        "ex AS (SELECT DISTINCT doc_id, s FROM "
        f"(SELECT doc_id, unnest({D.shingles_sql('text')}) AS s FROM {table}))"
    )


_NGRAM_ORACLE = f"""
WITH {_ex_cte()},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ex GROUP BY 1)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {THRESHOLD}
"""


@register(
    "dedup_ngram_pairs",
    oracle=_NGRAM_ORACLE,
    doc="exact 3-gram Jaccard near-dup pairs (threshold 0.8), "
    "blocked on shared shingles — no cross join",
    tags=("dedup",),
)
def dedup_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.ngram_jaccard_pairs(t["documents"], threshold=THRESHOLD)


# --- MinHash + LSH ---------------------------------------------------------------
def _minhash_ctes(table: str = "documents") -> str:
    """CTE chain ending in ``pairs(doc_a, doc_b, jaccard)`` — shared by the
    pair query, the cluster (connected-components) query, and the near-dup
    curation pipeline (which runs it over the quality-filtered subset)."""
    rows = NUM_HASHES // BANDS
    mh_exprs = ", ".join(
        f"MIN({minhash_transform_sql('h', a, b)}) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(NUM_HASHES))
    )
    band_selects = []
    for b in range(BANDS):
        members = ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        bh = hash64_sql(f"concat_ws(',', {members})", seed=f"band{b}:")
        band_selects.append(f"SELECT doc_id, {b} AS band_id, {bh} AS bh FROM sig")
    buckets = " UNION ALL ".join(band_selects)
    return f"""{_ex_cte(table)},
exh AS (SELECT doc_id, s, {hash64_sql("s", seed="mh:")} AS h FROM ex),
sig AS (SELECT doc_id, {mh_exprs} FROM exh GROUP BY doc_id),
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.doc_a
  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ex GROUP BY 1),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {THRESHOLD}
)"""


def _minhash_oracle() -> str:
    return f"WITH {_minhash_ctes()} SELECT doc_a, doc_b, jaccard FROM pairs"


@register(
    "dedup_minhash_pairs",
    oracle=_minhash_oracle(),
    doc="MinHash(16)+LSH(4 bands) near-dup pairs verified by exact Jaccard "
    ">= 0.8; oracle replicates signatures, banding and verification",
    tags=("dedup", "bench"),
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.minhash_lsh_pairs(
        t["documents"], num_hashes=NUM_HASHES, bands=BANDS, threshold=THRESHOLD
    )


# --- SimHash ----------------------------------------------------------------------
def _simhash_cte() -> str:
    bit_sums = ", ".join(
        f"SUM(cnt * (((th >> {j}) & 1) * 2 - 1)) AS s_{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
tok AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS cnt FROM
  (SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS t
   FROM documents) GROUP BY 1, 2
),
th AS (SELECT doc_id, cnt, {hash64_sql('t', seed='sh:')} AS th FROM tok),
bitsums AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bitsums)
"""


@register(
    "dedup_simhash",
    oracle=f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM fp",
    doc="SimHash fingerprints (16-bit, token-frequency weighted); "
    "oracle replicates the full bit pipeline",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.simhash(t["documents"], bits=SIMHASH_BITS)


def _simhash_pairs_oracle() -> str:
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, (simhash >> {b * width}) & {mask} AS bv FROM fp"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH {_simhash_cte()},
buckets AS ({band_selects})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM buckets a JOIN buckets b
  ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""


@register(
    "dedup_simhash_pairs",
    oracle=_simhash_pairs_oracle(),
    doc="SimHash near-dup pairs (hamming <= 2) via nibble-band blocking "
    "(pigeonhole guarantees no missed pairs at hamming <= bands-1)",
    tags=("dedup",),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.simhash_pairs(
        t["documents"], bits=SIMHASH_BITS, bands=SIMHASH_BANDS, max_hamming=2
    )


# --- Near-dup clusters (connected components over the pair graph) ----------------
def _cc_ctes(table: str = "documents") -> str:
    """CTEs ``edges``/``reach``/``comp`` — the reachability closure over
    the symmetric near-dup pair graph (assumes ``pairs`` is in scope)."""
    return f"""edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r
),
comp AS (SELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY id)"""


def _clusters_oracle() -> str:
    """DuckDB twin of min-label propagation: a recursive CTE computes the
    full reachability closure of the symmetric pair graph, then MIN over
    the reachable set per doc — the same fixpoint the Spark iteration
    converges to (propagation order doesn't change it)."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
{_cc_ctes()},
csize AS (
  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY 1
)
SELECT comp.doc_id, comp.cluster_rep, csize.cluster_size
FROM comp JOIN csize ON comp.cluster_rep = csize.cluster_rep
"""


@register(
    "dedup_clusters",
    oracle=_clusters_oracle(),
    doc="connected components over the MinHash near-dup pair graph: "
    "(doc_id, cluster_rep=min reachable id, cluster_size); Spark runs "
    "min-label propagation to a fixpoint, the oracle a recursive-CTE "
    "reachability closure — same fixpoint",
    tags=("dedup",),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.neardup_clusters(
        t["documents"], num_hashes=NUM_HASHES, bands=BANDS, threshold=THRESHOLD
    )


# --- raw MinHash signature vectors ----------------------------------------------
def _signature_oracle() -> str:
    mins = ", ".join(
        f"MIN({minhash_transform_sql('h', a, b)})"
        for a, b in minhash_params(NUM_HASHES)
    )
    return f"""
WITH ex AS (SELECT DISTINCT doc_id, s FROM
  (SELECT doc_id, unnest({D.shingles_sql('text')}) AS s
   FROM documents WHERE doc_id < 50)),
exh AS (SELECT doc_id, s, {hash64_sql("s", seed="mh:")} AS h FROM ex)
SELECT doc_id, array_to_string([{mins}], '-') AS signature
FROM exh GROUP BY doc_id
"""


def text_minhash_signature_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-typed variant: the 16-element MinHash signature as a real
    ``array<bigint>`` column — the persistable document sketch an
    incremental dedup pipeline stores and re-bands later without
    re-shingling the corpus.  NOT driver-graded (pandas hash compare
    cannot take top-level list cells — the r04 red); asserted by
    tests/test_operators.py::test_minhash_signature_roundtrip."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("documents",))
    sig = D.minhash_signatures(
        t["documents"].filter(F.col("doc_id") < 50), num_hashes=NUM_HASHES
    )
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"mh_{i}") for i in range(NUM_HASHES)]).alias(
            "signature"
        ),
    )


@register(
    "text_minhash_signature",
    oracle=_signature_oracle(),
    doc="the MinHash signature (docs 0-49), graded through a serialized "
    "'-'-joined string projection of the 16-element array — the driver's "
    "pandas hash compare cannot factorize top-level list cells (r04 red), "
    "so the graded row compares scalars while the array-typed sketch "
    "stays covered by the local suite; one shingle explosion (flatMap) + "
    "one groupBy, values bit-identical across engines via the portable "
    "universal-hash family",
    tags=("dedup", "text"),
)
def text_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return text_minhash_signature_arrays(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform(F.col("signature"), lambda x: x.cast("string")), "-"
        ).alias("signature"),
    )


@register(
    "dedup_clusters_star",
    oracle=_clusters_oracle(),
    doc="the SAME cluster output as dedup_clusters (identical oracle) "
    "computed by alternating large-star/small-star contraction "
    "(Kiveris et al. SoCC'14) instead of min-label propagation — "
    "O(log n) rounds vs O(diameter), the variant a 100 TB corpus with "
    "adversarially chained near-dups needs; grading both against one "
    "oracle proves the algorithms interchangeable",
    tags=("dedup",),
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=NUM_HASHES, bands=BANDS, threshold=THRESHOLD
    )
    labels = D.cc_labels_star(pairs)
    full = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_rep"),
        )
    )
    sizes = full.groupBy("cluster_rep").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return full.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_rep", "cluster_size"
    )


# --- incremental dedup: new batch vs already-ingested corpus ---------------------
_BATCH_MOD = 10
_BATCH_REMAINDER = 7


@register(
    "dedup_incremental",
    oracle=f"""
WITH f AS (SELECT doc_id, {content_fingerprint_sql('text')} AS h FROM documents),
newb AS (SELECT doc_id, h FROM f WHERE doc_id % {_BATCH_MOD} = {_BATCH_REMAINDER}),
corpus AS (SELECT h, MIN(doc_id) AS corpus_rep FROM f
           WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REMAINDER} GROUP BY 1),
batchmin AS (
  SELECT doc_id, h,
         MIN(doc_id) OVER (PARTITION BY h ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS earlier
  FROM newb)
SELECT b.doc_id,
       CASE WHEN c.corpus_rep IS NOT NULL THEN 'dup_corpus'
            WHEN b.earlier IS NOT NULL THEN 'dup_batch'
            ELSE 'new' END AS verdict,
       COALESCE(c.corpus_rep, b.earlier) AS dup_of
FROM batchmin b LEFT JOIN corpus c ON b.h = c.h
""",
    doc="incremental (new-batch-vs-corpus) exact dedup: docs with id%10==7 "
    "play the incoming batch, the rest the already-ingested corpus; each "
    "new doc gets a verdict — dup_corpus (content hash already ingested, "
    "dup_of = earliest corpus holder), dup_batch (an earlier doc in the "
    "same batch), or new.  The shape that matters at 100 TB: the corpus "
    "side reduces to (hash, min_id) — the persisted fingerprint index an "
    "ingestion pipeline keeps — so each increment joins hash-to-hash "
    "against an index, never re-scanning corpus text",
    tags=("dedup",),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..operators.text import content_fingerprint

    t = load_tables(spark, sf_dir, ("documents",))
    f = t["documents"].select(
        "doc_id", content_fingerprint("text").alias("h")
    )
    is_new = F.col("doc_id") % _BATCH_MOD == _BATCH_REMAINDER
    newb = f.filter(is_new)
    corpus = (
        f.filter(~is_new)
        .groupBy("h")
        .agg(F.min("doc_id").alias("corpus_rep"))
    )
    w = (
        W.partitionBy("h")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    batchmin = newb.withColumn("earlier", F.min("doc_id").over(w))
    return (
        batchmin.join(corpus, "h", "left")
        .select(
            "doc_id",
            F.when(F.col("corpus_rep").isNotNull(), F.lit("dup_corpus"))
            .when(F.col("earlier").isNotNull(), F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce("corpus_rep", "earlier").alias("dup_of"),
        )
    )


_CONTAINMENT_T = 0.9


@register(
    "dedup_ngram_containment",
    oracle=f"""
WITH {_ex_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(DISTINCT ea.s) AS BIGINT) AS inter
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.doc_a
  JOIN ex eb ON eb.doc_id = c.doc_b AND eb.s = ea.s
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, CAST(COUNT(DISTINCT s) AS BIGINT) AS sz FROM ex GROUP BY 1)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / least(sa.sz, sb.sz) >= {_CONTAINMENT_T}""",
    doc="shingle-set CONTAINMENT near-dup pairs (|A∩B|/min(|A|,|B|) >= "
    "0.9): the metric that catches a short doc fully embedded in a "
    "longer one (quotes, boilerplate wrapping), which Jaccard's union "
    "term dilutes away — same shared-shingle equi-join blocking as the "
    "Jaccard path, exact verify on candidates only",
    tags=("dedup",),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return D.ngram_containment_pairs(t["documents"], threshold=_CONTAINMENT_T)


@register(
    "corpus_dedup_report",
    oracle="WITH fp AS (SELECT "
    + content_fingerprint_sql("text")
    + " AS fp FROM documents) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS total_docs, "
    "CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_contents, "
    "CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS dup_docs, "
    "(floor((1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) "
    "AS dup_rate FROM fp",
    doc="corpus-level exact-duplication report: total docs, distinct "
    "normalized contents, duplicate count and rate — the one-row health "
    "metric a dedup pipeline publishes per snapshot; COUNT(DISTINCT) "
    "over the 64-bit content fingerprint is a two-phase partial "
    "aggregate (shuffle ∝ distinct fingerprints, not corpus bytes)",
    tags=("dedup",),
)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.text import content_fingerprint

    t = load_tables(spark, sf_dir, ("documents",))
    fp = t["documents"].select(content_fingerprint("text").alias("fp"))
    return fp.agg(
        F.count("*").cast("long").alias("total_docs"),
        F.countDistinct("fp").cast("long").alias("distinct_contents"),
        (F.count("*") - F.countDistinct("fp")).cast("long").alias("dup_docs"),
        pround(
            F.lit(1.0) - F.countDistinct("fp").cast("double") / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "dedup_cluster_size_hist",
    oracle=f"""
WITH RECURSIVE {_minhash_ctes()},
{_cc_ctes()},
csize AS (
  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY 1
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM csize GROUP BY 1""",
    doc="near-dup cluster-size distribution: how many clusters of each "
    "size the MinHash pair graph forms — the QA readout that decides "
    "whether a corpus has a pathological mega-cluster (a template farm "
    "or a crawler loop) before rep-selection drops data; one distinct "
    "over (rep, size) then a tiny groupBy — all the cost is the CC "
    "pass itself, and sizes are already materialized per row",
    tags=("dedup",),
)
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("documents",))
    clusters = D.neardup_clusters(
        t["documents"], num_hashes=NUM_HASHES, bands=BANDS, threshold=THRESHOLD
    )
    return (
        clusters.select("cluster_rep", "cluster_size")
        .distinct()
        .groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
    )
