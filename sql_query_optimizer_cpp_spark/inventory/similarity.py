"""Similarity-search inventory queries over ``embeddings``.

Full SQL oracles even for the ANN variants — the sign-LSH hyperplanes are
md5-derived constants inlined into both dialects, and dot products are
decimal-exact, so every cosine matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from ..catalog import load_tables
from ..functions import pround
from ..operators import similarity as S

N_QUERIES = 10
K_BRUTE = 10
K_ANN = 5
NEARDUP_THRESHOLD = 0.4  # fixture embeddings have no pairs above ~0.6


def _e_cte(exact: bool = True) -> str:
    return (
        "e AS (SELECT vec_id, embedding, "
        + S.normsq_expr("embedding", duck=True, exact=exact)
        + " AS nsq FROM embeddings)"
    )


def brute_oracle_sql(exact: bool = True) -> str:
    """DuckDB brute-force top-k.  ``exact=True`` is the GRADED oracle
    (DECIMAL-exact dots, bit-portable).  ``exact=False`` is plain-double
    arithmetic and exists only as bench.py's like-for-like baseline for
    the Spark production path — never graded (plain-double term order is
    not bit-portable across engines)."""
    return f"""
WITH {_e_cte(exact)},
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq
      FROM e WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True, exact=exact)}
           / (sqrt(q.q_nsq) * sqrt(e.nsq)), 6) AS cos_sim
  FROM e JOIN q ON e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM pairs) t WHERE rn <= {K_BRUTE}
"""


_BRUTE_ORACLE = brute_oracle_sql(exact=True)


@register(
    "sim_topk_bruteforce",
    oracle=_BRUTE_ORACLE,
    doc="exact cosine top-10 for 10 query vectors: broadcast query set x "
    "full corpus + per-query window (the exactness baseline)",
    tags=("similarity", "bench"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.brute_force_topk(t["embeddings"], n_queries=N_QUERIES, k=K_BRUTE)


_ANN_ORACLE = f"""
WITH {_e_cte()},
eb AS (SELECT vec_id, embedding, nsq,
       {S.bucket_expr("embedding", duck=True)} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq,
             bucket AS q_bucket
      FROM eb WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.query_id, eb.vec_id AS neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True)}
           / (sqrt(q.q_nsq) * sqrt(eb.nsq)), 6) AS cos_sim
  FROM eb JOIN q ON eb.bucket = q.q_bucket AND eb.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM pairs) t WHERE rn <= {K_ANN}
"""


@register(
    "sim_ann_lsh_topk",
    oracle=_ANN_ORACLE,
    doc="ANN top-5 probing only the query's sign-LSH(4-plane) bucket — "
    "equi-join on bucket id, touches ~1/16 of the corpus per query",
    tags=("similarity",),
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.lsh_bucketed_topk(t["embeddings"], n_queries=N_QUERIES, k=K_ANN)


_NEARDUP_ORACLE = f"""
WITH {_e_cte()},
eb AS (SELECT vec_id, embedding, nsq,
       {S.bucket_expr("embedding", duck=True)} AS bucket FROM e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({S.dot_expr("a.embedding", "b.embedding", duck=True)}
         / (sqrt(a.nsq) * sqrt(b.nsq)), 6) AS cos_sim
FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({S.dot_expr("a.embedding", "b.embedding", duck=True)}
        / (sqrt(a.nsq) * sqrt(b.nsq)), 6) >= {NEARDUP_THRESHOLD}
"""


@register(
    "sim_neardup_pairs",
    oracle=_NEARDUP_ORACLE,
    doc="embedding-cosine near-dup pairs (>= 0.4), LSH-bucket blocked "
    "(exact precision, bucket recall)",
    tags=("similarity", "dedup"),
)
def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.embedding_neardup_pairs(t["embeddings"], threshold=NEARDUP_THRESHOLD)


@register(
    "sim_topk_blockmax",
    oracle=_BRUTE_ORACLE,
    doc="EXACT top-10 via two-phase selection: per-(query, LSH-bucket) "
    "local top-k, then a global rank over only the 16k survivors — same "
    "answer as sim_topk_bruteforce (the oracle IS the brute-force SQL), "
    "but the per-query selection window is split across 16 independent "
    "partitions instead of one skewed reducer; the selection pattern that "
    "survives N growing 100x",
    tags=("similarity",),
)
def sim_topk_blockmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.two_phase_topk(t["embeddings"], n_queries=N_QUERIES, k=K_BRUTE)


_DEDUP_COS_ORACLE = f"""
WITH {_e_cte()},
eb AS (SELECT vec_id, embedding, nsq,
       {S.bucket_expr("embedding", duck=True)} AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({S.dot_expr("a.embedding", "b.embedding", duck=True)}
          / (sqrt(a.nsq) * sqrt(b.nsq)), 6) >= {NEARDUP_THRESHOLD}),
dropped AS (SELECT DISTINCT vec_b AS vec_id FROM pairs)
SELECT e.vec_id, d.vec_id IS NULL AS keep
FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
"""


@register(
    "dedup_embedding_cosine",
    oracle=_DEDUP_COS_ORACLE,
    doc="embedding-cosine near-dup DEDUP decision: every vector keeps "
    "unless an earlier (smaller-id) vector is cosine-similar above the "
    "threshold — sim_neardup_pairs turned into the keep/drop verdict a "
    "curation pipeline consumes; candidate pairs stay LSH-bucket-blocked "
    "(equi-join), the drop set is a tiny id column broadcast back",
    tags=("similarity", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("embeddings",))
    pairs = S.embedding_neardup_pairs(t["embeddings"], threshold=NEARDUP_THRESHOLD)
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        t["embeddings"]
        .select("vec_id")
        .join(
            F.broadcast(dropped.withColumn("_dropped", F.lit(True))),
            "vec_id",
            "left",
        )
        .select("vec_id", F.col("_dropped").isNull().alias("keep"))
    )


# CTE chain shared by the coarse-quantizer oracle and the IVF-search
# oracle: assignment of every vector to its nearest per-label centroid.
_CENTROID_CTES = """comp AS (
  -- parallel unnests zip in DuckDB: pos runs 1..len alongside the values
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS xd
  FROM embeddings),
centroids AS (
  SELECT label, pos,
         CAST(SUM(CAST(xd AS DECIMAL(28,20))) AS DOUBLE) / COUNT(*) AS c
  FROM comp GROUP BY 1, 2),
cnorm AS (
  SELECT label, CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS c_nsq
  FROM centroids GROUP BY 1),
vnorm AS (
  SELECT vec_id, CAST(SUM(CAST(xd * xd AS DECIMAL(28,20))) AS DOUBLE) AS v_nsq
  FROM comp GROUP BY 1),
dots AS (
  SELECT comp.vec_id, centroids.label AS cand_label,
         CAST(SUM(CAST(comp.xd * centroids.c AS DECIMAL(28,20))) AS DOUBLE) AS dot
  FROM comp JOIN centroids ON comp.pos = centroids.pos
  GROUP BY 1, 2),
scored AS (
  SELECT d.vec_id, d.cand_label,
         d.dot / (sqrt(v.v_nsq) * sqrt(c.c_nsq)) AS cos_sim
  FROM dots d
  JOIN vnorm v ON v.vec_id = d.vec_id
  JOIN cnorm c ON c.label = d.cand_label),
assign AS (
  SELECT vec_id, cand_label FROM (
    SELECT vec_id, cand_label,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, cand_label) AS rn
    FROM scored) t WHERE rn = 1)"""

_CENTROID_ORACLE = f"""
WITH {_CENTROID_CTES}
SELECT vec_id, CAST(cand_label AS INTEGER) AS pred_label FROM assign
"""


@register(
    "sim_nearest_centroid",
    oracle=_CENTROID_ORACLE,
    doc="IVF coarse quantizer: per-label decimal-exact mean centroids, "
    "each vector assigned to nearest centroid by cosine",
    tags=("similarity",),
)
def sim_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.nearest_centroid(t["embeddings"])


_IVF_ORACLE = f"""
WITH {_CENTROID_CTES},
{_e_cte()},
ea AS (
  SELECT e.vec_id, e.embedding, e.nsq, a.cand_label AS pred_label
  FROM e JOIN assign a ON a.vec_id = e.vec_id),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq,
             pred_label AS q_list
      FROM ea WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True)}
           / (sqrt(q.q_nsq) * sqrt(ea.nsq)), 6) AS cos_sim
  FROM ea JOIN q ON ea.pred_label = q.q_list AND ea.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM pairs) t WHERE rn <= {K_ANN}
"""


def _trained_ctes(
    num_cells: int = S.IVF_CELLS,
    iters: int = S.IVF_ITERS,
    sample_mod: int = S.IVF_SAMPLE_MOD,
    train_pred: str = "TRUE",
) -> str:
    """DuckDB twin of operators.similarity.kmeans_centroids +
    assign_cells: hash-sampled training set (vec_id % mod = 0), seeds =
    the num_cells smallest sample ids, ``iters`` UNROLLED assign+mean
    rounds (decimal-exact sums, ties to the smallest cell, empty cells
    carry via COALESCE left join), then nearest-cell assignment of the
    FULL corpus — ends defining ``afull(vec_id, cell)``.  ``train_pred``
    (over ``vec_id``) further restricts the training set to the rows
    that were in the table when build_ivf_index ran — the maintenance
    twins append rows AFTER the build, which the persisted codebook
    never saw."""
    parts = [
        """fcomp AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS xd
  FROM embeddings)""",
        f"scomp AS (SELECT * FROM fcomp "
        f"WHERE vec_id % {sample_mod} = 0 AND ({train_pred}))",
        f"""seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
  FROM (SELECT DISTINCT vec_id FROM scomp ORDER BY vec_id LIMIT {num_cells}))""",
        """c0 AS (
  SELECT s.cell, f.pos, f.xd AS c
  FROM scomp f JOIN seeds s ON f.vec_id = s.vec_id)""",
    ]
    for t in range(iters):
        parts += [
            f"""cn{t} AS (
  SELECT cell, CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS c_nsq
  FROM c{t} GROUP BY cell)""",
            f"""dots{t} AS (
  SELECT f.vec_id, c.cell,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS dot
  FROM scomp f JOIN c{t} c ON f.pos = c.pos GROUP BY 1, 2)""",
            f"""a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT d.vec_id, d.cell,
           row_number() OVER (PARTITION BY d.vec_id
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.cell) AS rn
    FROM dots{t} d JOIN cn{t} n ON d.cell = n.cell) t WHERE rn = 1)""",
            f"""m{t} AS (
  SELECT a.cell, f.pos,
         CAST(SUM(CAST(f.xd AS DECIMAL(28,20))) AS DOUBLE) / COUNT(*) AS c
  FROM scomp f JOIN a{t} a ON f.vec_id = a.vec_id GROUP BY 1, 2)""",
            f"""c{t + 1} AS (
  SELECT p.cell, p.pos, COALESCE(m.c, p.c) AS c
  FROM c{t} p LEFT JOIN m{t} m ON m.cell = p.cell AND m.pos = p.pos)""",
        ]
    parts += [
        f"""cnf AS (
  SELECT cell, CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS c_nsq
  FROM c{iters} GROUP BY cell)""",
        f"""dotsf AS (
  SELECT f.vec_id, c.cell,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS dot
  FROM fcomp f JOIN c{iters} c ON f.pos = c.pos GROUP BY 1, 2)""",
        """afull AS (
  SELECT vec_id, cell FROM (
    SELECT d.vec_id, d.cell,
           row_number() OVER (PARTITION BY d.vec_id
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.cell) AS rn
    FROM dotsf d JOIN cnf n ON d.cell = n.cell) t WHERE rn = 1)""",
    ]
    return ",\n".join(parts)


_IVF_TRAINED_ORACLE = f"""
WITH {_trained_ctes()},
{_e_cte()},
ea AS (
  SELECT e.vec_id, e.embedding, e.nsq, a.cell
  FROM e JOIN afull a ON a.vec_id = e.vec_id),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq,
             cell AS q_list
      FROM ea WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True)}
           / (sqrt(q.q_nsq) * sqrt(ea.nsq)), 6) AS cos_sim
  FROM ea JOIN q ON ea.cell = q.q_list AND ea.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM pairs) t WHERE rn <= {K_ANN}
"""


@register(
    "sim_ivf_topk",
    oracle=_IVF_TRAINED_ORACLE,
    doc="IVF search (nprobe=1) over a TRAINED coarse quantizer (r10): "
    "sample-based k-means cells (hash-sampled vec_id % 3 training set, "
    "deterministic seeds, two unrolled decimal-exact rounds) replace "
    "the r5-era per-label means — on the fixtures recall@5 more than "
    "doubles (0.18 -> 0.40 at sf0.01) at identical probe cost; each "
    "query still scores only its own posting list (~1/10 corpus). The "
    "oracle reproduces the whole training loop in SQL",
    tags=("similarity",),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.ivf_topk_trained(t["embeddings"], n_queries=N_QUERIES, k=K_ANN)


def _recall_oracle() -> str:
    """Compose the brute-force and ANN oracles (identical CTE generators)
    into the recall@k measurement."""
    return f"""
WITH exact_topk AS ({_BRUTE_ORACLE.replace(f'rn <= {K_BRUTE}', f'rn <= {K_ANN}')}),
ann_topk AS ({_ANN_ORACLE})
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matched,
       (floor((CAST(COUNT(a.neighbor_id) AS DOUBLE) / {K_ANN}) * 1000000.0 + 0.5) / 1000000.0) AS recall
FROM exact_topk e
LEFT JOIN ann_topk a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "sim_recall_report",
    oracle=_recall_oracle(),
    doc="ANN quality evaluation as a query: recall@5 of the single-probe "
    "sign-LSH search against the exact top-5, per query vector — the "
    "measurement loop every ANN deployment runs before trading recall "
    "for probes; both sides are the already-graded searches, the join "
    "is on (query, neighbor), and the count divides by a constant k",
    tags=("similarity",),
)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("embeddings",))
    exact = S.brute_force_topk(
        t["embeddings"], n_queries=N_QUERIES, k=K_ANN
    ).select("query_id", "neighbor_id")
    ann = S.lsh_bucketed_topk(
        t["embeddings"], n_queries=N_QUERIES, k=K_ANN
    ).select(
        F.col("query_id").alias("_qid"),
        F.col("neighbor_id").alias("_nid"),
    )
    return (
        exact.join(
            ann,
            (F.col("query_id") == F.col("_qid"))
            & (F.col("neighbor_id") == F.col("_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("_nid").cast("long").alias("n_matched"),
            pround(F.count("_nid").cast("double") / K_ANN, 6).alias(
                "recall"
            ),
        )
    )


_IVF_LABEL_TOPK_SQL = _IVF_ORACLE  # per-label cells (the untrained base)

_RECALL_TRAINED_ORACLE = f"""
WITH exact_topk AS ({_BRUTE_ORACLE.replace(f'rn <= {K_BRUTE}', f'rn <= {K_ANN}')}),
lab_topk AS ({_IVF_LABEL_TOPK_SQL}),
tr_topk AS ({_IVF_TRAINED_ORACLE})
SELECT e.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_label,
       (floor((CAST(COUNT(l.neighbor_id) AS DOUBLE) / {K_ANN})
          * 1000000.0 + 0.5) / 1000000.0) AS recall_label,
       CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_trained,
       (floor((CAST(COUNT(t.neighbor_id) AS DOUBLE) / {K_ANN})
          * 1000000.0 + 0.5) / 1000000.0) AS recall_trained
FROM exact_topk e
LEFT JOIN lab_topk l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
LEFT JOIN tr_topk t
  ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "sim_ivf_recall_trained",
    oracle=_RECALL_TRAINED_ORACLE,
    doc="quantizer-quality evaluation as a query (r10): per-query "
    "recall@5 at nprobe=1 of the label-centroid IVF vs the sample-"
    "trained k-means IVF, both against the exact top-5 — the measurement "
    "that justifies training the coarse quantizer (aggregate recall "
    "0.18 -> 0.40 at sf0.01, 0.36 -> 0.48 at sf0.1); all three sides "
    "are already-graded searches, the comparison is two (query, "
    "neighbor) joins and a constant-k division",
    tags=("similarity",),
)
def sim_ivf_recall_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("embeddings",))
    exact = S.brute_force_topk(
        t["embeddings"], n_queries=N_QUERIES, k=K_ANN
    ).select("query_id", "neighbor_id")
    lab = S.ivf_topk(t["embeddings"], n_queries=N_QUERIES, k=K_ANN).select(
        F.col("query_id").alias("_lq"), F.col("neighbor_id").alias("_ln")
    )
    tr = S.ivf_topk_trained(
        t["embeddings"], n_queries=N_QUERIES, k=K_ANN
    ).select(
        F.col("query_id").alias("_tq"), F.col("neighbor_id").alias("_tn")
    )
    return (
        exact.join(
            lab,
            (F.col("query_id") == F.col("_lq"))
            & (F.col("neighbor_id") == F.col("_ln")),
            "left",
        )
        .join(
            tr,
            (F.col("query_id") == F.col("_tq"))
            & (F.col("neighbor_id") == F.col("_tn")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("_ln").cast("long").alias("n_label"),
            pround(F.count("_ln").cast("double") / K_ANN, 6).alias(
                "recall_label"
            ),
            F.count("_tn").cast("long").alias("n_trained"),
            pround(F.count("_tn").cast("double") / K_ANN, 6).alias(
                "recall_trained"
            ),
        )
    )


@register(
    "embeddings_norm_stats",
    oracle=f"""
WITH n AS (SELECT label, sqrt({S.normsq_expr("embedding", duck=True)}) AS nrm
           FROM embeddings)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       round(MIN(nrm), 6) AS min_norm,
       round(MAX(nrm), 6) AS max_norm,
       round(CAST(SUM(CAST(round(nrm, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_norm
FROM n GROUP BY label""",
    doc="embedding-table QA: per-label vector-norm distribution (count, "
    "min/max/mean L2 norm) — the sanity readout that catches unnormalized "
    "or degenerate embedding batches before they poison an ANN index; "
    "norms via the DECIMAL-exact accumulator (bit-identical across "
    "engines), mean through a decimal sum of 6dp-rounded norms so "
    "accumulation order cannot drift; map-side combinable, one shuffle "
    "of per-label partials",
    tags=("similarity", "agg"),
)
def embeddings_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("embeddings",))
    nrm = F.sqrt(F.expr(S.normsq_expr("embedding", duck=False)))
    rounded = F.round(nrm, 6).cast("decimal(18,6)")
    return (
        t["embeddings"]
        .select("label", nrm.alias("nrm"), rounded.alias("nrm6"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.round(
                F.sum("nrm6").cast("double") / F.count("*"), 6
            ).alias("mean_norm"),
        )
    )


# -- persisted-index probe (r11) --------------------------------------------

IVF_PROBES = 2

def _ivf_indexed_oracle(
    live_pred: str = "TRUE", train_pred: str = "TRUE"
) -> str:
    """DuckDB twin of build_ivf_index + ivf_search_indexed, parametrized
    for the index-MAINTENANCE twins:

    - ``live_pred`` (over ``vec_id``) — rows still live at probe time.
      A dv_delete folded in by maintain_ivf_index removes exactly those
      posting rows AND excludes the same ids from querying (queries read
      through the deletion vectors), so the predicate filters BOTH the
      candidate corpus and the query-side cell ranking.
    - ``train_pred`` (over ``vec_id``) — rows present when
      build_ivf_index ran, i.e. what the k-means codebook trained on.
      Appends folded in AFTER the build (refresh/maintain/streaming
      ingest) assign with the PERSISTED codebook, so the training sample
      is narrower than the final corpus.

    Defaults reproduce the plain build-then-probe oracle."""
    return f"""
WITH {_trained_ctes(train_pred=train_pred)},
{_e_cte()},
ea AS (
  SELECT e.vec_id, e.embedding, e.nsq, a.cell
  FROM e JOIN afull a ON a.vec_id = e.vec_id
  WHERE {live_pred.replace('vec_id', 'e.vec_id')}),
qp AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT d.vec_id, d.cell,
           row_number() OVER (PARTITION BY d.vec_id
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.cell) AS rn
    FROM dotsf d JOIN cnf n ON d.cell = n.cell
    WHERE d.vec_id < {N_QUERIES}
      AND {live_pred.replace('vec_id', 'd.vec_id')}) t
  WHERE rn <= {IVF_PROBES}),
q AS (
  SELECT qp.query_id, e.embedding AS q_emb, e.nsq AS q_nsq,
         qp.cell AS q_list
  FROM qp JOIN e ON e.vec_id = qp.query_id),
pairs AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True)}
           / (sqrt(q.q_nsq) * sqrt(ea.nsq)), 6) AS cos_sim
  FROM ea JOIN q ON ea.cell = q.q_list AND ea.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM pairs) t WHERE rn <= {K_ANN}
"""


_IVF_INDEXED_ORACLE = _ivf_indexed_oracle()


@register(
    "sim_ivf_probe_indexed",
    oracle=_IVF_INDEXED_ORACLE,
    doc="IVF point-probe over a PERSISTED index (new r11, "
    "operators/similarity.build_ivf_index + ivf_search_indexed — the "
    "FAISS/liquid-clustering serving shape): the corpus is reclustered "
    "into per-cell hive partitions with precomputed norms at build "
    "time, and a multi-probe search (n_probes=2) reads ONLY its probed "
    "cells' directories — no full-corpus re-assignment per query, the "
    "r10 gap.  The oracle replays training, corpus assignment, AND the "
    "query-side top-2 cell ranking in SQL; equality proves the "
    "persisted codebook/postings round-trip bit-exactly and the pruned "
    "read loses no candidate (the pruning itself is inputFiles-pinned "
    "in tests/test_operators.py)",
    tags=("similarity",),
)
def sim_ivf_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    path = _mut_dir(sf_dir, "embeddings_ivf")
    t["embeddings"].write.mode("overwrite").parquet(path)
    S.build_ivf_index(spark, path, id_col="vec_id")
    return S.ivf_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


# -- index maintenance twins (r12) -------------------------------------------
#
# The r11 round landed DV-aware incremental IVF maintenance
# (operators/similarity.maintain_ivf_index) and the streaming ingest sink
# (streaming/ann.py); both were covered by tests and a randomized sweep
# but never driver-graded.  These two queries convert that machinery into
# driver-checkable evidence: each runs a full lifecycle against a scratch
# copy of `embeddings` and probes the MAINTAINED index, with the oracle
# re-deriving the expected post-maintenance postings in SQL.

_MAINT_DELETE_PRED = "vec_id % 7 = 3"  # hits query id 3 too — on purpose


@register(
    "sim_ivf_maintain_cycle",
    oracle=_ivf_indexed_oracle(live_pred=f"NOT ({_MAINT_DELETE_PRED})"),
    doc="IVF index MAINTENANCE lifecycle (r12, the graded form of the "
    "r11 maintain_ivf_index path): build a persisted index, tombstone "
    "1/7 of the corpus via a merge-on-read deletion-vector batch "
    "(vec_id % 7 = 3 — including query id 3, so the query side thins "
    "too), fold the tombstones into the posting lists with "
    "maintain_ivf_index (identity-precise anti-join, only affected "
    "cells' hive partitions rewritten — O(tombstones + affected-cell "
    "bytes), no retraining, no corpus re-scan), then multi-probe search "
    "the maintained index.  The oracle replays training and assignment "
    "over the ORIGINAL corpus and filters both the candidate corpus and "
    "the query-side cell ranking to the surviving rows; equality proves "
    "removal took exactly the doomed posting rows and nothing else",
    tags=("similarity", "mutate"),
)
def sim_ivf_maintain_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.mor import dv_delete_where
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    path = _mut_dir(sf_dir, "embeddings_ivf_maint")
    t["embeddings"].write.mode("overwrite").parquet(path)
    S.build_ivf_index(spark, path, id_col="vec_id")
    dv_delete_where(spark, path, F.expr(_MAINT_DELETE_PRED))
    S.maintain_ivf_index(spark, path, id_col="vec_id")
    return S.ivf_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


@register(
    "sim_ivf_ingest_twin",
    oracle=_ivf_indexed_oracle(train_pred="vec_id % 2 = 0"),
    doc="streaming ANN ingest graded against its batch-derived twin "
    "(r12, the graded form of streaming/ann.py): half the corpus "
    "(vec_id % 2 = 0) lands as a committed ingest epoch, the index is "
    "built over it (the codebook trains on that half ONLY), then the "
    "remaining rows arrive through a REAL Structured Streaming "
    "foreachBatch sink (file source, maxFilesPerTrigger=1 -> multiple "
    "epochs), each epoch appending its vectors' posting rows with the "
    "PERSISTED codebook via maintain_ivf_index.  The probe runs over "
    "the stream-maintained index; the oracle derives the same state in "
    "batch SQL (training restricted to the pre-build half, assignment "
    "over the full corpus).  Equality proves stream-maintained state "
    "equals batch-derived state — the final index is invariant to how "
    "the stream split rows into epochs, which is what makes a "
    "deterministic oracle possible",
    tags=("similarity", "streaming"),
)
def sim_ivf_ingest_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.mutate import _fs
    from ..streaming.ann import ingest_vectors_maintaining_ivf
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    base = _mut_dir(sf_dir, "embeddings_ivf_ingest")
    # scratch reset through the Hadoop FS abstraction (not shutil): a
    # streaming checkpoint cannot be mode=overwrite'n like the other
    # scratch tables, and raw local-path deletion would silently break
    # on any non-local sf_dir filesystem
    _jvm, fs, base_p = _fs(spark, base)
    fs.delete(base_p, True)
    path = f"{base}/table"
    checkpoint = f"{base}/checkpoint"
    staging = f"{base}/staging"

    emb = t["embeddings"].select("vec_id", "embedding")
    # epoch "1000000": the pre-build half, written in the sink's own
    # layout (one hive partition per epoch; a value far above any real
    # stream epoch id so a replayed stream epoch can never collide)
    emb.where(F.expr("vec_id % 2 = 0")).write.parquet(
        f"{path}/ingest_epoch=1000000"
    )
    S.build_ivf_index(spark, path, id_col="vec_id")

    # the second half arrives by STREAM: two source files -> two epochs
    emb.where(F.expr("vec_id % 2 = 1")).repartition(2).write.parquet(staging)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = ingest_vectors_maintaining_ivf(stream, path, checkpoint)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return S.ivf_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


# -- r13 staged queries (lead the r14 grading window) -------------------------

_BULK_DELETE_PRED = "vec_id % 2 = 0"  # half the corpus, queries included


@register(
    "sim_ivf_maintain_bulk",
    oracle=_ivf_indexed_oracle(live_pred=f"NOT ({_BULK_DELETE_PRED})"),
    doc="BULK-delete IVF maintenance with the broadcast gate CLOSED "
    "(r13, the graded form of the VERDICT r12 weak-mark fix): tombstone "
    "HALF the corpus in one deletion-vector batch, then fold it with "
    "maintain_ivf_index while spark.sql.autoBroadcastJoinThreshold=-1 — "
    "the size gate must drop the F.broadcast hint (the 100 TB bulk-"
    "delete path: the tombstone set shuffle-joins instead of being "
    "forced onto every executor) and the fold must still remove exactly "
    "the doomed posting rows.  The probe then runs over the maintained "
    "index; the oracle replays training over the original corpus and "
    "filters candidates AND query-side cell ranking to survivors",
    tags=("similarity", "mutate"),
)
def sim_ivf_maintain_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.mor import dv_delete_where
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    path = _mut_dir(sf_dir, "embeddings_ivf_maintbulk")
    t["embeddings"].write.mode("overwrite").parquet(path)
    S.build_ivf_index(spark, path, id_col="vec_id")
    dv_delete_where(spark, path, F.expr(_BULK_DELETE_PRED))
    # bulk-delete posture: disable broadcasting so the maintain fold
    # takes the gated (hint-free, AQE-planned) join path end-to-end
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        S.maintain_ivf_index(spark, path, id_col="vec_id")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return S.ivf_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


def _pq_ctes(
    n_subs: int | None = None,
    n_codes: int | None = None,
    iters: int | None = None,
    sample_mod: int | None = None,
    dim: int | None = None,
    train_pred: str = "TRUE",
) -> str:
    """DuckDB twin of operators.pq.train_pq + pq_encode: one k-means per
    contiguous sub-block (the sub id is a group key, so the unrolled
    iterations are shared across sub-quantizers exactly as the Spark
    loop shares them), hash-sampled training set, seeds = the n_codes
    smallest sample ids (the SAME seeds for every sub-block, as in the
    operator), decimal-exact sums, ties to the smallest code, empty
    codes carry via COALESCE.  Ends defining ``pqcodes(vec_id, sub,
    code)`` (the encoded corpus), ``pqnf(sub, code, c_nsq)`` (code
    norms) and ``pqcf`` (the final codebook components).  ``train_pred``
    (over ``vec_id``) restricts the TRAINING set to the rows present at
    build time — the maintenance twin appends rows after the build,
    which the persisted sub-quantizers never saw; encoding (pqcodes)
    always covers the full corpus, because maintain encodes appends
    with the PERSISTED codebooks."""
    from ..operators import pq as PQ

    n_subs = n_subs or PQ.PQ_SUBS
    n_codes = n_codes or PQ.PQ_CODES
    iters = iters or PQ.PQ_ITERS
    sample_mod = sample_mod or PQ.PQ_SAMPLE_MOD
    dim = dim or S.DIM
    dsub = dim // n_subs
    parts = [
        """pqf0 AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS xd
  FROM embeddings)""",
        f"""pqf AS (
  SELECT vec_id, pos, xd,
         CAST(floor((pos - 1) / {dsub}) AS INT) AS sub FROM pqf0)""",
        f"pqs AS (SELECT * FROM pqf "
        f"WHERE vec_id % {sample_mod} = 0 AND ({train_pred}))",
        f"""pqseeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM (SELECT DISTINCT vec_id FROM pqs ORDER BY vec_id LIMIT {n_codes}))""",
        """pqc0 AS (
  SELECT f.sub, s.code, f.pos, f.xd AS c
  FROM pqs f JOIN pqseeds s ON f.vec_id = s.vec_id)""",
    ]
    for t in range(iters):
        parts += [
            f"""pqn{t} AS (
  SELECT sub, code,
         CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS c_nsq
  FROM pqc{t} GROUP BY 1, 2)""",
            f"""pqd{t} AS (
  SELECT f.vec_id, c.sub, c.code,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS dot
  FROM pqs f JOIN pqc{t} c ON f.pos = c.pos GROUP BY 1, 2, 3)""",
            f"""pqa{t} AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.code) AS rn
    FROM pqd{t} d JOIN pqn{t} n ON d.sub = n.sub AND d.code = n.code) t
  WHERE rn = 1)""",
            f"""pqm{t} AS (
  SELECT a.sub, a.code, f.pos,
         CAST(SUM(CAST(f.xd AS DECIMAL(28,20))) AS DOUBLE) / COUNT(*) AS c
  FROM pqs f JOIN pqa{t} a ON f.vec_id = a.vec_id AND f.sub = a.sub
  GROUP BY 1, 2, 3)""",
            f"""pqc{t + 1} AS (
  SELECT p.sub, p.code, p.pos, COALESCE(m.c, p.c) AS c
  FROM pqc{t} p LEFT JOIN pqm{t} m
    ON m.sub = p.sub AND m.code = p.code AND m.pos = p.pos)""",
        ]
    parts += [
        f"pqcf AS (SELECT * FROM pqc{iters})",
        """pqnf AS (
  SELECT sub, code,
         CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS c_nsq
  FROM pqcf GROUP BY 1, 2)""",
        """pqdf AS (
  SELECT f.vec_id, c.sub, c.code,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS dot
  FROM pqf f JOIN pqcf c ON f.pos = c.pos GROUP BY 1, 2, 3)""",
        """pqcodes AS (
  SELECT vec_id, sub, code FROM (
    SELECT d.vec_id, d.sub, d.code,
           row_number() OVER (PARTITION BY d.vec_id, d.sub
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.code) AS rn
    FROM pqdf d JOIN pqnf n ON d.sub = n.sub AND d.code = n.code) t
  WHERE rn = 1)""",
    ]
    return ",\n".join(parts)


def _pq_oracle() -> str:
    return f"""
WITH {_pq_ctes()},
{_e_cte()},
qn AS (SELECT vec_id AS query_id, nsq AS q_nsq FROM e
       WHERE vec_id < {N_QUERIES}),
pqlut AS (
  SELECT f.vec_id AS query_id, c.sub, c.code,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS qdot
  FROM pqf f JOIN pqcf c ON f.pos = c.pos
  WHERE f.vec_id < {N_QUERIES} GROUP BY 1, 2, 3),
cand AS (
  SELECT l.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(CAST(l.qdot AS DECIMAL(28,20))) AS DOUBLE) AS dotq,
         CAST(SUM(CAST(n.c_nsq AS DECIMAL(28,20))) AS DOUBLE) AS xh_nsq
  FROM pqcodes a
  JOIN pqlut l ON a.sub = l.sub AND a.code = l.code
  JOIN pqnf n ON a.sub = n.sub AND a.code = n.code
  WHERE a.vec_id <> l.query_id
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT c.query_id, c.neighbor_id,
         round(c.dotq / (sqrt(q.q_nsq) * sqrt(c.xh_nsq)), 6) AS cos_sim,
         CAST(row_number() OVER (PARTITION BY c.query_id
              ORDER BY round(c.dotq / (sqrt(q.q_nsq) * sqrt(c.xh_nsq)), 6)
                       DESC, c.neighbor_id) AS BIGINT) AS rn
  FROM cand c JOIN qn q ON c.query_id = q.query_id) t
WHERE rn <= {K_ANN}
"""


@register(
    "sim_pq_adc_topk",
    oracle=_pq_oracle(),
    doc="product-quantization ADC top-5 (r13, operators/pq.py — the "
    "FAISS IndexPQ serving shape, Jegou et al. TPAMI'11): the 64-dim "
    "corpus is compressed to 16 codes per vector (one 16-code k-means "
    "sub-quantizer per 4-dim block, all sixteen trained in ONE grouped "
    "loop), and search touches ONLY the codes table — each query "
    "precomputes a 16x16 lookup table of partial dots against the "
    "codebook, and every candidate's approximate cosine is 16 LUT "
    "lookups summed (reconstruction dot AND norm both come from the "
    "LUT; raw embeddings are never read at search time).  At 100 TB "
    "this is the storage+serving story: 256 B of floats become 16 "
    "byte-ish codes (16x smaller; recall@5 0.5 on the fixtures), the "
    "LUT broadcasts, the codes scan partial-aggregates map-side.  The "
    "oracle replays the whole pipeline — sub-block k-means, encoding, "
    "LUT, ADC scoring — in SQL; equality is bit-exact",
    tags=("similarity",),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ

    t = load_tables(spark, sf_dir, ("embeddings",))
    return PQ.pq_adc_topk(t["embeddings"], n_queries=N_QUERIES, k=K_ANN)


def _ivfpq_cand_ctes(
    live_pred: str = "TRUE", train_pred: str = "TRUE"
) -> str:
    """The shared IVFPQ CTE chain through ``cand(query_id, neighbor_id,
    dotq, xh_nsq)``: the coarse-quantizer CTEs (``_trained_ctes`` ->
    ``afull``/``dotsf``/``cnf``) prune candidates to each query's
    IVF_PROBES nearest cells; the PQ CTEs (``_pq_ctes`` -> ``pqcodes``/
    ``pqcf``/``pqnf``) ADC-score only those candidates.  CTE namespaces
    are disjoint by construction (pq* prefix), so the two training
    replays compose in one WITH.  Also defines ``e``/``qn`` for the
    finishers.

    Parametrized like :func:`_ivf_indexed_oracle` for the persisted-
    index twins: ``live_pred`` (over ``vec_id``) filters BOTH the
    candidate corpus and the query side to rows still live at probe
    time (a folded dv_delete); ``train_pred`` restricts BOTH quantizer
    training replays to the rows present when build_ivfpq_index ran
    (appends folded in later encode with the persisted codebooks)."""
    return f"""{_trained_ctes(train_pred=train_pred)},
{_pq_ctes(train_pred=train_pred)},
{_e_cte()},
qn AS (SELECT vec_id AS query_id, nsq AS q_nsq FROM e
       WHERE vec_id < {N_QUERIES}),
qp AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT d.vec_id, d.cell,
           row_number() OVER (PARTITION BY d.vec_id
                ORDER BY d.dot / sqrt(n.c_nsq) DESC, d.cell) AS rn
    FROM dotsf d JOIN cnf n ON d.cell = n.cell
    WHERE d.vec_id < {N_QUERIES}
      AND {live_pred.replace('vec_id', 'd.vec_id')}) t
  WHERE rn <= {IVF_PROBES}),
pqlut AS (
  SELECT f.vec_id AS query_id, c.sub, c.code,
         CAST(SUM(CAST(f.xd * c.c AS DECIMAL(28,20))) AS DOUBLE) AS qdot
  FROM pqf f JOIN pqcf c ON f.pos = c.pos
  WHERE f.vec_id < {N_QUERIES} GROUP BY 1, 2, 3),
cand0 AS (
  SELECT qp.query_id, a.vec_id AS neighbor_id
  FROM afull a JOIN qp ON a.cell = qp.cell
  WHERE a.vec_id <> qp.query_id
    AND {live_pred.replace('vec_id', 'a.vec_id')}),
cand AS (
  SELECT c0.query_id, c0.neighbor_id,
         CAST(SUM(CAST(l.qdot AS DECIMAL(28,20))) AS DOUBLE) AS dotq,
         CAST(SUM(CAST(n.c_nsq AS DECIMAL(28,20))) AS DOUBLE) AS xh_nsq
  FROM cand0 c0
  JOIN pqcodes pc ON pc.vec_id = c0.neighbor_id
  JOIN pqlut l ON l.query_id = c0.query_id
              AND l.sub = pc.sub AND l.code = pc.code
  JOIN pqnf n ON n.sub = pc.sub AND n.code = pc.code
  GROUP BY 1, 2)"""


def _ivfpq_oracle(live_pred: str = "TRUE", train_pred: str = "TRUE") -> str:
    """IVFPQ twin: rank the ADC approximate cosines directly (the
    quantized serving answer).  Defaults reproduce the plain in-memory
    composition."""
    return f"""
WITH {_ivfpq_cand_ctes(live_pred, train_pred)}
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT c.query_id, c.neighbor_id,
         round(c.dotq / (sqrt(q.q_nsq) * sqrt(c.xh_nsq)), 6) AS cos_sim,
         CAST(row_number() OVER (PARTITION BY c.query_id
              ORDER BY round(c.dotq / (sqrt(q.q_nsq) * sqrt(c.xh_nsq)), 6)
                       DESC, c.neighbor_id) AS BIGINT) AS rn
  FROM cand c JOIN qn q ON c.query_id = q.query_id) t
WHERE rn <= {K_ANN}
"""


@register(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    doc="IVFPQ top-5 (r13, operators/pq.ivf_pq_topk — the full FAISS "
    "serving composition): the trained IVF coarse quantizer prunes "
    "candidates to each query's 2 nearest cells (~1/5 of the corpus), "
    "and ONLY those candidates are ADC-scored from their 16-code PQ "
    "representation via the broadcast 16x16 LUT — compressed storage "
    "AND pruned candidate reads multiply, which is the 100 TB serving "
    "shape (raw embeddings touched only at train/encode time).  The "
    "oracle composes BOTH training replays — coarse k-means cells and "
    "sub-block codebooks — in one WITH (disjoint CTE namespaces) and "
    "re-derives probe lists, codes, LUT and ADC scores in SQL; "
    "equality is bit-exact",
    tags=("similarity",),
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ

    t = load_tables(spark, sf_dir, ("embeddings",))
    return PQ.ivf_pq_topk(
        t["embeddings"], n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


# -- r14 staged queries (never driver-graded; lead the r15 window) -----------


@register(
    "sim_ivfpq_probe_indexed",
    oracle=_ivfpq_oracle(),
    doc="quantized serving read over a PERSISTED IVFPQ sidecar (r14, "
    "operators/pq.build_ivfpq_index + ivfpq_search_indexed — the FAISS "
    "IndexIVFPQ serving layout on the lakehouse sidecar conventions): "
    "both quantizers train once at build time, the corpus is "
    "reclustered into per-cell hive partitions holding CODES ONLY (16 "
    "small ints per vector, ~16x smaller than the IVF sidecar's "
    "embedding postings), and a probe reads ONLY its probed cells' "
    "directories, scoring candidates from their stored codes via the "
    "broadcast per-query LUT — at 100 TB the two prunings multiply: "
    "n_probes/n_cells of the corpus, at 1/16 the bytes, raw embeddings "
    "touched only for the 10 query vectors.  The PQ geometry comes "
    "from the index anchor, never caller defaults (ADVICE r13).  The "
    "oracle replays coarse k-means, sub-block codebooks, encoding, "
    "cell pruning and ADC scoring in SQL; equality proves the "
    "persisted quantizers/codes round-trip bit-exactly and the pruned "
    "read loses no candidate (pruning itself is inputFiles-pinned in "
    "tests/test_operators.py)",
    tags=("similarity",),
)
def sim_ivfpq_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    path = _mut_dir(sf_dir, "embeddings_ivfpq")
    t["embeddings"].write.mode("overwrite").parquet(path)
    PQ.build_ivfpq_index(spark, path, id_col="vec_id")
    return PQ.ivfpq_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


_IVFPQ_TRAIN_PRED = "vec_id % 2 = 0"  # the pre-build half


@register(
    "sim_ivfpq_maintain_cycle",
    oracle=_ivfpq_oracle(
        live_pred=f"NOT ({_MAINT_DELETE_PRED})",
        train_pred=_IVFPQ_TRAIN_PRED,
    ),
    doc="IVFPQ index MAINTENANCE lifecycle (r14, the graded form of "
    "operators/pq.maintain_ivfpq_index): build the quantized sidecar "
    "over HALF the corpus (vec_id % 2 = 0 — both quantizers train on "
    "that half only), append the other half as new data files, "
    "tombstone 1/7 of the full corpus via a merge-on-read deletion-"
    "vector batch (vec_id % 7 = 3, including query id 3), then ONE "
    "maintain folds both shapes: tombstoned rows leave the codes "
    "postings via the identity-precise, size-gated anti-join (only "
    "affected cells' hive partitions rewritten — and they hold codes, "
    "so the rewrite is ~16x cheaper than the IVF sidecar's), appended "
    "files' live rows enter encoded with the PERSISTED codebooks "
    "(codebook immutability — the FAISS posture: no silent retrain).  "
    "The probe runs over the maintained index; the oracle restricts "
    "BOTH training replays to the pre-build half, encodes the full "
    "corpus with the resulting codebooks, and filters candidates and "
    "query-side cell ranking to survivors.  Equality proves the fold "
    "removed exactly the doomed posting rows, the appends encode "
    "identically to a build-time encode, and the maintained state is "
    "reachable without touching raw indexed bytes",
    tags=("similarity", "mutate"),
)
def sim_ivfpq_maintain_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators import pq as PQ
    from ..operators.mor import dv_delete_where
    from .mutate import _mut_dir

    t = load_tables(spark, sf_dir, ("embeddings",))
    path = _mut_dir(sf_dir, "embeddings_ivfpq_maint")
    emb = t["embeddings"]
    emb.where(F.expr(_IVFPQ_TRAIN_PRED)).write.mode("overwrite").parquet(path)
    PQ.build_ivfpq_index(spark, path, id_col="vec_id")
    emb.where(F.expr(f"NOT ({_IVFPQ_TRAIN_PRED})")).write.mode(
        "append"
    ).parquet(path)
    dv_delete_where(spark, path, F.expr(_MAINT_DELETE_PRED))
    PQ.maintain_ivfpq_index(spark, path, id_col="vec_id")
    return PQ.ivfpq_search_indexed(
        spark, path, n_queries=N_QUERIES, k=K_ANN, n_probes=IVF_PROBES
    )


PQ_REFINE = 15  # ADC keeps 3x the final k; exact re-rank picks the 5


def _ivfpq_refine_oracle(refine: int) -> str:
    """Refined-IVFPQ twin (the FAISS IndexRefineFlat shape): the shared
    IVFPQ chain yields ADC approximate scores, ``adc`` keeps each
    query's top-``refine`` by that ranking (ties to the smallest
    neighbor, exactly the operator's window), and the finisher
    re-scores ONLY those pairs with the decimal-exact cosine before the
    final top-K_ANN — the graded result carries EXACT cosines."""
    return f"""
WITH {_ivfpq_cand_ctes()},
adc AS (
  SELECT query_id, neighbor_id FROM (
    SELECT c.query_id, c.neighbor_id,
           row_number() OVER (PARTITION BY c.query_id
                ORDER BY round(c.dotq / (sqrt(q.q_nsq) * sqrt(c.xh_nsq)), 6)
                         DESC, c.neighbor_id) AS rn
    FROM cand c JOIN qn q ON c.query_id = q.query_id) t
  WHERE rn <= {refine}),
qe AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq
       FROM e WHERE vec_id < {N_QUERIES}),
ex AS (
  SELECT a.query_id, a.neighbor_id,
         round({S.dot_expr("q_emb", "embedding", duck=True)}
           / (sqrt(qe.q_nsq) * sqrt(e.nsq)), 6) AS cos_sim
  FROM adc a
  JOIN e ON e.vec_id = a.neighbor_id
  JOIN qe ON qe.query_id = a.query_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rn
  FROM ex) t WHERE rn <= {K_ANN}
"""


@register(
    "sim_ivfpq_refine_topk",
    oracle=_ivfpq_refine_oracle(PQ_REFINE),
    doc="refined IVFPQ top-5 (r14, operators/pq.ivf_pq_refine_topk — "
    "the FAISS IndexRefineFlat serving shape): the quantized index does "
    "the RECALL work (coarse cells prune, ADC over 16x-compressed codes "
    "keeps each query's top-15 approximate candidates), then ONLY those "
    "15-per-query survivors are re-scored exactly from raw embeddings "
    "(decimal-exact dot, broadcast candidate-pair list against one "
    "column-pruned corpus scan — raw embeddings never shuffle) and the "
    "final top-5 ranks on TRUE cosines.  At 100 TB this is the "
    "standard precision/recall split: corpus-sized reads stay on codes, "
    "exact arithmetic touches n_queries x refine rows.  The oracle "
    "replays both quantizer trainings, ADC ranking, the top-15 cut, "
    "and the exact re-rank in SQL; equality is bit-exact including the "
    "refine-boundary tie-breaks",
    tags=("similarity",),
)
def sim_ivfpq_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pq as PQ

    t = load_tables(spark, sf_dir, ("embeddings",))
    return PQ.ivf_pq_refine_topk(
        t["embeddings"],
        n_queries=N_QUERIES,
        k=K_ANN,
        refine=PQ_REFINE,
        n_probes=IVF_PROBES,
    )
