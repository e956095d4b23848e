"""Source/sink roundtrip inventory queries — driver-gradeable evidence for
the connector surface (SURVEY.md §2.1 S2/S3/S5), which was previously
test-only.

Each query WRITES through ``sources.write`` and READS back through
``sources.read``, then aggregates; the DuckDB oracle aggregates the
original fixture directly.  Equality therefore proves the write→read
path is lossless end-to-end (schema, partition discovery, text-format
round-trip of doubles) — not just that the read path parses something.

Reference parity: the reference's only source is a live MySQL connection
(``engine/src/mysql_connector.cpp:130-186``) and its only sink is the
result printer (``engine/src/cli.cpp:129-152``); multi-format file
sources/sinks are a Spark-first extension.

Determinism: aggregates go through DECIMAL; Spark writes doubles with
Java's shortest-round-trip repr, so csv/json parse back to identical
bits.  Temp output lives under the system tmpdir, keyed by the sf dir so
the sf0.001 test run and the sf0.01 driver run never collide.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..functions import dsum, dsum_sql
from ..sources.readers import read
from ..sources.writers import write


def _rt_dir(sf_dir: str, leaf: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"sqos_rt_{tag}", leaf)


@register(
    "source_roundtrip_partitioned",
    oracle="SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents WHERE lang IN ('en', 'de') GROUP BY lang",
    doc="S2+S5 graded end-to-end: documents written partitioned by lang "
    "(hive-style lang=<v>/ directories), read back with a partition "
    "filter, aggregated — equality with the direct-on-fixture oracle "
    "proves the partitioned write is lossless AND the partition column "
    "reconstructs exactly from directory names; the read plans "
    "PartitionFilters (no data files outside en/de are opened), the "
    "pruning behavior that bounds scan cost at 100 TB",
    tags=("sources",),
)
def source_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    out = _rt_dir(sf_dir, "partitioned_docs")
    write(t["documents"], path=out, fmt="parquet", partition_by=["lang"])
    back = read(spark, out, fmt="parquet")
    return (
        back.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


#: Text formats need an explicit read schema: inference is a full extra
#: scan at scale, and csv would otherwise widen o_custkey to bigint-or-
#: double depending on sampling.
_RT_SCHEMA = "o_orderkey bigint, o_custkey bigint, o_totalprice double"


@register(
    "source_roundtrip_formats",
    oracle="WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    + dsum_sql("o_totalprice")
    + " AS total FROM orders WHERE o_custkey < 100) "
    "SELECT f.format, b.n_rows, b.total "
    "FROM (VALUES ('csv'), ('json'), ('orc')) f(format), base b",
    doc="S3+S5 graded end-to-end: the same orders slice written to orc, "
    "csv and json through sources.write, read back through sources.read "
    "with an explicit schema (never inferSchema — that is a second full "
    "scan at 100 TB), aggregated per format and required to agree with "
    "the direct-on-fixture oracle for every format — proving the binary "
    "formats preserve types and the text formats round-trip doubles "
    "bit-exactly (Java shortest-repr write, exact parse back)",
    tags=("sources",),
)
def source_roundtrip_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    subset = (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    parts = []
    for fmt in ("csv", "json", "orc"):
        out = _rt_dir(sf_dir, f"orders_{fmt}")
        write(subset, path=out, fmt=fmt)
        back = read(
            spark, out, fmt=fmt, schema=None if fmt == "orc" else _RT_SCHEMA
        )
        parts.append(
            back.agg(
                F.count("*").cast("long").alias("n_rows"),
                dsum("o_totalprice").alias("total"),
            ).select(F.lit(fmt).alias("format"), "n_rows", "total")
        )
    out_df = parts[0]
    for p in parts[1:]:
        out_df = out_df.unionAll(p)
    return out_df


@register(
    "insert_select_roundtrip",
    oracle="""
WITH all_rows AS (
  SELECT n_nationkey, n_regionkey FROM nation
  UNION ALL
  SELECT n_nationkey + 100 AS n_nationkey, n_regionkey FROM nation)
SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM all_rows GROUP BY 1""",
    doc="S6 graded end-to-end (the reference PARSES INSERT but never "
    "executes it, cli.cpp:321-323 — this engine executes): the nation "
    "table is materialized as a catalog table (external, tmpdir-backed), "
    "a derived batch is INSERT INTO ... SELECT-ed into it, and the "
    "post-insert aggregate must equal the oracle's UNION ALL of both "
    "row sets computed directly on the fixture — proving the insert "
    "appended exactly the selected rows with correct values; the table "
    "is rebuilt per invocation so the query stays idempotent under the "
    "driver's repeated runs",
    tags=("sources",),
)
def insert_select_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    t = load_tables(spark, sf_dir, ("nation",))
    register_views(spark, sf_dir, ("nation",))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table = f"rt_nation_ins_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = _rt_dir(sf_dir, "nation_ins")
    # external table: the data lives under the tmpdir, never in a
    # cwd-relative spark-warehouse the driver's session would litter
    t["nation"].write.mode("overwrite").option("path", path).saveAsTable(table)
    spark.sql(
        f"INSERT INTO {table} "
        "SELECT n_nationkey + 100, n_name, n_regionkey FROM nation"
    )
    return (
        spark.table(table)
        .groupBy("n_regionkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "source_roundtrip_zorder",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    + dsum_sql("o_totalprice")
    + " AS total FROM orders "
    "WHERE o_custkey BETWEEN 20 AND 80 "
    "AND o_totalprice BETWEEN 50000 AND 250000",
    doc="Z-order (Morton-interleaved) clustered write graded end-to-end: "
    "orders written zorder=(8, [o_custkey, o_totalprice]) — each file "
    "covers a narrow tile of BOTH columns, so a 2-dim range predicate "
    "prunes files on either column (single-dim sort can only serve one); "
    "the read-back aggregate under that 2-dim predicate must equal the "
    "direct-on-fixture oracle, proving the synthetic-key repartition + "
    "sort + drop is lossless; tile quality itself is footer-asserted in "
    "tests/test_sources.py::test_zorder_write_clusters_both_dims",
    tags=("sources",),
)
def source_roundtrip_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    out = _rt_dir(sf_dir, "zorder_orders")
    write(t["orders"], path=out, fmt="parquet", zorder=(8, ["o_custkey", "o_totalprice"]))
    back = read(spark, out, fmt="parquet")
    return back.filter(
        F.col("o_custkey").between(20, 80)
        & F.col("o_totalprice").between(50000, 250000)
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
    )
