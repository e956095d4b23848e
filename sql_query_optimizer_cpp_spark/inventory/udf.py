"""UDF-surface inventory, part 2 — UDAF and UDTF (SURVEY.md §2.9).

Completes the user-defined trio (the scalar pandas UDF lives in
``text.py::text_tokens_pandas_udf``):

- ``agg_udaf_pandas`` — a grouped-aggregate pandas UDF (UDAF): per-group
  decimal-exact sum, carrying the SAME oracle as the built-in ``dsum``
  path, proving the custom aggregate agrees with the JVM aggregate.
- ``text_bigrams_udtf`` — a Python UDTF (table function, Arrow-optimized)
  lateral-joined per document row, expanding each text into its adjacent
  word pairs.

Like the scalar-UDF twin these exist to exercise the machinery honestly:
hot paths should (and in this repo do) use built-in expressions; a UDAF /
UDTF is the escape hatch when no built-in composition expresses the
semantics.  The reference has no user-defined anything (SURVEY.md §2.9 —
its function surface is whatever MySQL evaluates, ``engine/src/
query_rewriter.cpp`` only rewrites strings).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..functions import dsum_sql


@register(
    "agg_udaf_pandas",
    oracle="SELECT o_orderpriority, "
    + dsum_sql("o_totalprice")
    + " AS sum_price FROM orders GROUP BY o_orderpriority",
    doc="UDAF surface (§2.9): grouped-aggregate pandas UDF summing each "
    "group's prices through quantized Decimals (HALF_UP at scale 2 — the "
    "same rounding Spark's double->decimal cast applies), so the custom "
    "aggregate reproduces the built-in dsum oracle bit-for-bit",
    tags=("agg", "udf"),
)
def agg_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def exact_sum(v: pd.Series) -> float:
        # Decimal(float) is the exact binary value; quantize(HALF_UP)
        # mirrors Spark/DuckDB's CAST(double AS DECIMAL(18,2)); summing
        # Decimals is associative so partition order can't drift the result
        q = Decimal("0.01")
        return float(
            sum(Decimal(x).quantize(q, rounding=ROUND_HALF_UP) for x in v)
        )

    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(exact_sum("o_totalprice").alias("sum_price"))
    )


# Parallel unnests zip in DuckDB, giving (pos, bigram) pairs; Spark's UDTF
# emits the same rows.  Both split on single spaces (string_split / str
# .split(' ')), so empty tokens from runs would agree too.
_BIGRAMS_ORACLE = """
SELECT doc_id,
       unnest(generate_series(1, greatest(len(l) - 1, 0))) AS pos,
       unnest(list_transform(generate_series(1, greatest(len(l) - 1, 0)),
                             i -> l[i] || ' ' || l[i + 1])) AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
"""


@register(
    "text_bigrams_udtf",
    oracle=_BIGRAMS_ORACLE,
    doc="UDTF surface (§2.9): Arrow-optimized Python table function "
    "lateral-joined per document, expanding text into (pos, bigram) rows "
    "— the one-to-many shape (tokenize, sentence-split, chunk) a curation "
    "pipeline reaches for when built-ins can't express the expansion",
    tags=("text", "udf"),
)
def text_bigrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, bigram: string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams_udtf", Bigrams)
    t = load_tables(spark, sf_dir, ("documents",))
    t["documents"].createOrReplaceTempView("_udtf_documents")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram "
        "FROM _udtf_documents d, LATERAL bigrams_udtf(d.text) b"
    )
