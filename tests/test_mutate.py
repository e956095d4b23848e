"""Copy-on-write DML (operators/mutate.py): executed UPDATE/DELETE/MERGE.

The reference parses these verbs and stops (engine/src/parser.cpp:232-296);
here they execute, so the tests assert the two properties that make COW
DML trustworthy at scale: results are exactly SQL-semantics, and ONLY the
files containing affected rows are rewritten (everything else is untouched
on disk, byte-for-byte the same file names).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.operators.mutate import (
    MutationStats,
    delete_where,
    execute_dml,
    list_data_files,
    merge_into,
    update_where,
)


def _names(spark, path):
    return {os.path.basename(f) for f in list_data_files(spark, path)}


@pytest.fixture()
def cow_table(spark, tmp_path):
    """Range-clustered 4-file table over k=0..399 (k DIV 100 per file)."""
    path = str(tmp_path / "cow")
    df = spark.range(400).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.when(F.col("id") % 50 == 0, None)
        .otherwise(F.concat(F.lit("row-"), F.col("id")))
        .alias("s"),
    )
    df.repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(path)
    return path


def test_delete_prunes_and_deletes(spark, cow_table):
    before = _names(spark, cow_table)
    assert len(before) == 4
    st = delete_where(spark, cow_table, "k >= 100 AND k < 120")
    assert st == MutationStats(files_total=4, files_rewritten=1, rows_matched=20)
    after = _names(spark, cow_table)
    # 3 untouched files still there under their ORIGINAL names; exactly one
    # replaced by a part-cow file
    assert len(before & after) == 3
    assert all(n.startswith("part-cow-") for n in after - before)
    back = spark.read.parquet(cow_table)
    assert back.count() == 380
    assert back.where("k >= 100 AND k < 120").count() == 0


def test_delete_null_predicate_keeps_row(spark, cow_table):
    # SQL three-valued logic: WHERE s LIKE ... is NULL for s IS NULL -> kept
    st = delete_where(spark, cow_table, "s NOT LIKE 'row-1%'")
    back = spark.read.parquet(cow_table)
    assert back.where("s IS NULL").count() == 8  # k in {0,50,...,350}
    kept = back.where("s IS NOT NULL").count()
    assert kept == back.count() - 8
    assert st.rows_matched + back.count() == 400


def test_delete_no_match_rewrites_nothing(spark, cow_table):
    before = _names(spark, cow_table)
    st = delete_where(spark, cow_table, "k < 0")
    assert st.files_rewritten == 0
    assert _names(spark, cow_table) == before


def test_update_preserves_schema_and_prunes(spark, cow_table):
    before_schema = spark.read.parquet(cow_table).schema
    st = update_where(
        spark, cow_table, {"v": "v + 100", "s": F.lit("hot")}, "k BETWEEN 200 AND 205"
    )
    assert st.files_rewritten == 1 and st.rows_matched == 6
    back = spark.read.parquet(cow_table)
    assert back.schema == before_schema  # no type drift in rewritten files
    hot = back.where("k BETWEEN 200 AND 205").collect()
    assert all(r["s"] == "hot" and r["v"] == (r["k"] % 7) + 100 for r in hot)
    assert back.where("s = 'hot'").count() == 6
    assert back.count() == 400


def test_update_unknown_column_raises(spark, cow_table):
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, cow_table, {"nope": "1"}, "k = 1")


def test_merge_upsert(spark, cow_table):
    source = spark.createDataFrame(
        [Row(k=10, delta=1000.0), Row(k=110, delta=2000.0), Row(k=999, delta=3000.0)]
    )
    st = merge_into(
        spark,
        cow_table,
        source,
        on=["k"],
        matched_set={"v": "v + src_delta"},
        insert_values={"s": F.lit("inserted"), "v": "src_delta"},
    )
    assert st.files_rewritten == 2  # k=10 file and k=110 file; other 2 untouched
    assert st.rows_matched == 2 and st.rows_inserted == 1
    back = spark.read.parquet(cow_table)
    assert back.count() == 401
    got = {r["k"]: r for r in back.where("k IN (10, 110, 999)").collect()}
    assert got[10]["v"] == (10 % 7) + 1000.0
    assert got[110]["v"] == (110 % 7) + 2000.0
    assert got[999]["v"] == 3000.0 and got[999]["s"] == "inserted"
    # non-matched neighbors untouched
    assert back.where("k = 11").first()["v"] == 11 % 7


def test_merge_duplicate_source_keys_refused(spark, cow_table):
    dup = spark.createDataFrame([Row(k=1, delta=1.0), Row(k=1, delta=2.0)])
    with pytest.raises(ValueError, match="duplicate join keys"):
        merge_into(spark, cow_table, dup, on=["k"], matched_set={"v": "src_delta"})


def test_execute_dml_update_and_delete(spark, cow_table):
    tables = {"t": cow_table}
    st = execute_dml(
        spark,
        "UPDATE t SET v = least(v, 1.0), s = concat('u-', s) WHERE k < 3",
        tables,
    )
    assert st.rows_matched == 3
    st = execute_dml(spark, "DELETE FROM t WHERE k >= 398", tables)
    assert st.rows_matched == 2
    back = spark.read.parquet(cow_table)
    assert back.count() == 398
    assert back.where("k = 1").first()["s"] == "u-row-1"
    with pytest.raises(ValueError, match="unknown table"):
        execute_dml(spark, "DELETE FROM nope WHERE 1=1", tables)
    with pytest.raises(ValueError, match="not an executable"):
        execute_dml(spark, "SELECT 1", tables)


def test_partitioned_dir_refused(spark, tmp_path):
    path = str(tmp_path / "part")
    spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    ).write.partitionBy("p").parquet(path)
    with pytest.raises(NotImplementedError, match="hive-partitioned"):
        delete_where(spark, path, "id = 1")
