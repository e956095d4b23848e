"""Merge-on-read deletion vectors (operators/mor.py): DV delete/update
semantics, read_mor equivalence, materialize, and the mutual-exclusion
guards against the copy-on-write / versioning layers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.operators import mutate as m
from sql_query_optimizer_cpp_spark.operators.mor import (
    dv_count,
    dv_delete_where,
    dv_file_stats,
    dv_update_where,
    has_deletion_vectors,
    materialize_deletes,
    read_mor,
)


def _flat(spark, tmp_path, n=100, files=4):
    path = str(tmp_path / "mor_flat")
    (
        spark.range(n)
        .selectExpr(
            "id AS k",
            "CAST(id % 7 AS DOUBLE) AS v",
            "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 3 END AS grp",
        )
        .repartitionByRange(files, "k")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_dv_delete_and_read_mor(spark, tmp_path):
    path = _flat(spark, tmp_path)
    n = dv_delete_where(spark, path, "k >= 80")
    assert n == 20
    assert has_deletion_vectors(spark, path)
    assert dv_count(spark, path) == 20
    # MOR read applies the vectors; the base read (by contract) does not
    assert read_mor(spark, path).count() == 80
    assert spark.read.parquet(path).count() == 100
    # no data file was rewritten: the tombstones are the whole mutation
    assert len(m.list_data_files(spark, path)) == 4
    # overlapping re-delete never double-counts
    assert dv_delete_where(spark, path, "k >= 70") == 10
    assert dv_count(spark, path) == 30
    assert read_mor(spark, path).count() == 70


def test_dv_delete_three_valued_null(spark, tmp_path):
    path = _flat(spark, tmp_path)
    # grp is NULL on k % 10 == 0: NULL predicate keeps the row (SQL DELETE)
    n = dv_delete_where(spark, path, "grp = 0")
    kept = read_mor(spark, path)
    assert kept.where("grp IS NULL").count() == 10
    assert kept.where("grp = 0").count() == 0
    assert n + kept.count() == 100


def test_dv_src_file_is_table_relative(spark, tmp_path):
    path = _flat(spark, tmp_path)
    dv_delete_where(spark, path, "k < 5")
    rows = spark.read.parquet(path + "/_dv").collect()
    rels = {m._rel_to_table(path, f) for f in m.list_data_files(spark, path)}
    for r in rows:
        assert not r.src_file.startswith(("file:", "/")), r.src_file
        assert r.src_file in rels
        assert r.row_idx >= 0


def test_dv_update_then_read(spark, tmp_path):
    path = _flat(spark, tmp_path)
    n = dv_update_where(spark, path, {"v": "v + 100"}, "k < 10")
    assert n == 10
    out = read_mor(spark, path)
    assert out.count() == 100  # update preserves cardinality
    assert out.where("k < 10 AND v >= 100").count() == 10
    assert out.where("k >= 10 AND v >= 100").count() == 0
    # cast-back schema stability: v stays DOUBLE
    assert dict(out.dtypes)["v"] == "double"
    # the statement must not tombstone its own appended copies even
    # though they still match the predicate
    assert dv_count(spark, path) == 10


def test_dv_update_skips_deleted_rows(spark, tmp_path):
    path = _flat(spark, tmp_path)
    dv_delete_where(spark, path, "k < 20")
    # an update whose predicate covers deleted rows must not resurrect them
    n = dv_update_where(spark, path, {"v": "0.0"}, "k < 40")
    assert n == 20
    out = read_mor(spark, path)
    assert out.count() == 80
    assert out.where("k < 20").count() == 0
    assert out.where("k >= 20 AND k < 40 AND v = 0.0").count() == 20


def test_dv_update_unknown_column_and_partitioned(spark, tmp_path):
    path = _flat(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        dv_update_where(spark, path, {"nope": "1"}, "k < 5")
    ppath = str(tmp_path / "mor_part")
    (
        spark.range(40)
        .selectExpr("id AS k", "id % 2 AS side", "CAST(id AS DOUBLE) AS v")
        .write.partitionBy("side")
        .mode("overwrite")
        .parquet(ppath)
    )
    # partitioned MOR update: copies route to their key=value dirs; a
    # predicate may reference the partition column
    n = dv_update_where(spark, ppath, {"v": "v + 100"}, "side = 1 AND k < 9")
    assert n == 4  # k in {1,3,5,7}
    out = read_mor(spark, ppath)
    assert out.count() == 40
    assert out.where("v >= 100").count() == 4
    assert out.where("side = 0 AND v >= 100").count() == 0
    # assigning the partition column is refused, same rule as COW
    with pytest.raises(ValueError, match="partition columns"):
        dv_update_where(spark, ppath, {"side": "0"}, "k < 5")
    # materialize folds everything back into a plain partitioned table
    materialize_deletes(spark, ppath)
    back = spark.read.parquet(ppath)
    assert back.count() == 40 and back.where("v >= 100").count() == 4


def test_dv_partitioned_delete_and_materialize(spark, tmp_path):
    path = str(tmp_path / "mor_part2")
    (
        spark.range(60)
        .selectExpr("id AS k", "id % 3 AS side", "CAST(id AS DOUBLE) AS v")
        .write.partitionBy("side")
        .mode("overwrite")
        .parquet(path)
    )
    # predicate touches the partition column AND a data column
    n = dv_delete_where(spark, path, "side = 1 OR k < 6")
    assert n == 60 // 3 + 4  # side==1 (20) plus k in {0,2,3,5} not side 1
    assert read_mor(spark, path).count() == 60 - n
    stats = materialize_deletes(spark, path)
    assert stats.files_rewritten >= 1
    assert not has_deletion_vectors(spark, path)
    back = spark.read.parquet(path)
    assert back.count() == 60 - n
    assert back.where("side = 1").count() == 0
    assert set(back.columns) == {"k", "side", "v"}


def test_materialize_then_cow_usable_again(spark, tmp_path):
    path = _flat(spark, tmp_path)
    dv_delete_where(spark, path, "k >= 90")
    dv_update_where(spark, path, {"v": "v * 2"}, "k < 3")
    expected = read_mor(spark, path).agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    materialize_deletes(spark, path)
    assert not has_deletion_vectors(spark, path)
    base = spark.read.parquet(path)
    got = base.agg(F.count("*").alias("n"), F.sum("v").alias("s")).first()
    assert got.n == expected.n and got.s == pytest.approx(expected.s)
    # COW verbs work again after materialize
    st = m.delete_where(spark, path, "k = 50")
    assert st.rows_matched == 1
    # idempotent no-op on a vector-less table
    st2 = materialize_deletes(spark, path)
    assert st2.files_rewritten == 0


def test_cow_and_versioning_refuse_dv_tables(spark, tmp_path):
    path = _flat(spark, tmp_path)
    dv_delete_where(spark, path, "k = 1")
    with pytest.raises(ValueError, match="deletion vectors"):
        m.delete_where(spark, path, "k = 2")
    with pytest.raises(ValueError, match="deletion vectors"):
        m.update_where(spark, path, {"v": "0.0"}, "k = 2")
    with pytest.raises(ValueError, match="deletion vectors"):
        m.compact(spark, path)
    with pytest.raises(ValueError, match="deletion vectors"):
        m.occ_delete_where(spark, path, "k = 2")
    with pytest.raises(ValueError, match="deletion vectors"):
        m.enable_versioning(spark, path)
    with pytest.raises(ValueError, match="deletion vectors"):
        m.create_snapshot(spark, path, "s1")


def test_dv_refuses_versioned_tables(spark, tmp_path):
    path = _flat(spark, tmp_path)
    m.enable_versioning(spark, path)
    with pytest.raises(ValueError, match="version log / snapshots"):
        dv_delete_where(spark, path, "k = 1")
    with pytest.raises(ValueError, match="version log / snapshots"):
        dv_update_where(spark, path, {"v": "0.0"}, "k = 1")


def test_dv_update_constraint_rollback(spark, tmp_path):
    path = _flat(spark, tmp_path)
    m.add_constraint(spark, path, "v_nonneg", "v >= 0")
    files_before = m.list_data_files(spark, path)
    with pytest.raises(m.ConstraintViolation, match="v_nonneg"):
        dv_update_where(spark, path, {"v": "-1.0"}, "k < 5")
    # nothing became visible: no new files, no tombstones, data unchanged
    assert m.list_data_files(spark, path) == files_before
    assert not has_deletion_vectors(spark, path)
    assert read_mor(spark, path).where("v < 0").count() == 0
    # a passing update still works under the constraint
    assert dv_update_where(spark, path, {"v": "v + 1"}, "k < 5") == 5


def test_dv_file_stats(spark, tmp_path):
    path = _flat(spark, tmp_path)
    dv_delete_where(spark, path, "k < 30")
    st = dv_file_stats(spark, path)
    rows = st.collect()
    assert sum(r.dead_rows for r in rows) == 30
    # range-clustered on k: the delete concentrates in the low-k files
    assert len(rows) < 4


def test_dv_writer_lock_excludes_cow(spark, tmp_path):
    path = _flat(spark, tmp_path)
    # a held writer lock blocks the MOR verbs exactly like the COW verbs
    with m._writer_lock(spark, path):
        with pytest.raises(m._WriterLockHeld):
            dv_delete_where(spark, path, "k = 1")


def test_read_mor_plan_pushdown_and_broadcast(spark, tmp_path):
    """The MOR read must stay 100 TB-shaped: base-scan filter pushdown
    survives the identity projection, the DV side broadcasts (no shuffle
    of base data), and column pruning reaches the scan."""
    path = _flat(spark, tmp_path, n=1000)
    dv_delete_where(spark, path, "k >= 900")
    out = read_mor(spark, path).where("k < 100").select("v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan
    scan = out._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [IsNotNull(k), LessThan(k,100)" in scan
    # pruned: k (filter), v (projection), row_index (identity) — never grp
    assert "grp" not in scan.split("ReadSchema")[1].split("\n")[0]


def test_execute_dml_mor_routing(spark, tmp_path):
    """The textual front-end reaches the MOR verbs via mor=True, with the
    same statement text the COW path takes."""
    from sql_query_optimizer_cpp_spark.operators.mutate import execute_dml

    path = _flat(spark, tmp_path)
    tables = {"t": path}
    st = execute_dml(spark, "DELETE FROM t WHERE k >= 90", tables, mor=True)
    assert st.rows_matched == 10 and st.files_rewritten == 0
    st = execute_dml(
        spark, "UPDATE t SET v = v + 50 WHERE k < 5", tables, mor=True
    )
    assert st.rows_matched == 5 and st.files_rewritten == 0
    out = read_mor(spark, path)
    assert out.count() == 90
    assert out.where("v >= 50").count() == 5
    with pytest.raises(ValueError, match="mutually exclusive"):
        execute_dml(
            spark, "DELETE FROM t WHERE k = 1", tables,
            mor=True, optimistic=True,
        )
    with pytest.raises(ValueError, match="MERGE under mor"):
        execute_dml(
            spark,
            "MERGE INTO t USING t ON t.k = t.k "
            "WHEN MATCHED THEN UPDATE SET v = 0",
            tables,
            mor=True,
        )


def test_materialize_min_dead_ratio_incremental(spark, tmp_path):
    """Ratio-driven materialize rewrites only files past the threshold;
    the untouched files keep their vectors (read_mor stays the read path)
    and the store shrinks by the graduated files' entries."""
    path = _flat(spark, tmp_path, n=100, files=4)  # 25 rows per file
    # file 0: 20/25 dead (0.8); file 3: 2/25 dead (0.08)
    dv_delete_where(spark, path, "k < 20 OR k IN (80, 81)")
    assert dv_count(spark, path) == 22
    # below every file's ratio: nothing rewritten, vectors intact
    st = materialize_deletes(spark, path, min_dead_ratio=0.9)
    assert st.files_rewritten == 0
    assert dv_count(spark, path) == 22
    # 0.5 graduates only the 0.8-dead file
    st = materialize_deletes(spark, path, min_dead_ratio=0.5)
    assert st.files_rewritten == 1
    assert has_deletion_vectors(spark, path)
    assert dv_count(spark, path) == 2  # the graduated file's 20 pruned
    assert read_mor(spark, path).count() == 78
    # full materialize finishes the rest
    st = materialize_deletes(spark, path)
    assert st.files_rewritten == 1
    assert not has_deletion_vectors(spark, path)
    assert spark.read.parquet(path).count() == 78


def test_dv_working_column_collision_guard(spark, tmp_path):
    path = str(tmp_path / "mor_clash")
    spark.range(10).selectExpr("id AS k", "'x' AS __src_file").write.parquet(
        path
    )
    with pytest.raises(ValueError, match="collide with the merge-on-read"):
        dv_delete_where(spark, path, "k < 5")


def test_dv_no_match_is_a_cheap_noop(spark, tmp_path):
    path = _flat(spark, tmp_path)
    assert dv_delete_where(spark, path, "k < 0") == 0
    assert not has_deletion_vectors(spark, path)
    assert dv_update_where(spark, path, {"v": "0.0"}, "k < 0") == 0
    assert not has_deletion_vectors(spark, path)
    # no-op left no appended files either
    assert len(m.list_data_files(spark, path)) == 4


def test_partial_materialize_never_leaves_store_unprotected(spark, tmp_path):
    """The pruned store is moved in BESIDE the old batch files before they
    are deleted — at no point is _dv absent while live tombstones exist.
    Verified by the end state (pruned entries correct) plus the ordering
    contract: the staged prune lands under _dv via _move_in, so the store
    dir itself is never deleted on the partial path."""
    path = _flat(spark, tmp_path, n=100, files=4)
    dv_delete_where(spark, path, "k < 25 OR k = 99")  # file0 fully dead
    st = materialize_deletes(spark, path, min_dead_ratio=0.9)
    assert st.files_rewritten == 1
    assert has_deletion_vectors(spark, path)
    assert dv_count(spark, path) == 1  # only the k=99 tombstone survives
    assert read_mor(spark, path).count() == 74
