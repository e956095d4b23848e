"""File-level bloom index (operators/fileindex.py): skipping power,
no-false-negative exactness, COW-rename correctness without
invalidation, and type-faithful probe hashing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.operators.fileindex import (
    build_bloom_index,
    estimate_bits,
    has_bloom_index,
    index_stats,
    probe_files,
    read_point_lookup,
)
from sql_query_optimizer_cpp_spark.operators.mutate import (
    delete_where,
    list_data_files,
)


@pytest.fixture()
def keyed_table(spark, tmp_path):
    """8 files, k range-clustered; lookup column 'ref' is scattered
    (hash-distributed) so footer min/max CANNOT prune it — exactly the
    workload the bloom index exists for."""
    path = str(tmp_path / "bloomtab")
    (
        spark.range(4000)
        .selectExpr(
            "id AS k",
            "CAST(hash(id) AS BIGINT) AS ref",
            "CAST(id % 13 AS DOUBLE) AS v",
        )
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.parquet(path)
    )
    return path


@pytest.fixture()
def no_auto_refresh(spark):
    """These tests exercise the MANUAL refresh machinery; the post-DML
    auto-refresh hook (r9) would do the work first and hide it."""
    from sql_query_optimizer_cpp_spark.operators.mutate import (
        AUTO_REFRESH_INDEX_CONF,
    )

    spark.conf.set(AUTO_REFRESH_INDEX_CONF, "false")
    yield
    spark.conf.set(AUTO_REFRESH_INDEX_CONF, "true")


def test_bloom_build_probe_and_skip(spark, keyed_table):
    n = build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    assert n == 8
    assert has_bloom_index(spark, keyed_table, "ref")
    # a present value: its file must be admitted and the result exact
    row = spark.read.parquet(keyed_table).where("k = 1234").first()
    cand = probe_files(spark, keyed_table, "ref", row["ref"])
    assert 1 <= len(cand) < 8  # skipped most files, kept the right one
    got = read_point_lookup(spark, keyed_table, "ref", row["ref"]).collect()
    assert [r["k"] for r in got] == [1234]
    # an absent value: no false negatives required, near-total skip likely
    miss = read_point_lookup(spark, keyed_table, "ref", -99999999)
    assert miss.count() == 0
    # NULL probe: SQL equality matches nothing
    assert probe_files(spark, keyed_table, "ref", None) == []
    assert read_point_lookup(spark, keyed_table, "ref", None).count() == 0


def test_bloom_exactness_over_many_keys(spark, keyed_table):
    """Index path == full-scan filter for every probed key (present and
    absent): blooms may admit extra files, never miss one."""
    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 14, num_hashes=4
    )
    base = spark.read.parquet(keyed_table)
    refs = [r["ref"] for r in base.where("k % 500 = 0").collect()]
    refs += [7, -7, 2**40]  # absent values
    for ref in refs:
        expect = sorted(
            r["k"] for r in base.where(F.col("ref") == ref).collect()
        )
        got = sorted(
            r["k"]
            for r in read_point_lookup(
                spark, keyed_table, "ref", ref
            ).collect()
        )
        assert got == expect, f"ref={ref}"


def test_bloom_correct_after_cow_rewrite(spark, keyed_table, no_auto_refresh):
    """COW rewrites produce fresh file names: the index treats unknown
    live files as always-candidates, so results stay exact with NO
    invalidation hook; rebuilding restores full skipping."""
    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    row = spark.read.parquet(keyed_table).where("k = 77").first()
    delete_where(spark, keyed_table, "k = 3999")  # rewrites the last file
    got = read_point_lookup(spark, keyed_table, "ref", row["ref"]).collect()
    assert [r["k"] for r in got] == [77]
    # the rewritten (unindexed) file is a candidate for ANY value
    cand = probe_files(spark, keyed_table, "ref", -123456789)
    rewritten = [f for f in cand if "part-cow-" in f]
    assert len(rewritten) == 1
    # rebuild covers the new file again
    assert build_bloom_index(spark, keyed_table, "ref") == 8
    assert len(probe_files(spark, keyed_table, "ref", -123456789)) < 8


def test_bloom_probe_type_faithful(spark, tmp_path):
    """String and small-int columns probe correctly: the literal is cast
    to the BUILD-time column type before hashing (xxhash64 is
    type-sensitive)."""
    path = str(tmp_path / "bloomstr")
    (
        spark.range(300)
        .selectExpr(
            "CONCAT('u-', id) AS uid", "CAST(id AS INT) AS small", "id"
        )
        .repartition(4)
        .write.parquet(path)
    )
    build_bloom_index(spark, path, "uid", num_bits=1 << 14)
    assert read_point_lookup(spark, path, "uid", "u-123").count() == 1
    assert read_point_lookup(spark, path, "uid", "nope").count() == 0
    build_bloom_index(spark, path, "small", num_bits=1 << 14)
    # Python int probes an INT column: cast makes the hash match
    assert read_point_lookup(spark, path, "small", 42).count() == 1


def test_bloom_stats_and_sizing(spark, keyed_table):
    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    st = index_stats(spark, keyed_table, "ref")
    assert st["indexed_files"] == 8
    assert st["num_bits"] == 1 << 16 and st["col_type"] == "bigint"
    assert 0 < st["sidecar_bytes"] < 8 * (1 << 16)  # compressed bitsets
    assert estimate_bits(1000, 0.01) % 64 == 0
    assert estimate_bits(1000, 0.01) >= 9000
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_index(spark, keyed_table, "ref", num_bits=100)
    with pytest.raises(ValueError, match="no column"):
        build_bloom_index(spark, keyed_table, "nope")


def test_bloom_auto_sizing_from_distinct_probe(spark, tmp_path):
    path = str(tmp_path / "bloomauto")
    spark.range(5000).selectExpr("CAST(hash(id) AS BIGINT) AS ref").repartition(
        4
    ).write.parquet(path)
    build_bloom_index(spark, path, "ref", num_bits=None, fpp=0.01)
    st = index_stats(spark, path, "ref")
    # ~1250 distinct/file * 1.1 pad -> m = -n ln p / ln2^2 ~ 13.2k bits
    assert 8_000 < st["num_bits"] < 32_000
    assert st["num_bits"] % 64 == 0
    row = spark.read.parquet(path).limit(1).first()
    assert read_point_lookup(spark, path, "ref", row["ref"]).count() >= 1


def test_bloom_refresh_incremental(spark, keyed_table, no_auto_refresh):
    """After a COW rewrite, refresh indexes ONLY the new file (O(new
    files) read) and restores full skipping without a rebuild."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        refresh_bloom_index,
    )

    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    delete_where(spark, keyed_table, "k = 100")   # rewrites one file
    delete_where(spark, keyed_table, "k = 3500")  # and another
    # degraded-but-correct: the 2 rewritten files are always-candidates
    assert len(probe_files(spark, keyed_table, "ref", -987654321)) == 2
    assert refresh_bloom_index(spark, keyed_table, "ref") == 2
    assert refresh_bloom_index(spark, keyed_table, "ref") == 0  # idempotent
    # full skipping again: the absent value admits ~no files
    assert len(probe_files(spark, keyed_table, "ref", -987654321)) <= 1
    # and present keys still find their rows through the refreshed rows
    row = spark.read.parquet(keyed_table).where("k = 3500 + 1").first()
    got = read_point_lookup(spark, keyed_table, "ref", row["ref"]).collect()
    assert [r["k"] for r in got] == [3501]


def test_bloom_multi_key_in_lookup(spark, keyed_table):
    """IN-list lookups run one probe pass and equal the full-scan IN
    filter exactly (present + absent + NULL members)."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        read_point_lookups,
    )

    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    base = spark.read.parquet(keyed_table)
    present = [r["ref"] for r in base.where("k IN (3, 1999, 3777)").collect()]
    vals = present + [-424242, None]
    got = sorted(
        r["k"]
        for r in read_point_lookups(
            spark, keyed_table, "ref", vals
        ).collect()
    )
    assert got == [3, 1999, 3777]
    # all-NULL / empty lists match nothing
    assert read_point_lookups(spark, keyed_table, "ref", [None]).count() == 0
    assert read_point_lookups(spark, keyed_table, "ref", []).count() == 0


def test_bloom_lookup_applies_deletion_vectors(spark, tmp_path):
    """The index read path composes with merge-on-read DML: a bloom
    lookup must never resurrect a tombstoned row (same contract as
    read_mor)."""
    from sql_query_optimizer_cpp_spark.operators.mor import (
        dv_delete_where,
        dv_update_where,
        read_mor,
    )
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        read_point_lookups,
    )

    path = str(tmp_path / "bloomdv")
    spark.range(1000).selectExpr(
        "id AS k", "CAST(hash(id) AS BIGINT) AS ref", "CAST(1 AS DOUBLE) AS v"
    ).repartition(4).write.parquet(path)
    build_bloom_index(spark, path, "ref", num_bits=1 << 16)
    base = spark.read.parquet(path)
    dead = base.where("k = 7").first()["ref"]
    alive = base.where("k = 8").first()["ref"]
    dv_delete_where(spark, path, "k = 7")
    dv_update_where(spark, path, {"v": "2.0"}, "k = 8")
    assert read_point_lookup(spark, path, "ref", dead).count() == 0
    got = read_point_lookup(spark, path, "ref", alive).collect()
    assert [(r["k"], r["v"]) for r in got] == [(8, 2.0)]
    multi = read_point_lookups(spark, path, "ref", [dead, alive])
    assert sorted(r["k"] for r in multi.collect()) == [8]
    assert read_mor(spark, path).count() == 999


def test_bloom_all_null_file_refresh_converges(spark, tmp_path):
    """A file whose indexed column is entirely NULL gets a zero-bitset
    row: refresh is idempotent, the file is never a candidate, and NULL
    rows are invisible to equality lookups anyway."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        refresh_bloom_index,
    )

    path = str(tmp_path / "bloomnull")
    spark.range(100).selectExpr("id AS k", "CAST(hash(id) AS BIGINT) AS ref").write.parquet(path)
    spark.range(50).selectExpr(
        "id + 100 AS k", "CAST(NULL AS BIGINT) AS ref"
    ).coalesce(1).write.mode("append").parquet(path)
    files = len(list_data_files(spark, path))
    assert build_bloom_index(spark, path, "ref", num_bits=1 << 14) == files
    assert refresh_bloom_index(spark, path, "ref") == 0  # converged
    # the all-NULL file is fully skippable: an absent probe admits nothing
    assert probe_files(spark, path, "ref", -1) == []
    row = spark.read.parquet(path).where("k = 5").first()
    assert read_point_lookup(spark, path, "ref", row["ref"]).count() == 1


def test_bloom_drop_and_list(spark, keyed_table):
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        drop_bloom_index,
        list_bloom_indexes,
    )

    assert list_bloom_indexes(spark, keyed_table) == []
    build_bloom_index(spark, keyed_table, "ref", num_bits=1 << 14)
    build_bloom_index(spark, keyed_table, "v", num_bits=1 << 14)
    assert list_bloom_indexes(spark, keyed_table) == ["ref", "v"]
    assert drop_bloom_index(spark, keyed_table, "v")
    assert not drop_bloom_index(spark, keyed_table, "v")  # already gone
    assert list_bloom_indexes(spark, keyed_table) == ["ref"]
    assert not has_bloom_index(spark, keyed_table, "v")


def test_bloom_refresh_after_type_widening_rebuilds(spark, tmp_path, no_auto_refresh):
    """xxhash64 is type-sensitive: after an evolve_schema widening of the
    indexed column (int → bigint), an append-only refresh would hash new
    files under the widened type while the probe still casts its literal
    to the stored narrow type — silent false negatives.  refresh must
    detect the mismatch and fall back to a full rebuild that also
    updates the stored col_type."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        _index_meta,
        refresh_bloom_index,
    )
    from sql_query_optimizer_cpp_spark.operators.mutate import merge_into

    path = str(tmp_path / "bloom_widen")
    (
        spark.range(400)
        .selectExpr("id AS k", "CAST(hash(id) AS INT) AS ref")
        .repartitionByRange(4, "k")
        .write.parquet(path)
    )
    build_bloom_index(spark, path, "ref", num_bits=1 << 14, num_hashes=5)
    assert _index_meta(spark, path, "ref")["col_type"] == "int"
    # widen ref to bigint through the engine's own evolution path, with a
    # value only a bigint can hold
    big = 1 << 40
    src = spark.createDataFrame([(7, big)], "k long, ref long")
    merge_into(
        spark, path, src, on=["k"], matched_set={"ref": "src_ref"},
        evolve_schema=True,
    )
    n_files = len(list_data_files(spark, path, recursive=True))
    assert refresh_bloom_index(spark, path, "ref") == n_files  # full rebuild
    assert _index_meta(spark, path, "ref")["col_type"] == "bigint"
    # no false negatives under the widened type: the new big value...
    got = read_point_lookup(spark, path, "ref", big).collect()
    assert [r["k"] for r in got] == [7]
    # ...and an old int-era value both resolve
    row = spark.read.parquet(path).where("k = 200").first()
    got = read_point_lookup(spark, path, "ref", int(row["ref"])).collect()
    assert 200 in [r["k"] for r in got]


def test_bloom_auto_refresh_after_dml(spark, keyed_table):
    """r9: committed DML auto-refreshes every bloom sidecar (conf
    spark.sqlopt.autoRefreshIndexes, default on), so skipping is earned
    back immediately — no manual refresh step."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        refresh_bloom_index,
    )

    build_bloom_index(
        spark, keyed_table, "ref", num_bits=1 << 16, num_hashes=5
    )
    delete_where(spark, keyed_table, "k = 100")  # rewrites one file
    # the rewritten file was re-indexed inside the DML commit: an absent
    # value admits ~no files and a manual refresh has nothing to do
    assert len(probe_files(spark, keyed_table, "ref", -987654321)) <= 1
    assert refresh_bloom_index(spark, keyed_table, "ref") == 0
    # present keys keep resolving through the auto-refreshed rows
    row = spark.read.parquet(keyed_table).where("k = 101").first()
    got = read_point_lookup(spark, keyed_table, "ref", row["ref"]).collect()
    assert [r["k"] for r in got] == [101]
