"""Sources/sinks: format round-trips, partitioned writes with pruning,
bucketed tables, and executable INSERT (reference's S6 is parse-only)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.catalog import load_tables
from sql_query_optimizer_cpp_spark.sources import read, write

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def nation(spark):
    return load_tables(spark, SF_DIR, ("nation",))["nation"]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, nation, fmt):
    with tempfile.TemporaryDirectory() as d:
        write(nation, f"{d}/out", fmt=fmt)
        schema = nation.schema if fmt in ("csv", "json") else None
        back = read(spark, f"{d}/out", fmt=fmt, schema=schema)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )


def test_partitioned_write_prunes(spark, nation):
    with tempfile.TemporaryDirectory() as d:
        write(nation, f"{d}/out", partition_by=["n_regionkey"])
        back = read(spark, f"{d}/out").filter(F.col("n_regionkey") == 2)
        plan = back._jdf.queryExecution().executedPlan().toString()
        # partition filter appears as PartitionFilters, not a row filter
        assert "PartitionFilters" in plan
        assert back.count() == nation.filter("n_regionkey = 2").count()


def test_bucketed_join_avoids_shuffle(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    write(
        orders,
        fmt="parquet",
        bucket_by=(4, ["o_custkey"]),
        table="orders_bucketed_test",
        mode="overwrite",
    )
    t = spark.table("orders_bucketed_test")
    joined = t.alias("a").join(
        t.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # self-join on the bucket key: no exchange needed on either side
    assert "Exchange hashpartitioning(o_custkey" not in plan
    spark.sql("DROP TABLE IF EXISTS orders_bucketed_test")


def test_insert_executes(spark, nation):
    """The reference parses INSERT but never executes it
    (engine/src/cli.cpp:321-323); ours executes."""
    spark.sql("DROP TABLE IF EXISTS nation_ins_test")
    nation.write.saveAsTable("nation_ins_test")
    before = spark.table("nation_ins_test").count()
    spark.sql(
        "INSERT INTO nation_ins_test VALUES (99, 'NATION_TEST', 0)"
    )
    after = spark.table("nation_ins_test").count()
    assert after == before + 1
    row = spark.sql(
        "SELECT n_name FROM nation_ins_test WHERE n_nationkey = 99"
    ).collect()
    assert row[0].n_name == "NATION_TEST"
    spark.sql("DROP TABLE IF EXISTS nation_ins_test")


def test_jdbc_gated(spark):
    from sql_query_optimizer_cpp_spark.sources import read_jdbc

    with pytest.raises((NotImplementedError, Exception)):
        read_jdbc(
            spark, "jdbc:mysql://localhost:3306/db", "t"
        ).collect()


def test_jdbc_live_roundtrip(spark, tmp_path):
    """LIVE JDBC parity path: pyspark ships the Derby embedded driver, so
    the reference's MySQL-connector analog (mysql_connector.cpp:22-186)
    can be exercised end-to-end — including the partitioned range read
    that makes a JDBC scan parallel (8 range queries on the id column),
    not just the no-driver error path."""
    from sql_query_optimizer_cpp_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute("CREATE TABLE people (id INT PRIMARY KEY, name VARCHAR(20))")
        for i in range(20):
            st.execute(f"INSERT INTO people VALUES ({i}, 'name{i}')")
        st.close()
    finally:
        conn.close()

    df = read_jdbc(
        spark,
        f"jdbc:derby:{tmp_path}/derbydb",
        "people",
        partition_column="id",
        num_partitions=8,
        lower_bound=0,
        upper_bound=20,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert df.rdd.getNumPartitions() == 8  # the parallel range read
    rows = {(r.ID, r.NAME) for r in df.collect()}
    assert rows == {(i, f"name{i}") for i in range(20)}


def test_jdbc_write_roundtrip(spark, tmp_path):
    """JDBC sink: write a DataFrame into Derby (overwrite creates the
    table), read it back through the same connector."""
    from sql_query_optimizer_cpp_spark.sources import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/derbyw;create=true"
    df = spark.range(50).withColumnRenamed("id", "k")
    write_jdbc(
        df,
        url,
        "kv",
        mode="overwrite",
        num_partitions=2,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    back = read_jdbc(
        spark,
        f"jdbc:derby:{tmp_path}/derbyw",
        "kv",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # Spark-created Derby tables keep the quoted lowercase column name
    # (unlike the DDL-created uppercase one above) — access positionally
    assert sorted(r[0] for r in back.collect()) == list(range(50))


def test_sort_for_skipping_clusters_row_groups(tmp_path, spark):
    """sort_for_skipping must produce parquet files whose per-file
    [min, max] ranges on the sort key are (near-)disjoint — the footer
    property scan-time skipping runs on.  The unsorted write of the same
    data is the control: its file ranges all span ~the full domain."""
    import pyarrow.parquet as pq

    from sql_query_optimizer_cpp_spark.catalog import load_tables
    from sql_query_optimizer_cpp_spark.sources.writers import write

    from .conftest import SF_DIR

    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    lo, hi = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    domain = hi - lo

    def file_ranges(path):
        out = []
        for f in sorted((tmp_path / path).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }["o_totalprice"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    write(
        orders.repartition(8),
        path=str(tmp_path / "unsorted"),
    )
    write(
        orders.repartition(8),
        path=str(tmp_path / "sorted"),
        sort_for_skipping=(8, ["o_totalprice"]),
    )

    unsorted_spans = [mx - mn for mn, mx in file_ranges("unsorted")]
    sorted_ranges = sorted(file_ranges("sorted"))
    sorted_spans = [mx - mn for mn, mx in sorted_ranges]
    assert len(sorted_ranges) > 1
    # control: every hash-partitioned file spans ~the whole domain
    assert min(unsorted_spans) > 0.9 * domain
    # clustered: each file covers a narrow slice...
    assert max(sorted_spans) < 0.2 * domain
    # ...and consecutive files don't overlap (range partitioning)
    for (_, prev_max), (next_min, _) in zip(sorted_ranges, sorted_ranges[1:]):
        assert next_min >= prev_max


def test_zorder_write_clusters_both_dims(tmp_path, spark):
    """zorder=(16, [x, y]) must give every file a NARROW min/max footer
    range on BOTH columns (each point/range predicate on either column
    then skips most files); the single-dim sort control clusters x
    perfectly but leaves y spanning ~the full domain in every file."""
    import pyarrow.parquet as pq

    from sql_query_optimizer_cpp_spark.sources.writers import write

    n = 1 << 14
    side = 1 << 7
    df = spark.range(n).selectExpr(
        f"CAST(id % {side} AS DOUBLE) AS x",
        f"CAST(id DIV {side} AS DOUBLE) AS y",
        "id AS payload",
    )

    def file_ranges(path, col):
        out = []
        for f in sorted((tmp_path / path).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    def avg_files_hit(path, col):
        """Mean number of files a footer-pruning point query must open,
        over probe points across the domain — the actual skip metric."""
        ranges = file_ranges(path, col)
        probes = [float(p) for p in range(0, side, 8)]
        return sum(
            sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes
        ) / len(probes)

    write(df, path=str(tmp_path / "z"), zorder=(16, ["x", "y"]))
    write(df, path=str(tmp_path / "lin"), sort_for_skipping=(16, ["x"]))

    assert len(file_ranges("z", "x")) == 16
    # z-order: a point predicate on EITHER column opens well under half
    # the files (ideal 4/16 for a 4x4 tiling; allow curve-boundary slack)
    assert avg_files_hit("z", "x") <= 8
    assert avg_files_hit("z", "y") <= 8
    # control: perfect on the sort column, useless on the other — every
    # probe on y must open every file
    assert avg_files_hit("lin", "x") <= 2
    assert avg_files_hit("lin", "y") >= 15


def test_zorder_single_column_string_normalized(tmp_path, spark):
    """zorder=(n, "col") — scalar string column — must not be iterated
    per-character (the (8, 'ts') trap sort_for_skipping guards against)."""
    from sql_query_optimizer_cpp_spark.sources.writers import write

    df = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS ts", "id AS payload")
    write(df, path=str(tmp_path / "zs"), zorder=(2, "ts"))
    back = spark.read.parquet(str(tmp_path / "zs"))
    assert back.count() == 100 and set(back.columns) == {"ts", "payload"}
