#!/usr/bin/env python
"""Narrative demo of the copy-on-write DML layer — the capability the
reference only parses (engine/src/parser.cpp:232-296), executed.

Walks a parquet table through the lakehouse lifecycle:

1. materialize orders range-clustered on the mutation key,
2. snapshot v1,
3. DELETE + UPDATE copy-on-write (file-pruned; stats show how few files
   each verb actually rewrote),
4. MERGE an upsert batch (matched update + fresh inserts),
5. time-travel back to v1 while the live table shows the mutations,
6. compact the small files the DML created,
7. vacuum after dropping the snapshot,
8. enable the auto-version log: later DML commits numbered versions
   (MVCC for readers), retention via drop_versions_before + vacuum.

Usage: python examples/lakehouse_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.catalog import load_tables
from sql_query_optimizer_cpp_spark.operators.mutate import (
    compact,
    create_snapshot,
    delete_where,
    drop_snapshot,
    merge_into,
    read_snapshot,
    update_where,
    vacuum,
)
from sql_query_optimizer_cpp_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="lakehouse-demo")
    path = tempfile.mkdtemp() + "/orders"

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.parquet(path)
    )
    n0 = spark.read.parquet(path).count()
    print(f"table: {n0} rows, 8 files range-clustered on o_totalprice\n")

    print(f"snapshot v1 pinned ({create_snapshot(spark, path, 'v1')} files)\n")

    st = delete_where(
        spark, path, "o_orderstatus = 'F' AND o_totalprice < 50000", retain=True
    )
    print(f"DELETE low-value finished orders: {st.render()}")

    st = update_where(
        spark, path, {"o_orderpriority": "'1-URGENT'"},
        "o_totalprice > 400000", retain=True,
    )
    print(f"UPDATE top-price priorities:      {st.render()}")

    upsert = spark.createDataFrame(
        [(10_000_001, 0, "O", 123456.78, None, "5-LOW"),
         (10_000_002, 1, "O", 234567.89, None, "5-LOW")],
        orders.schema,
    )
    st = merge_into(
        spark, path, upsert, on=["o_orderkey"],
        matched_set={"o_totalprice": "src_o_totalprice"},
        retain=True,
    )
    print(f"MERGE upsert batch:               {st.render()}\n")

    live = spark.read.parquet(path)
    old = read_snapshot(spark, path, "v1")
    print(f"live rows: {live.count()}   time-travel v1 rows: {old.count()}")
    print(
        "urgent now:",
        live.where("o_orderpriority = '1-URGENT'").count(),
        "  urgent in v1:",
        old.where("o_orderpriority = '1-URGENT'").count(),
        "\n",
    )

    st = compact(spark, path, target_bytes=8 * 1024 * 1024)
    print(f"OPTIMIZE (compact):               {st.render()}")

    drop_snapshot(spark, path, "v1")
    print(f"vacuum after dropping v1:         {vacuum(spark, path)} files reclaimed")

    # 8. version log: every further mutation auto-commits a numbered
    #    version inside the writer lock — MVCC for readers
    from sql_query_optimizer_cpp_spark.operators.mutate import (
        drop_versions_before,
        enable_versioning,
        read_version,
        table_versions,
    )

    enable_versioning(spark, path)
    delete_where(spark, path, "o_totalprice > 400000")
    update_where(
        spark, path, {"o_orderpriority": "'2-HIGH'"}, "o_orderpriority = '5-LOW'"
    )
    print(
        f"\nversion log: {table_versions(spark, path)} "
        f"(v1 rows {read_version(spark, path, 1).count()}, "
        f"latest rows {read_version(spark, path).count()})"
    )
    dropped = drop_versions_before(spark, path, keep_last=1)
    print(f"retention: dropped {dropped} old versions, "
          f"vacuum reclaimed {vacuum(spark, path)} files")

    spark.stop()


if __name__ == "__main__":
    main()
