"""Writers: parquet/orc/csv/json sinks with the scale-relevant layout knobs.

partition_by: hive-style directory partitioning — readers prune partitions
from WHERE clauses for free (the Spark analog of the reference's index
selection, SURVEY.md §2.1 S2).

bucket_by: pre-shuffled, co-located layout — equi-joins and aggregations on
the bucket key skip their shuffle entirely.  Bucketed writes must go
through ``saveAsTable`` (the bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FORMATS = ("parquet", "orc", "csv", "json")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton (Z-order) key over numeric/date/timestamp columns — the
    MULTI-dimension extension of ``sort_for_skipping``.

    A single-dimension range sort gives perfect skipping on one column and
    none on the others; bit-interleaving the rank of each column gives
    every listed column ~``1/2^(bits/D)`` selectivity per file, so point or
    range predicates on ANY of them prune files (Delta's OPTIMIZE ZORDER
    BY; the multi-attribute clustering literature's standard answer).

    Mechanics: one small aggregate collects per-column min/max (driver
    scalars, metadata scale); each value is scaled to a ``bits``-wide
    integer rank (NULLs rank 0, degenerate min==max columns rank 0); the
    ranks' bits interleave into one BIGINT via shift/OR — all built-in
    expressions, whole-stage codegen'd, no UDF.  Linear scaling assumes
    roughly uniform value spread; heavily skewed columns would want
    quantile-based ranks (approxQuantile boundaries) — same interleave,
    different rank function.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    d = len(cols)
    if bits * d > 63:
        raise ValueError(f"bits*len(cols) must fit a BIGINT, got {bits * d}")
    aggs = []
    for c in cols:
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"mn_{c}"), F.max(num).alias(f"mx_{c}")]
    row = df.agg(*aggs).first()
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        num = F.col(c).cast("double")
        if mn is None or mx is None or mx == mn:
            rank = F.lit(0).cast("long")
        else:
            scaled = (num - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(top))
            rank = F.coalesce(
                F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(top))),
                F.lit(0.0),
            ).cast("long")
        for b in range(bits):
            bit = F.shiftright(rank, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + ci))
    return z


def write(
    df: DataFrame,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    sort_for_skipping: list[str] | tuple[int, list[str]] | None = None,
    zorder: tuple[int, list[str]] | None = None,
    table: str | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` (file layout) or ``table`` (catalog table;
    required for bucket_by).

    ``sort_for_skipping``: range-partition then sort rows by these columns
    before writing, so the output files carry DISJOINT value ranges and
    each parquet row group's min/max footer statistics cover a narrow
    slice — point/range predicates on those columns then skip whole
    files/row groups at scan time (single-dimension Z-order; at 100 TB
    this is the difference between reading 100 TB and reading the one
    file that can match).  Costs one range shuffle at write time; worth
    it for any table queried selectively on the sort key.  Pass
    ``(n, cols)`` to pin the output file count — without it AQE may
    coalesce a small write to one file (fine at scale, where the shuffle
    is sized by data volume).  Clustering quality proven from the written
    footers in tests/test_sources.py.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if zorder and sort_for_skipping:
        raise ValueError("zorder and sort_for_skipping are alternatives")
    if zorder:
        # ``(n, cols)``: file count must be pinned — the z-key's range is
        # synthetic, so "one file per range partition" IS the layout knob
        n, zcols = zorder
        if isinstance(zcols, str):
            # same (8, "ts") trap sort_for_skipping guards against:
            # list("ts") would silently z-order by columns 't' and 's'
            zcols = [zcols]
        df = (
            df.withColumn("__z", zorder_key(df, list(zcols)))
            .repartitionByRange(n, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    if sort_for_skipping:
        # (n, cols) pins the file count; a bare sequence of column names
        # (list OR tuple) must not be misread as that pair
        if (
            isinstance(sort_for_skipping, tuple)
            and len(sort_for_skipping) == 2
            and isinstance(sort_for_skipping[0], int)
        ):
            # pair form (n, cols); a single-column string second element
            # counts too — without this, (8, "ts") fell into the bare
            # branch and sortWithinPartitions(8, ...) treated 8 as a
            # 1-BASED COLUMN ORDINAL, silently sorting by an unrelated
            # column and destroying the clustering this knob exists for
            n, cols = sort_for_skipping
            if isinstance(cols, str):
                cols = [cols]
            df = df.repartitionByRange(n, *cols)
        else:
            cols = list(sort_for_skipping)
            df = df.repartitionByRange(*cols)
        df = df.sortWithinPartitions(*cols)
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", options.pop("header", "true"))
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table:
            raise ValueError("bucket_by requires a catalog table name")
        w.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table)
        return
    if table:
        w.saveAsTable(table)
    else:
        if not path:
            raise ValueError("either path or table is required")
        w.save(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **options,
) -> None:
    """JDBC sink — the executed counterpart of the reference's parse-only
    INSERT path (``engine/src/cli.cpp:154-163`` routes INSERT to MySQL
    without planning it).

    ``batchsize`` controls rows per round-trip (the JDBC write throughput
    knob); ``num_partitions`` caps concurrent connections — at scale an
    unthrottled 1000-task write is a denial of service against the
    database, so cap it to what the DB can absorb.  Live-tested against
    the pyspark-shipped Derby embedded driver.
    """
    if num_partitions is not None:
        # repartition, NOT coalesce: coalesce removes the stage boundary
        # and collapses the parallelism of all upstream computation to
        # num_partitions tasks — the connection throttle would serialize
        # the whole job; one extra shuffle keeps upstream wide
        df = df.repartition(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
