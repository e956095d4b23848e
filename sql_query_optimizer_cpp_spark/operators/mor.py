"""Merge-on-read DML: deletion vectors over the COW table layout.

The copy-on-write verbs (operators/mutate.py — the executed analog of the
reference's parse-only DML, engine/src/parser.cpp:232-296) rewrite every
file that contains a matched row.  At 100 TB that is the wrong cost model
for small mutations: deleting 100 rows out of a 1 GB file rewrites the
whole gigabyte.  This module adds the Delta-Lake-3.x-shaped alternative —
**deletion vectors** — where a DELETE writes O(deleted rows) of sidecar
metadata and the rewrite is deferred to an explicit
:func:`materialize_deletes` (the MOR "compaction").

Design (all distributed, nothing per-row on the driver):

- Row identity is ``(table-relative file path, parquet row index)`` via
  Spark's ``_metadata.file_path`` / ``_metadata.row_index`` generated
  columns — stable for a given file, free at scan time (no shuffle, no
  surrogate-key materialization).
- The vector store is plain parquet under ``<table>/_dv/`` with schema
  ``(src_file string, row_idx long)``; each verb appends one batch.
  Underscore-prefixed, so base reads and ``list_data_files`` never see it.
- :func:`read_mor` = base scan LEFT ANTI JOIN the vector set on that
  identity.  The DV side is tiny relative to the table by design (it only
  grows until the next materialize), so AQE plans it as a broadcast anti
  join — the base scan stays shuffle-free.
- ``dv_update_where`` = append the updated copies as new files, then
  deletion-vector the old positions (delete + insert, the MOR UPDATE).
  Matched rows are read from the verb's STARTING file list, never the
  table root, so the freshly appended copies can never be re-matched and
  tombstoned by the same statement.
- Crash ordering mirrors COW's "duplicates, never loss": new data lands
  before the tombstones that hide the old data.
- :func:`materialize_deletes` rewrites exactly the files that have
  vectors (anti-join applied), then drops the vector store.  Stale
  vectors keyed to replaced file names match nothing, so a crash mid-way
  leaves a readable table and a rerun converges.

Mutual exclusion: DV state lives outside the snapshot/version manifests,
so mixing the two would make time travel silently resurrect deleted rows.
Both layers refuse each other loudly (here: :func:`_ensure_dv_allowed`;
in mutate.py: ``enable_versioning`` / ``create_snapshot`` / the COW verbs
check ``has_deletion_vectors``).  Same advisory writer lock as COW, so a
MOR writer and a COW writer can never interleave.
"""

from __future__ import annotations

import contextlib
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .mutate import (
    MutationStats,
    _cond,
    _delete_files,
    _enforce_constraints,
    _fs,
    _group_by_dir,
    _mark_mutated,
    _move_in,
    _rel_to_table,
    _stage,
    _writer_lock,
    is_partitioned,
    list_data_files,
    list_snapshots,
    table_constraints,
)

#: sidecar dir holding the vector parquet; underscore ⇒ invisible to
#: base parquet scans and to list_data_files
DV_DIR = "_dv"


def _dv_path(path: str) -> str:
    return f"{path.rstrip('/')}/{DV_DIR}"


def has_deletion_vectors(spark: SparkSession, path: str) -> bool:
    """True when the table carries live (un-materialized) deletion
    vectors — i.e. base reads overcount and :func:`read_mor` is required."""
    jvm, fs, _ = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(_dv_path(path))
    if not fs.exists(p):
        return False
    return any(
        st.isFile() and not st.getPath().getName().startswith(("_", "."))
        for st in fs.listStatus(p)
    )


def dv_count(spark: SparkSession, path: str) -> int:
    """Live tombstone count (parquet-footer metadata job, no data I/O)."""
    if not has_deletion_vectors(spark, path):
        return 0
    return spark.read.parquet(_dv_path(path)).count()


def _read_dv(spark: SparkSession, path: str) -> DataFrame | None:
    if not has_deletion_vectors(spark, path):
        return None
    return spark.read.parquet(_dv_path(path)).select("src_file", "row_idx")


def _qualified_root(spark: SparkSession, path: str) -> str:
    """The table root exactly as ``_metadata.file_path`` will spell its
    prefix (both go through Hadoop ``Path.toString()`` normalization, so
    e.g. ``file:///x`` and ``file:/x`` converge)."""
    jvm, fs, jpath = _fs(spark, path)
    return fs.makeQualified(jpath).toString()


def _with_identity(
    spark: SparkSession, path: str, files: list[str], base_path: str | None
) -> DataFrame:
    """Read an explicit file list with the MOR row identity attached as
    ``__src_file`` (table-relative) and ``__row_idx``.  Reading the LIST —
    not the root — pins the verb to its starting state: files appended
    later (e.g. this statement's own update copies) are invisible even
    under lazy re-evaluation."""
    root = _qualified_root(spark, path)
    reader = spark.read.option("mergeSchema", "true")
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(*files)
    clash = {"__fp", "__row_idx", "__src_file"} & set(df.columns)
    if clash:
        # same guarded-working-column discipline as the CDC signed diff
        raise ValueError(
            f"table columns {sorted(clash)} collide with the merge-on-read "
            "working columns; rename them before using the MOR verbs"
        )
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.row_index").alias("__row_idx"),
    ).withColumn(
        "__src_file", F.expr(f"substring(__fp, {len(root) + 2})")
    ).drop("__fp")


def _live(df: DataFrame, dv: DataFrame | None) -> DataFrame:
    """Drop rows already tombstoned (anti join on the row identity)."""
    if dv is None:
        return df
    return df.join(
        dv,
        (df["__src_file"] == dv["src_file"])
        & (df["__row_idx"] == dv["row_idx"]),
        "left_anti",
    )


def _append_dv(spark: SparkSession, path: str, entries: DataFrame) -> int:
    """Append a tombstone batch; returns how many entries landed (counted
    from footers of the just-written batch, one metadata job, so the
    entries plan — which reads the base files — runs exactly once)."""
    dv_root = _dv_path(path)
    before = dv_count(spark, path)
    entries.select(
        F.col("__src_file").cast("string").alias("src_file"),
        F.col("__row_idx").cast("long").alias("row_idx"),
    ).write.mode("append").parquet(dv_root)
    after = dv_count(spark, path)
    if after == 0:
        # a no-match first batch wrote only empty part files; remove the
        # dir so has_deletion_vectors stays false and COW verbs stay usable
        jvm, fs, _ = _fs(spark, path)
        with contextlib.suppress(Exception):
            fs.delete(jvm.org.apache.hadoop.fs.Path(dv_root), True)
    return after - before


def _no_match(spark: SparkSession, path: str, cond: Column) -> bool:
    """No-op short-circuit: one footer-pruned existence probe (pushdown +
    LIMIT 1) so a statement matching nothing skips the stage/append
    machinery entirely — the MOR analog of the COW verbs' hit-list check."""
    return (
        spark.read.parquet(path).where(cond).limit(1).count() == 0
    )


def _ensure_dv_allowed(spark: SparkSession, path: str, verb: str) -> None:
    # version manifests ARE snapshot manifests (table_versions filters
    # list_snapshots), so one listing covers both refusal reasons
    if list_snapshots(spark, path):
        raise ValueError(
            f"{verb}: {path} has a version log / snapshots; deletion "
            "vectors live outside the manifests, so time travel over a "
            "DV table would silently resurrect deleted rows. Use the "
            "copy-on-write verbs on versioned tables, or drop the "
            "snapshots first."
        )


def dv_delete_where(
    spark: SparkSession, path: str, condition: str | Column
) -> int:
    """Merge-on-read ``DELETE``: tombstone the matched row positions
    instead of rewriting their files — O(deleted rows) written, zero data
    files touched.  SQL three-valued logic (NULL keeps the row), same as
    :func:`~.mutate.delete_where`.  Returns rows newly deleted (already
    tombstoned rows never double-count).  Read back via :func:`read_mor`."""
    cond = _cond(condition)
    with _writer_lock(spark, path):
        _ensure_dv_allowed(spark, path, "dv_delete_where")
        files = list_data_files(spark, path, recursive=True)
        if not files or _no_match(spark, path, cond):
            return 0
        base_path = path if is_partitioned(spark, path) else None
        sub = _with_identity(spark, path, files, base_path)
        matched = _live(sub.where(cond), _read_dv(spark, path))
        n = _append_dv(
            spark, path, matched.select("__src_file", "__row_idx")
        )
        if n:
            _mark_mutated(spark, path)
            spark.catalog.clearCache()
        return n


def dv_update_where(
    spark: SparkSession,
    path: str,
    set_map: dict[str, str | Column],
    condition: str | Column,
) -> int:
    """Merge-on-read ``UPDATE`` = insert the updated copies, tombstone the
    originals.  Cost is O(matched rows), not O(files containing them).

    Works on flat AND hive-partitioned tables: copies route to their
    ``key=value`` directories through a partitioned staging write (the
    same mover the COW verbs use), and — because an updated copy keeps
    its partition values — assigning a PARTITION column is refused, the
    COW rule.  Assignments cast back to the column's existing type
    (schema stability).  CHECK constraints are enforced over the staged
    copies BEFORE anything becomes visible."""
    cond = _cond(condition)
    with _writer_lock(spark, path):
        _ensure_dv_allowed(spark, path, "dv_update_where")
        partitioned = is_partitioned(spark, path)
        files = list_data_files(spark, path, recursive=True)
        if not files or _no_match(spark, path, cond):
            return 0
        sub = _with_identity(
            spark, path, files, path if partitioned else None
        )
        data_cols = [
            c for c in sub.columns if c not in ("__src_file", "__row_idx")
        ]
        unknown = set(set_map) - set(data_cols)
        if unknown:
            raise ValueError(
                f"UPDATE SET on unknown columns: {sorted(unknown)}"
            )
        part_cols: list[str] = []
        if partitioned:
            from .mutate import _partition_cols

            part_cols = _partition_cols(spark, path, files[0])
            part_here = [c for c in set_map if c in part_cols]
            if part_here:
                raise ValueError(
                    f"UPDATE SET on partition columns: {sorted(part_here)}; "
                    "changing a row's partition is a delete + insert"
                )
        matched = _live(sub.where(cond), _read_dv(spark, path))
        updated = matched.select(
            *[
                _cond(set_map[c]).cast(sub.schema[c].dataType).alias(c)
                if c in set_map
                else F.col(c)
                for c in data_cols
            ]
        )
        # stage the copies while the base files are untouched; constraints
        # verified on staged output (same gate as the COW verbs)
        created: list[str] = []
        try:
            if partitioned:
                staging = path.rstrip("/") + f"__cow_{uuid.uuid4().hex}"
                created.append(staging)
                updated.write.partitionBy(*part_cols).mode(
                    "overwrite"
                ).parquet(staging)
            else:
                staging = _stage(spark, path, updated, created)
            if table_constraints(spark, path):
                _enforce_constraints(spark, path, [staging])
            if partitioned:
                from .mutate import _move_in_partitioned

                n_new = _move_in_partitioned(spark, path, staging, part_cols)
            else:
                n_new = _move_in(spark, path, staging)
        except BaseException:
            jvm, fs, _ = _fs(spark, path)
            for s in created:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(s), True)
            raise
        # copies are live; now hide the originals.  matched reads the
        # STARTING file list, so the copies cannot re-match here.
        n = _append_dv(
            spark, path, matched.select("__src_file", "__row_idx")
        )
        if n or n_new:
            _mark_mutated(spark, path)
            spark.catalog.clearCache()
        return n


def read_mor(spark: SparkSession, path: str) -> DataFrame:
    """The table with deletion vectors applied — the only correct read of
    a table where :func:`has_deletion_vectors` is true.  One broadcast
    anti join over the base scan (AQE sizes the DV side; it is small by
    design until :func:`materialize_deletes` resets it); no shuffle of
    the base data."""
    dv = _read_dv(spark, path)
    if dv is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    files = list_data_files(spark, path, recursive=True)
    base_path = path if is_partitioned(spark, path) else None
    df = _with_identity(spark, path, files, base_path)
    return _live(df, dv).drop("__src_file", "__row_idx")


def dv_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Tombstones per file — the input to a ratio-driven materialize
    policy (rewrite only files whose dead fraction crosses a threshold)."""
    dv = _read_dv(spark, path)
    if dv is None:
        return spark.createDataFrame([], "src_file string, dead_rows long")
    return dv.groupBy("src_file").agg(
        F.count("*").cast("long").alias("dead_rows")
    )


def materialize_deletes(
    spark: SparkSession, path: str, min_dead_ratio: float = 0.0
) -> MutationStats:
    """MOR compaction: rewrite exactly the files that carry tombstones
    (vectors applied), drop their vectors.  After a FULL materialize,
    plain base reads are correct again and the COW verbs are usable.

    ``min_dead_ratio`` > 0 makes it incremental — the steady-state policy
    at scale: only files whose dead fraction reaches the threshold are
    rewritten (one extra count-shape job over just the tombstoned files
    decides), the rest keep their vectors and :func:`read_mor` stays the
    read path.  Vectors of rewritten files are pruned from the store so
    it shrinks as files graduate.

    Crash discipline, stated honestly (the COW-wide "duplicates, never
    loss" contract, not more): every rewrite stages FIRST (all
    directories complete before any original file moves), so no crash
    point loses rows.  A crash before a directory's swap leaves its old
    files + vectors intact — :func:`read_mor` stays exact and a rerun
    converges (stale staging dirs are crash debris for repair_table).  A
    crash inside a directory's move-in→delete window leaves that
    directory's live rows duplicated until repair — the same window every
    COW swap has.  The vector STORE itself is never unprotected: a
    partial materialize moves the pruned store in beside the old batch
    files before deleting them, so tombstones for still-live files exist
    on disk at every instant (worst case duplicated, which the anti join
    doesn't care about)."""
    with _writer_lock(spark, path):
        dv = _read_dv(spark, path)
        jvm, fs, _ = _fs(spark, path)
        if dv is None:
            return MutationStats(
                len(list_data_files(spark, path, recursive=True)), 0, 0
            )
        dead_rel = {
            r["src_file"]
            for r in dv.select("src_file").distinct().collect()
        }
        files = list_data_files(spark, path, recursive=True)
        hit = [f for f in files if _rel_to_table(path, f) in dead_rel]
        if min_dead_ratio > 0 and hit:
            # dead fraction per file: row totals come from a scan of the
            # row_index column only (no data columns decoded) over just
            # the tombstoned files
            totals = (
                _with_identity(spark, path, hit, None)
                .groupBy("__src_file")
                .agg(F.count("*").alias("total"))
            )
            dead = dv.groupBy("src_file").agg(
                F.count("*").alias("dead")
            )
            due = {
                r["src_file"]
                for r in totals.join(
                    dead, totals["__src_file"] == dead["src_file"]
                )
                .where(F.col("dead") >= min_dead_ratio * F.col("total"))
                .select("src_file")
                .collect()
            }
            hit = [f for f in hit if _rel_to_table(path, f) in due]
            dead_rel = due
            if not hit:
                # nothing reached the threshold: keep every vector
                return MutationStats(len(files), 0, 0)
        # stage EVERY directory's rewrite before any original file moves
        # (the COW stage-all-then-swap discipline: a crash in the staging
        # phase leaves the table byte-identical).  Groups: flat tables
        # have one, partitioned tables one per touched partition dir — no
        # partition-column reconstruction needed, the identity join keys
        # on file name + position.
        staged: list[tuple[str, list[str], str]] = []
        created: list[str] = []
        try:
            for dir_, fl in sorted(_group_by_dir(hit).items()):
                sub = _with_identity(spark, path, fl, None)
                kept = _live(sub, dv).drop("__src_file", "__row_idx")
                staged.append((dir_, fl, _stage(spark, path, kept, created)))
        except BaseException:
            for s in created:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(s), True)
            raise
        removed = 0
        for dir_, fl, staging in staged:
            _move_in(spark, dir_, staging)
            _delete_files(spark, fl)
            removed += len(fl)
        # reached with removed==0 only when every tombstoned file was
        # already replaced (stale store from a crashed run): fall through
        # to the delete branch and converge
        survivors = dv.where(~F.col("src_file").isin(list(dead_rel)))
        dv_root = jvm.org.apache.hadoop.fs.Path(_dv_path(path))
        old_dv_files = [
            st.getPath().toString()
            for st in fs.listStatus(dv_root)
            if st.isFile()
        ]
        if removed and survivors.limit(1).count():
            # partial materialize: shrink the store by the graduated
            # files' vectors WITHOUT ever leaving it empty or missing —
            # stage the pruned copy (reads the old batch files), move it
            # in beside them, only then delete the old batches.  Any
            # crash point leaves at-least-once tombstones, which the
            # anti join reads identically.
            pruned = _stage(spark, path, survivors)
            _move_in(spark, _dv_path(path), pruned)
            _delete_files(spark, old_dv_files)
        else:
            fs.delete(dv_root, True)
        spark.catalog.clearCache()
        return MutationStats(len(files), removed, 0)
