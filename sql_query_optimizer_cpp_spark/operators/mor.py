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

Version-log unification (Delta-3.x shape): manifests pin the
deletion-vector batch files alongside the data files
(``mutate._manifest_state``), so on a versioned table every DV verb
commits a first-class version — ``read_version`` applies the DV state
as-of, ``read_changes`` emits tombstoned rows as deletes (and RESTORE's
un-tombstones as inserts), ``restore_version`` renames DV batches through
the same metadata-only plan, and ``vacuum`` honors manifest references to
retired batches.  The one remaining guard is COW-side: the file-REWRITING
verbs still refuse a table with live vectors (``mutate._default_retain``)
— a base-scan rewrite would resurrect MOR-deleted rows — so the path from
MOR back to COW is :func:`materialize_deletes` (itself a commit).  Same
advisory writer lock as COW, so a MOR writer and a COW writer can never
interleave.
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
    _retire_files,
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


def list_dv_files(spark: SparkSession, path: str) -> list[str]:
    """Absolute URIs of the live deletion-vector batch parquet files —
    the unit the version manifests pin (batches are immutable once
    written: appends create new files, a prune writes a new batch and
    retires the old ones)."""
    jvm, fs, _ = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(_dv_path(path))
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(p)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
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


def attach_identity(df: DataFrame, qualified_base: str) -> DataFrame:
    """Attach the MOR row identity to a parquet scan: ``__src_file`` =
    the file's path RELATIVE to ``qualified_base`` (spell the base via
    ``fs.makeQualified(...).toString()`` — it must match how
    ``_metadata.file_path`` spells its prefix, or tombstones silently
    stop matching and deleted rows resurrect) and ``__row_idx`` =
    ``_metadata.row_index``.  The ONE place this recipe lives; both the
    live MOR verbs and the time-travel pinned reads
    (mutate._read_pinned_files) go through it."""
    clash = {"__fp", "__row_idx", "__src_file"} & set(df.columns)
    if clash:
        # same guarded-working-column discipline as the CDC signed diff
        raise ValueError(
            f"table columns {sorted(clash)} collide with the merge-on-read "
            "working columns; rename them before using the MOR verbs or "
            "time-traveling a deletion-vector table"
        )
    return (
        df.select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__row_idx"),
        )
        .withColumn(
            "__src_file",
            F.expr(f"substring(__fp, {len(qualified_base) + 2})"),
        )
        .drop("__fp")
    )


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
    return attach_identity(reader.parquet(*files), root)


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
    # one listing before, one after — everything else derives from them
    pre = set(list_dv_files(spark, path))
    before = (
        spark.read.parquet(*sorted(pre)).count() if pre else 0
    )
    entries.select(
        F.col("__src_file").cast("string").alias("src_file"),
        F.col("__row_idx").cast("long").alias("row_idx"),
    ).write.mode("append").parquet(dv_root)
    post = set(list_dv_files(spark, path))
    after = spark.read.parquet(*sorted(post)).count() if post else 0
    if after == before:
        # a no-match batch wrote only empty part files; remove JUST the
        # files this append created (they are uncommitted, so no version
        # manifest can pin them) so has_deletion_vectors stays accurate
        # and COW verbs stay usable on a vector-less table
        jvm, fs, _ = _fs(spark, path)
        leftover: list[str] = []
        for f in post - pre:
            try:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
            except Exception:
                leftover.append(f)
        if not pre and not leftover:
            with contextlib.suppress(Exception):
                fs.delete(jvm.org.apache.hadoop.fs.Path(dv_root), True)
        if leftover:
            # a stranded empty batch flips has_deletion_vectors true and
            # locks out every COW verb on a logically vector-less table —
            # say so (mirrors mutate._refresh_indexes' degrade-with-
            # warning contract) instead of failing the no-op statement
            import warnings

            warnings.warn(
                f"could not clean up {len(leftover)} empty deletion-"
                f"vector part file(s) under {dv_root} (e.g. "
                f"{leftover[0]}); the table now *looks* merge-on-read, "
                "so COW DML verbs will refuse it until the empty files "
                "are removed or materialize_deletes runs",
                stacklevel=3,
            )
    return after - before


def _no_match(spark: SparkSession, path: str, cond: Column) -> bool:
    """No-op short-circuit: one footer-pruned existence probe (pushdown +
    LIMIT 1) so a statement matching nothing skips the stage/append
    machinery entirely — the MOR analog of the COW verbs' hit-list check."""
    return (
        spark.read.parquet(path).where(cond).limit(1).count() == 0
    )


def _commit(spark: SparkSession, path: str) -> None:
    """Version-log commit hook for the DV verbs (caller holds the writer
    lock).  Manifests pin data files AND deletion-vector batch files
    (mutate._manifest_state), so a dv_delete on a versioned table is a
    first-class commit: time travel reads the DV state as-of, CDC emits
    the tombstoned rows, RESTORE undoes them — the Delta-3.x shape.
    Bloom sidecars refresh here too (dv_update/dv_merge append copy
    files; a pure dv_delete adds none, so its refresh is a no-op
    listing)."""
    from .mutate import _autoversion, _refresh_indexes

    _autoversion(spark, path)
    _refresh_indexes(spark, path)


def dv_delete_where(
    spark: SparkSession,
    path: str,
    condition: str | Column,
    lock_wait_seconds: float = 0.0,
) -> int:
    """Merge-on-read ``DELETE``: tombstone the matched row positions
    instead of rewriting their files — O(deleted rows) written, zero data
    files touched.  SQL three-valued logic (NULL keeps the row), same as
    :func:`~.mutate.delete_where`.  Returns rows newly deleted (already
    tombstoned rows never double-count).  Read back via :func:`read_mor`.
    ``lock_wait_seconds`` > 0 waits for a busy writer lock instead of
    refusing (parallel appliers serialize; see also
    :func:`occ_dv_delete_where` for the stage-outside-the-lock variant)."""
    cond = _cond(condition)
    with _writer_lock(spark, path, lock_wait_seconds):
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
            _commit(spark, path)
            _mark_mutated(spark, path)
            spark.catalog.clearCache()
        return n


def _dv_snapshot_conflict(
    spark: SparkSession,
    fs,
    jvm,
    path: str,
    touched: set[str],
    dv0: set[str],
) -> str | None:
    """Inside the writer lock: validate an optimistic DV writer's
    snapshot.  Conflict (returns the reason string) when a concurrent
    commit retired/rewrote a file this writer's tombstones reference, or
    added/removed a deletion-vector batch touching one of those files.
    ``None`` = the snapshot still holds and the batch may move in."""
    live_rel = {
        _rel_to_table(path, f)
        for f in list_data_files(spark, path, recursive=True)
    }
    gone = touched - live_rel
    if gone:
        return f"files retired/rewritten concurrently: {sorted(gone)[:3]}"
    dv_now = set(list_dv_files(spark, path))
    changed_batches = sorted(dv_now ^ dv0)
    # a batch file REMOVED since the snapshot (materialize prune,
    # restore) may be retired or deleted — its path no longer reads;
    # any store churn we cannot inspect at its original path is a
    # conflict (re-derive, don't guess)
    missing_b = [
        b
        for b in changed_batches
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(b))
    ]
    if missing_b:
        return "a concurrent commit replaced deletion-vector batches"
    if changed_batches and touched:
        overlap = (
            spark.read.parquet(*changed_batches)
            .where(F.col("src_file").isin(list(touched)))
            .limit(1)
            .count()
        )
        if overlap:
            return (
                "a concurrent commit changed tombstones on this "
                "writer's files"
            )
    return None


def _move_dv_parts(spark: SparkSession, fs, jvm, dv_root: str, staging: str) -> None:
    """Move a staged tombstone batch's parts into the live ``_dv/``
    store.  All-or-nothing: a rename failure mid-loop must not leave a
    PARTIAL batch visible to read_mor while the verb reports failure —
    retract the parts already moved in before re-raising (the retry
    re-derives the whole batch from the table)."""
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(dv_root))
    moved: list = []
    for part in list_data_files(spark, staging):
        src_p = jvm.org.apache.hadoop.fs.Path(part)
        dest = jvm.org.apache.hadoop.fs.Path(dv_root, src_p.getName())
        if not fs.rename(src_p, dest):
            for d in moved:
                with contextlib.suppress(Exception):
                    fs.delete(d, False)
            raise IOError(
                f"occ dv commit: rename {part} -> {dest} failed "
                "(batch retracted, nothing committed)"
            )
        moved.append(dest)


def occ_dv_delete_where(
    spark: SparkSession,
    path: str,
    condition: str | Column,
    max_attempts: int = 5,
    lock_wait_seconds: float = 30.0,
    _after_stage=None,
) -> int:
    """Optimistic merge-on-read ``DELETE``: same semantics as
    :func:`dv_delete_where`, but the matched-row scan and the tombstone
    batch WRITE run outside the writer lock — only a metadata
    validate-and-move-in serializes.  Deletion-vector batches are
    append-only, so the natural conflict unit is the FILE a tombstone
    references: two writers deleting from disjoint files both commit on
    their first attempt (the expensive scan/stage overlaps); a conflict
    exists only when a concurrent commit tombstoned, un-tombstoned, or
    retired one of THIS writer's files — then the matched set (and the
    already-tombstoned exclusion that keeps the returned count exact) is
    re-derived against the new state and the stage retries.

    Protocol (the DV analog of :func:`~.mutate.occ_update_where`):

    1. READ (lock-free): snapshot the data-file list and DV-batch list;
       ``matched`` = live rows under the predicate at that snapshot.
    2. STAGE (lock-free): write the tombstone batch to a SIBLING staging
       dir — never into ``_dv/``, which is live to readers.
    3. VALIDATE + COMMIT (short lock): every file the batch references
       must still be live, and no DV batch added or removed since the
       snapshot may touch those files; then the staged parts RENAME into
       ``_dv/`` (O(parts) metadata) and the version commits.

    ``_after_stage(attempt)`` is the test seam between stage and commit.
    """
    from .mutate import (
        _WriterLockHeld,
        _is_missing_file_error,
        _refuse_in_txn,
    )

    cond = _cond(condition)
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    _refuse_in_txn(path, "optimistic DML")
    jvm, fs, jpath = _fs(spark, path)
    root = path.rstrip("/")
    dv_root = _dv_path(path)
    last_conflict = ""

    def _cleanup(staging: str) -> None:
        with contextlib.suppress(Exception):
            fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

    for attempt in range(1, max_attempts + 1):
        files0 = sorted(list_data_files(spark, path, recursive=True))
        if not files0 or _no_match(spark, path, cond):
            return 0
        dv0 = set(list_dv_files(spark, path))
        sub = _with_identity(
            spark, path, files0, path if is_partitioned(spark, path) else None
        )
        dv0_entries = (
            spark.read.parquet(*sorted(dv0)).select("src_file", "row_idx")
            if dv0
            else None
        )
        matched = _live(sub.where(cond), dv0_entries)
        # __cow_ prefix: repair_table's crash-debris sweep inventories
        # (and with REMOVE, cleans) any <base>__cow_* sibling — a SIGKILL
        # between stage and commit must not strand an invisible dir
        staging = f"{root}__cow_dv_{uuid.uuid4().hex}"
        try:
            # READ + STAGE run lock-free: a concurrent commit can retire
            # a files0 member mid-job — Spark surfaces that as a
            # missing-file error, which is a CONFLICT (retry against the
            # new state), not an error (mutate._occ_mutate's contract)
            try:
                matched.select(
                    F.col("__src_file").cast("string").alias("src_file"),
                    F.col("__row_idx").cast("long").alias("row_idx"),
                ).write.parquet(staging)
                n = spark.read.parquet(staging).count()  # footers only
                if n == 0:
                    _cleanup(staging)
                    return 0
                # the batch's file set — bounded by the table's file
                # count (metadata scale, same class as manifest lists)
                touched = {
                    r["src_file"]
                    for r in spark.read.parquet(staging)
                    .select("src_file")
                    .distinct()
                    .collect()
                }
            except Exception as e:
                if not _is_missing_file_error(e) or not fs.exists(jpath):
                    raise
                last_conflict = "input file vanished during stage"
                spark.catalog.clearCache()
                raise _Conflict() from None
            if _after_stage is not None:
                _after_stage(attempt)
            # COMMIT phase: bounded wait — a busy lock past the wait is a
            # lost attempt, never the 'stale lock, delete it' error
            try:
                lock = _writer_lock(spark, path, lock_wait_seconds)
                lock.__enter__()
            except _WriterLockHeld:
                last_conflict = (
                    f"<writer lock held past the {lock_wait_seconds:g}s "
                    "wait>"
                )
                raise _Conflict() from None
            try:
                conflict = _dv_snapshot_conflict(
                    spark, fs, jvm, path, touched, dv0
                )
                if conflict:
                    last_conflict = conflict
                    raise _Conflict()
                _move_dv_parts(spark, fs, jvm, dv_root, staging)
                _cleanup(staging)
                _commit(spark, path)
                _mark_mutated(spark, path)
                spark.catalog.clearCache()
                return n
            finally:
                lock.__exit__(None, None, None)
        except _Conflict:
            _cleanup(staging)
            continue
        except BaseException:
            _cleanup(staging)
            raise
    raise RuntimeError(
        f"occ_dv_delete_where on {path} lost the commit race "
        f"{max_attempts} times (last conflict: {last_conflict}); raise "
        "max_attempts or reduce writer contention"
    )


class _Conflict(Exception):
    """Internal: validation failed, retry against the new state."""


def dv_update_where(
    spark: SparkSession,
    path: str,
    set_map: dict[str, str | Column],
    condition: str | Column,
    lock_wait_seconds: float = 0.0,
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
    with _writer_lock(spark, path, lock_wait_seconds):
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
            # a predicate whose only base matches are already-tombstoned
            # rows stages ZERO copies — moving the empty staging in would
            # add a junk empty file AND commit a no-op version
            if _staged_rows(spark, staging) == 0:
                jvm0, fs0, _ = _fs(spark, path)
                fs0.delete(jvm0.org.apache.hadoop.fs.Path(staging), True)
                return 0
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
            _commit(spark, path)
            _mark_mutated(spark, path)
            spark.catalog.clearCache()
        return n


def occ_dv_update_where(
    spark: SparkSession,
    path: str,
    set_map: dict[str, str | Column],
    condition: str | Column,
    max_attempts: int = 5,
    lock_wait_seconds: float = 30.0,
    _after_stage=None,
) -> int:
    """Optimistic merge-on-read ``UPDATE``: same semantics as
    :func:`dv_update_where` (tombstone the originals, append the updated
    copies — O(matched rows), zero file rewrites), but the matched-row
    scan AND both staging writes run outside the writer lock; only the
    metadata validate-and-move-in serializes.  The conflict unit is the
    FILE a tombstone references (:func:`occ_dv_delete_where`'s rule):
    writers updating disjoint files commit on their first attempt; a
    concurrent commit that tombstoned, un-tombstoned, or retired one of
    THIS writer's files re-derives and retries.

    Protocol: READ (snapshot file+batch lists, matched = live rows under
    the predicate) → STAGE (tombstone batch AND updated copies to
    sibling staging dirs; CHECK constraints enforced on the staged
    copies) → VALIDATE + COMMIT (short lock: :func:`_dv_snapshot_conflict`,
    then copies move in FIRST, tombstones second — the COW-wide crash
    ordering: duplicates, never loss — and the version commits).

    ``_after_stage(attempt)`` is the test seam between stage and commit.
    """
    from .mutate import (
        _WriterLockHeld,
        _is_missing_file_error,
        _move_in_partitioned,
        _partition_cols,
        _refuse_in_txn,
    )

    cond = _cond(condition)
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    _refuse_in_txn(path, "optimistic DML")
    jvm, fs, jpath = _fs(spark, path)
    root = path.rstrip("/")
    dv_root = _dv_path(path)
    last_conflict = ""

    def _cleanup(*dirs: str | None) -> None:
        for d in dirs:
            if d:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)

    for attempt in range(1, max_attempts + 1):
        partitioned = is_partitioned(spark, path)
        files0 = sorted(list_data_files(spark, path, recursive=True))
        if not files0 or _no_match(spark, path, cond):
            return 0
        dv0 = set(list_dv_files(spark, path))
        sub = _with_identity(
            spark, path, files0, path if partitioned else None
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
            part_cols = _partition_cols(spark, path, files0[0])
            part_here = [c for c in set_map if c in part_cols]
            if part_here:
                raise ValueError(
                    f"UPDATE SET on partition columns: {sorted(part_here)}; "
                    "changing a row's partition is a delete + insert"
                )
        dv0_entries = (
            spark.read.parquet(*sorted(dv0)).select("src_file", "row_idx")
            if dv0
            else None
        )
        matched = _live(sub.where(cond), dv0_entries)
        updated = matched.select(
            *[
                _cond(set_map[c]).cast(sub.schema[c].dataType).alias(c)
                if c in set_map
                else F.col(c)
                for c in data_cols
            ]
        )
        dv_staging = f"{root}__cow_dv_{uuid.uuid4().hex}"
        copy_staging: str | None = None
        created: list[str] = []
        try:
            # READ + STAGE run lock-free: a concurrent commit can retire
            # a files0 member mid-job — a missing-file error is a
            # CONFLICT (retry against the new state), not an error
            try:
                matched.select(
                    F.col("__src_file").cast("string").alias("src_file"),
                    F.col("__row_idx").cast("long").alias("row_idx"),
                ).write.parquet(dv_staging)
                n = spark.read.parquet(dv_staging).count()  # footers only
                if n == 0:
                    _cleanup(dv_staging)
                    return 0
                touched = {
                    r["src_file"]
                    for r in spark.read.parquet(dv_staging)
                    .select("src_file")
                    .distinct()
                    .collect()
                }
                if partitioned:
                    copy_staging = f"{root}__cow_{uuid.uuid4().hex}"
                    created.append(copy_staging)
                    updated.write.partitionBy(*part_cols).mode(
                        "overwrite"
                    ).parquet(copy_staging)
                else:
                    copy_staging = _stage(spark, path, updated, created)
                if table_constraints(spark, path):
                    _enforce_constraints(spark, path, [copy_staging])
            except Exception as e:
                if not _is_missing_file_error(e) or not fs.exists(jpath):
                    raise
                last_conflict = "input file vanished during stage"
                spark.catalog.clearCache()
                raise _Conflict() from None
            if _after_stage is not None:
                _after_stage(attempt)
            try:
                lock = _writer_lock(spark, path, lock_wait_seconds)
                lock.__enter__()
            except _WriterLockHeld:
                last_conflict = (
                    f"<writer lock held past the {lock_wait_seconds:g}s "
                    "wait>"
                )
                raise _Conflict() from None
            try:
                conflict = _dv_snapshot_conflict(
                    spark, fs, jvm, path, touched, dv0
                )
                if conflict:
                    last_conflict = conflict
                    raise _Conflict()
                # copies land before the tombstones that hide the old
                # (a crash between the two duplicates, never loses)
                if partitioned:
                    _move_in_partitioned(spark, path, copy_staging, part_cols)
                else:
                    _move_in(spark, path, copy_staging)
                _move_dv_parts(spark, fs, jvm, dv_root, dv_staging)
                _cleanup(dv_staging)
                _commit(spark, path)
                _mark_mutated(spark, path)
                spark.catalog.clearCache()
                return n
            finally:
                lock.__exit__(None, None, None)
        except _Conflict:
            # created covers a staging dir whose write failed before
            # copy_staging was assigned (review r11)
            _cleanup(dv_staging, copy_staging, *created)
            continue
        except BaseException:
            _cleanup(dv_staging, copy_staging, *created)
            raise
    raise RuntimeError(
        f"occ_dv_update_where on {path} lost the commit race "
        f"{max_attempts} times (last conflict: {last_conflict}); raise "
        "max_attempts or reduce writer contention"
    )


def _merge_col_checks(
    data_cols: list[str],
    part_cols: list[str],
    matched_set: dict | None,
    insert_values: dict | None,
) -> None:
    """Shared clause-column validation for the DV merges."""
    if matched_set:
        unknown = set(matched_set) - set(data_cols)
        if unknown:
            raise ValueError(
                f"MERGE matched_set on unknown columns: {sorted(unknown)}"
            )
        part_hit = [c for c in matched_set if c in part_cols]
        if part_hit:
            raise ValueError(
                f"MERGE matched_set on partition columns: "
                f"{sorted(part_hit)}; changing a row's partition is a "
                "delete + insert"
            )
    if insert_values:
        unknown = set(insert_values) - set(data_cols)
        if unknown:
            raise ValueError(
                f"MERGE insert_values on unknown columns: "
                f"{sorted(unknown)}"
            )


def _merge_frames(
    sub: DataFrame,
    live: DataFrame,
    src: DataFrame,
    on: list[str],
    data_cols: list[str],
    matched_set: dict | None,
    matched_delete,
    insert_values: dict | None,
    insert_condition,
    skip_unchanged: bool,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared leg derivation for the DV merges: returns
    ``(updated_copies, tombstone_entries, insert_rows)`` against the
    caller's ``live`` snapshot.  Clause semantics documented on
    :func:`dv_merge_into` (delete-before-update, three-valued WHERE,
    ``src_<name>`` scope, insert defaults, ``skip_unchanged``)."""
    joined = live.join(src, on=on, how="inner")
    # delete-before-update, the COW merge's documented clause order;
    # three-valued WHERE: NULL keeps the row on the update path
    if matched_delete is not None:
        dcond = _cond(matched_delete)
        dead_j = joined.where(dcond)
        upd_j = joined.where(
            ~F.coalesce(dcond.cast("boolean"), F.lit(False))
        )
    else:
        dead_j = joined.limit(0)
        upd_j = joined
    if matched_set is None:
        upd_j = joined.limit(0)
    elif skip_unchanged:
        # a row is worth rewriting only if SOME assignment changes it
        # (null-safe compare, post-cast, so type coercion can't fake
        # a diff); everything else stays untouched — not tombstoned,
        # not copied, not a version
        changed = F.lit(False)
        for c in matched_set:
            changed = changed | ~_cond(matched_set[c]).cast(
                sub.schema[c].dataType
            ).eqNullSafe(F.col(c))
        upd_j = upd_j.where(changed)
    updated = upd_j.select(
        *[
            _cond(matched_set[c]).cast(sub.schema[c].dataType).alias(c)
            if matched_set and c in matched_set
            else F.col(c)
            for c in data_cols
        ]
    )
    # inserts: source keys with no live target partner
    unmatched = src.join(
        live.select(*on).distinct(), on=on, how="left_anti"
    )
    if insert_condition is not None:
        unmatched = unmatched.where(_cond(insert_condition))
    iv = insert_values or {}
    ins_cols = []
    for c in data_cols:
        dt = sub.schema[c].dataType
        if c in iv:
            e = _cond(iv[c])
        elif c in on:
            e = F.col(c)
        elif f"src_{c}" in unmatched.columns:
            e = F.col(f"src_{c}")
        else:
            e = F.lit(None)
        ins_cols.append(e.cast(dt).alias(c))
    ins_df = unmatched.select(*ins_cols)
    tombstones = dead_j.select("__src_file", "__row_idx").unionByName(
        upd_j.select("__src_file", "__row_idx")
    )
    return updated, tombstones, ins_df


def _merge_src(source: DataFrame, on: list[str]) -> DataFrame:
    """Source-column scoping shared by the DV merges: join keys keep
    their names, everything else becomes ``src_<name>`` (expression
    scope for clause conditions/assignments — never written; schema
    evolution stays a COW-path feature)."""
    return source.select(
        *[
            F.col(c).alias(c if c in on else f"src_{c}")
            for c in source.columns
        ]
    )


def _merge_check_source(
    source: DataFrame, on: list[str], check_unique: bool
) -> None:
    for k in on:
        if k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from source")
    if not check_unique:
        return
    dup = source.groupBy(*on).count().where(F.col("count") > 1).limit(1)
    if dup.count():
        raise ValueError(
            "MERGE source has duplicate join keys; each target row "
            "must match at most one source row (pass "
            "check_unique=False only if uniqueness is guaranteed "
            "upstream)"
        )


def dv_merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    matched_set: dict[str, str | Column] | None = None,
    insert_values: dict[str, str | Column] | None = None,
    check_unique: bool = True,
    matched_delete: str | Column | None = None,
    insert_condition: str | Column | None = None,
    skip_unchanged: bool = False,
    lock_wait_seconds: float = 0.0,
) -> MutationStats:
    """Merge-on-read ``MERGE INTO``: the matched legs are exactly
    :func:`dv_update_where`'s machinery — tombstone the old row images,
    append the updated copies — and the insert leg appends new files, so
    the whole statement costs O(matched + inserted rows) with ZERO file
    rewrites (the COW merge rewrites every file containing a matched
    key, ``mutate.merge_into``).  This is the verb the streaming CDC
    upsert writer wants per micro-batch: a k-key batch writes O(k) rows.

    Clause semantics mirror ``mutate.merge_into`` (same ``src_<name>``
    scope, delete-before-update evaluation, insert defaults); schema
    evolution is refused here — evolve on the COW path, then switch.
    CHECK constraints are enforced over the staged copies + inserts
    before anything becomes visible; on a versioned table the statement
    commits one version.  Crash ordering is the COW-wide contract:
    new data lands before the tombstones that hide the old (duplicates,
    never loss), and matched rows are read from the verb's STARTING file
    list so its own appends can never re-match.

    ``skip_unchanged=True`` drops matched rows whose assigned values all
    null-safe-equal the current ones BEFORE staging: an idempotent replay
    (the CDC applier's ``CASE WHEN newer THEN src_c ELSE c END`` on a
    late/duplicate batch) then tombstones nothing, appends nothing, and
    commits no version — no write amplification from at-least-once
    delivery.  Off by default because a no-op update IS a row rewrite
    under plain MERGE semantics (the copy gets a fresh row identity)."""
    _merge_check_source(source, on, check_unique)
    with _writer_lock(spark, path, lock_wait_seconds):
        partitioned = is_partitioned(spark, path)
        files = list_data_files(spark, path, recursive=True)
        if not files:
            raise ValueError(f"no parquet files under {path}")
        sub = _with_identity(
            spark, path, files, path if partitioned else None
        )
        data_cols = [
            c for c in sub.columns if c not in ("__src_file", "__row_idx")
        ]
        # source-only columns are expression scope (src_<name> in the
        # clause conditions/assignments, e.g. a CDC op column), same as
        # the COW merge; they are never WRITTEN — schema evolution stays
        # a COW-path feature (merge_into(..., evolve_schema=True))
        part_cols: list[str] = []
        if partitioned:
            from .mutate import _partition_cols

            part_cols = _partition_cols(spark, path, files[0])
        _merge_col_checks(data_cols, part_cols, matched_set, insert_values)
        live = _live(sub, _read_dv(spark, path))
        src = _merge_src(source, on)
        updated, tombstones, ins_df = _merge_frames(
            sub,
            live,
            src,
            on,
            data_cols,
            matched_set,
            matched_delete,
            insert_values,
            insert_condition,
            skip_unchanged,
        )

        def _stage_rows(df: DataFrame, created: list[str]) -> str:
            if partitioned:
                staging = path.rstrip("/") + f"__cow_{uuid.uuid4().hex}"
                created.append(staging)
                df.write.partitionBy(*part_cols).mode("overwrite").parquet(
                    staging
                )
                return staging
            return _stage(spark, path, df, created)

        created: list[str] = []
        jvm, fs, _ = _fs(spark, path)
        try:
            upd_staging = _stage_rows(updated, created)
            ins_staging = _stage_rows(ins_df, created)
            if table_constraints(spark, path):
                _enforce_constraints(
                    spark, path, [upd_staging, ins_staging]
                )
            # footer-count the legs BEFORE move-in (one metadata job per
            # staging dir, no plan re-execution)
            n_upd = _staged_rows(spark, upd_staging)
            n_ins = _staged_rows(spark, ins_staging)
            mover = _move_in
            if partitioned:
                from .mutate import _move_in_partitioned

                mover = lambda s, p, st: _move_in_partitioned(  # noqa: E731
                    s, p, st, part_cols
                )
            if n_upd:
                mover(spark, path, upd_staging)
            else:
                fs.delete(jvm.org.apache.hadoop.fs.Path(upd_staging), True)
            if n_ins:
                mover(spark, path, ins_staging)
            else:
                fs.delete(jvm.org.apache.hadoop.fs.Path(ins_staging), True)
        except BaseException:
            for s in created:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(s), True)
            raise
        # copies + inserts are live; now hide the matched originals
        n_dead = _append_dv(spark, path, tombstones)
        if n_dead or n_ins:
            _commit(spark, path)
            _mark_mutated(spark, path)
            spark.catalog.clearCache()
        # files_rewritten = 0 is the point: matched rows tombstone +
        # re-append, nothing rewrites
        return MutationStats(len(files), 0, n_dead, n_ins)


def occ_dv_merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    matched_set: dict[str, str | Column] | None = None,
    insert_values: dict[str, str | Column] | None = None,
    check_unique: bool = True,
    matched_delete: str | Column | None = None,
    insert_condition: str | Column | None = None,
    skip_unchanged: bool = False,
    max_attempts: int = 5,
    lock_wait_seconds: float = 30.0,
    _after_stage=None,
) -> MutationStats:
    """Optimistic merge-on-read ``MERGE INTO``: :func:`dv_merge_into`'s
    semantics (clause order, ``src_<name>`` scope, insert defaults,
    ``skip_unchanged``, O(matched + inserted rows), zero file rewrites)
    with the join, both staging writes, and the insert staging all
    OUTSIDE the writer lock — only the metadata validate-and-move-in
    serializes.  The conflict unit is the FILE a tombstone references
    (:func:`occ_dv_delete_where`'s rule): merges touching disjoint
    files commit on their first attempt.

    Isolation is WRITE-SERIALIZABLE, matching
    :func:`~.mutate.occ_merge_into`'s production default: a concurrent
    commit that tombstoned/retired one of THIS writer's matched files
    re-derives and retries, but a concurrent INSERT of the same key is
    not a conflict (this merge serializes before it) — the Delta
    WriteSerializable anomaly, documented there too.  A pure-insert
    merge (no matched rows) therefore commits first-attempt under any
    non-overlapping churn.

    ``_after_stage(attempt)`` is the test seam between stage and commit.
    """
    from .mutate import (
        _WriterLockHeld,
        _is_missing_file_error,
        _move_in_partitioned,
        _partition_cols,
        _refuse_in_txn,
    )

    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    _refuse_in_txn(path, "optimistic DML")
    _merge_check_source(source, on, check_unique)
    jvm, fs, jpath = _fs(spark, path)
    root = path.rstrip("/")
    dv_root = _dv_path(path)
    last_conflict = ""

    def _cleanup(*dirs: str | None) -> None:
        for d in dirs:
            if d:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)

    for attempt in range(1, max_attempts + 1):
        partitioned = is_partitioned(spark, path)
        files0 = sorted(list_data_files(spark, path, recursive=True))
        if not files0:
            raise ValueError(f"no parquet files under {path}")
        dv0 = set(list_dv_files(spark, path))
        sub = _with_identity(
            spark, path, files0, path if partitioned else None
        )
        data_cols = [
            c for c in sub.columns if c not in ("__src_file", "__row_idx")
        ]
        part_cols: list[str] = []
        if partitioned:
            part_cols = _partition_cols(spark, path, files0[0])
        _merge_col_checks(data_cols, part_cols, matched_set, insert_values)
        dv0_entries = (
            spark.read.parquet(*sorted(dv0)).select("src_file", "row_idx")
            if dv0
            else None
        )
        live = _live(sub, dv0_entries)
        src = _merge_src(source, on)
        updated, tombstones, ins_df = _merge_frames(
            sub,
            live,
            src,
            on,
            data_cols,
            matched_set,
            matched_delete,
            insert_values,
            insert_condition,
            skip_unchanged,
        )

        def _stage_rows_df(df: DataFrame, created: list[str]) -> str:
            if partitioned:
                staging = f"{root}__cow_{uuid.uuid4().hex}"
                created.append(staging)
                df.write.partitionBy(*part_cols).mode("overwrite").parquet(
                    staging
                )
                return staging
            return _stage(spark, path, df, created)

        dv_staging = f"{root}__cow_dv_{uuid.uuid4().hex}"
        created: list[str] = []
        try:
            # READ + STAGE run lock-free: a concurrent commit can retire
            # a files0 member mid-job — a missing-file error is a
            # CONFLICT (retry against the new state), not an error
            try:
                tombstones.select(
                    F.col("__src_file").cast("string").alias("src_file"),
                    F.col("__row_idx").cast("long").alias("row_idx"),
                ).write.parquet(dv_staging)
                n_dead = spark.read.parquet(dv_staging).count()  # footers
                touched = (
                    {
                        r["src_file"]
                        for r in spark.read.parquet(dv_staging)
                        .select("src_file")
                        .distinct()
                        .collect()
                    }
                    if n_dead
                    else set()
                )
                upd_staging = _stage_rows_df(updated, created)
                ins_staging = _stage_rows_df(ins_df, created)
                if table_constraints(spark, path):
                    _enforce_constraints(
                        spark, path, [upd_staging, ins_staging]
                    )
                n_upd = _staged_rows(spark, upd_staging)
                n_ins = _staged_rows(spark, ins_staging)
            except Exception as e:
                if not _is_missing_file_error(e) or not fs.exists(jpath):
                    raise
                last_conflict = "input file vanished during stage"
                spark.catalog.clearCache()
                raise _Conflict() from None
            if n_dead == 0 and n_ins == 0:
                # nothing matched, nothing inserts: no-op statement —
                # commit no version, leave no debris
                _cleanup(dv_staging, *created)
                return MutationStats(len(files0), 0, 0, 0)
            if _after_stage is not None:
                _after_stage(attempt)
            try:
                lock = _writer_lock(spark, path, lock_wait_seconds)
                lock.__enter__()
            except _WriterLockHeld:
                last_conflict = (
                    f"<writer lock held past the {lock_wait_seconds:g}s "
                    "wait>"
                )
                raise _Conflict() from None
            try:
                conflict = _dv_snapshot_conflict(
                    spark, fs, jvm, path, touched, dv0
                )
                if conflict:
                    last_conflict = conflict
                    raise _Conflict()
                # copies + inserts land before the tombstones that hide
                # the old (a crash between duplicates, never loses)
                mover = _move_in
                if partitioned:
                    mover = lambda s, p, st: _move_in_partitioned(  # noqa: E731
                        s, p, st, part_cols
                    )
                if n_upd:
                    mover(spark, path, upd_staging)
                else:
                    _cleanup(upd_staging)
                if n_ins:
                    mover(spark, path, ins_staging)
                else:
                    _cleanup(ins_staging)
                if n_dead:
                    _move_dv_parts(spark, fs, jvm, dv_root, dv_staging)
                _cleanup(dv_staging)
                _commit(spark, path)
                _mark_mutated(spark, path)
                spark.catalog.clearCache()
                return MutationStats(len(files0), 0, n_dead, n_ins)
            finally:
                lock.__exit__(None, None, None)
        except _Conflict:
            _cleanup(dv_staging, *created)
            continue
        except BaseException:
            _cleanup(dv_staging, *created)
            raise
    raise RuntimeError(
        f"occ_dv_merge_into on {path} lost the commit race "
        f"{max_attempts} times (last conflict: {last_conflict}); raise "
        "max_attempts or reduce writer contention"
    )


def _staged_rows(spark: SparkSession, staging: str) -> int:
    """Row count of a staged write from parquet footers (no data I/O);
    0 for an empty partitioned staging (which writes no part files)."""
    files = list_data_files(spark, staging, recursive=True)
    if not files:
        return 0
    return spark.read.parquet(*files).count()


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
        # versioned / snapshotted tables retire superseded files (data
        # AND deletion-vector batches) instead of deleting — older
        # manifests pin them, the same auto-retain rule as the COW verbs
        retain = bool(list_snapshots(spark, path))
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
            if retain:
                _retire_files(spark, path, fl)
            else:
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
        old_dv_parquet = list_dv_files(spark, path)
        if removed and survivors.limit(1).count():
            # partial materialize: shrink the store by the graduated
            # files' vectors WITHOUT ever leaving it empty or missing —
            # stage the pruned copy (reads the old batch files), move it
            # in beside them, only then retire/delete the old batches.
            # Any crash point leaves at-least-once tombstones, which the
            # anti join reads identically.
            pruned = _stage(spark, path, survivors)
            _move_in(spark, _dv_path(path), pruned)
            if retain:
                _retire_files(spark, path, old_dv_parquet)
                _delete_files(
                    spark,
                    [f for f in old_dv_files if f not in old_dv_parquet],
                )
            else:
                _delete_files(spark, old_dv_files)
        elif retain:
            # full materialize on a versioned table: the old batches stay
            # reachable for time travel; only marker files die with the dir
            _retire_files(spark, path, old_dv_parquet)
            fs.delete(dv_root, True)
        else:
            fs.delete(dv_root, True)
        if retain:
            _commit(spark, path)
        else:
            from .mutate import _refresh_indexes

            _refresh_indexes(spark, path)
        spark.catalog.clearCache()
        return MutationStats(len(files), removed, 0)
