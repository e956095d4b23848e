"""Copy-on-write UPDATE / DELETE / MERGE INTO over parquet table directories.

Reference parity and one step beyond: the reference PARSES UPDATE/DELETE but
never executes them (``engine/src/parser.cpp:232-296`` builds the statement
AST; the CLI routes execution to MySQL and the standalone optimizer skips
DML).  This module EXECUTES all three verbs Delta-style without a
transaction log — copy-on-write at FILE granularity.

How it scales (the design constraint):

1. **Prune** — find the files containing at least one affected row with a
   predicate-pushed scan grouped by ``input_file_name()``.  Parquet footer
   min/max statistics let that scan skip non-matching row groups, so on a
   range-clustered table (``sources.write(sort_for_skipping=...)``) the
   prune is metadata-dominated.  The resulting file LIST is table metadata
   (what Delta keeps in its log) — thousands of names, never rows — and is
   the only thing that crosses to the driver.
2. **Rewrite** — read ONLY the affected files, apply the mutation, write the
   survivors to a sibling staging directory.  Untouched files are never
   opened: at 100 TB a point DELETE on the cluster key rewrites one file,
   not the table.
3. **Swap** — move staged files into the table directory, then delete the
   originals.  Stage-then-swap means the mutation is materialized before
   any original byte is removed; a crash mid-swap can leave BOTH copies
   (detectable, re-runnable), never neither.

All filesystem operations go through the Hadoop FileSystem API (HDFS / S3A /
local alike), not Python's ``os`` module.

Retention & time travel: every verb takes ``retain=True`` to move superseded
files into an underscore-prefixed ``_retired/`` area (invisible to normal
reads) instead of deleting them; ``create_snapshot`` pins the table's
current file list as a named manifest, ``read_snapshot`` reads exactly that
list back (COW never rewrites a file in place, so a pinned list IS a
consistent version), and ``vacuum`` purges retired files no manifest
references.  ``enable_versioning`` builds a linear VERSION LOG on top:
every mutating verb auto-commits the next numbered manifest inside the
writer lock, giving readers snapshot isolation (``read_version`` pins a
version's exact bytes across later DML).

Concurrency: the classic verbs are SINGLE-WRITER (the advisory lock
detects a second writer and refuses).  ``occ_update_where`` /
``occ_delete_where`` add OPTIMISTIC multi-writer commits on flat tables —
stage without the lock, then validate-and-swap under a short bounded-wait
lock, retrying against the newly committed state on conflict (the
Delta/Iceberg commit-loop shape; see the protocol comment above
``_occ_mutate_flat``).  Two writers on disjoint keys both commit; writers
on overlapping files serialize via retry with no lost update.  Isolation
is snapshot-level (Delta's WriteSerializable analog): a retry re-reads
everything, but a FIRST-attempt commit does not re-evaluate its predicate
over rows a concurrent writer inserted after its read.
"""

from __future__ import annotations

import contextlib
import functools
import re
import threading
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MutationStats:
    """What a DML verb did — the executed analog of the reference's
    parse-only acknowledgement."""

    files_total: int
    files_rewritten: int
    rows_matched: int
    rows_inserted: int = 0

    def render(self) -> str:
        return (
            f"rewrote {self.files_rewritten}/{self.files_total} files, "
            f"{self.rows_matched} rows matched, "
            f"{self.rows_inserted} rows inserted"
        )


def _cond(condition: str | Column) -> Column:
    return F.expr(condition) if isinstance(condition, str) else condition


def __enforce_constraints(spark, path, staged_dirs):
    """Lazy indirection to :mod:`.constraints` (keeps the import graph
    acyclic: constraints.py imports this module's helpers eagerly).

    Patch point (changed by the r12 facade split): the attribute is
    resolved on :mod:`.constraints` at CALL time, so monkeypatch
    ``constraints._enforce_constraints`` — patching the facade re-export
    ``mutate._enforce_constraints`` no longer affects the DML verbs."""
    from . import constraints

    return constraints._enforce_constraints(spark, path, staged_dirs)


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` — the cluster-portable file
    API (local fs here; HDFS/S3A on a real cluster with zero code change)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return jvm, fs, jpath


def list_data_files(
    spark: SparkSession, path: str, recursive: bool = False
) -> list[str]:
    """Parquet data files currently making up the table (full URIs).

    ``recursive=False`` refuses hive-partitioned layouts: the partition
    column lives in the DIRECTORY NAME, not the files, so a flat
    file-level rewrite would silently drop it.  Verbs that implement the
    per-partition swap pass ``recursive=True`` to walk ``key=value`` dirs.
    """
    jvm, fs, jpath = _fs(spark, path)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name:
            if not recursive:
                raise NotImplementedError(
                    "copy-on-write over a hive-partitioned directory needs "
                    f"the per-partition path (found partition dir {name!r}); "
                    "this verb does not implement it"
                )
            out.extend(
                list_data_files(spark, st.getPath().toString(), recursive=True)
            )
        if st.isFile() and not name.startswith(("_", ".")):
            out.append(st.getPath().toString())
    return sorted(out)


def is_partitioned(spark: SparkSession, path: str) -> bool:
    """True when the table dir uses hive-style ``key=value`` partition
    subdirectories."""
    jvm, fs, jpath = _fs(spark, path)
    return any(
        st.isDirectory() and "=" in st.getPath().getName()
        for st in fs.listStatus(jpath)
    )


def affected_files(
    spark: SparkSession, path: str, condition: str | Column
) -> list[str]:
    """Files containing ≥1 row where ``condition`` is TRUE (the prune step).

    The scan pushes ``condition`` into the parquet reader, so row groups
    whose footer min/max exclude it are skipped without decoding — on a
    range-clustered table this reads footers, not data.
    """
    df = spark.read.parquet(path)
    rows = (
        df.where(_cond(condition))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    return sorted(r["f"] for r in rows)


def _stage(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    created: list[str] | None = None,
) -> str:
    """Materialize ``df`` to a sibling staging dir NOW (while every file its
    plan reads still exists) and return the staging path.  ``created``
    (when given) records the path BEFORE the write starts, so a failure
    mid-write still leaves the caller knowing exactly what to reclaim."""
    staging = path.rstrip("/") + f"__cow_{uuid.uuid4().hex}"
    if created is not None:
        created.append(staging)
    df.write.mode("overwrite").parquet(staging)
    return staging


def _rename_part(jvm, fs, src, dest_dir, tag: str, i: int) -> None:
    """Rename one staged part file into ``dest_dir`` under a fresh unique
    COW name — the single swap primitive both movers share."""
    dest = jvm.org.apache.hadoop.fs.Path(
        dest_dir, f"part-cow-{tag}-{i:05d}.snappy.parquet"
    )
    if not fs.rename(src, dest):
        raise IOError(f"COW swap: rename {src} -> {dest} failed")


def _move_in(spark: SparkSession, path: str, staging: str) -> int:
    """Move staged part files into the table dir under fresh unique names;
    returns how many files moved."""
    jvm, fs, table_path = _fs(spark, path)
    tag = uuid.uuid4().hex[:12]
    i = 0
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staging)):
        name = st.getPath().getName()
        if not st.isFile() or name.startswith(("_", ".")):
            continue
        _rename_part(jvm, fs, st.getPath(), table_path, tag, i)
        i += 1
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return i


def _move_in_partitioned(
    spark: SparkSession, path: str, staging: str, part_cols: list[str]
) -> int:
    """Move a hive-partitioned staging dir's part files into the matching
    ``key=value`` directories under the table (created as needed); returns
    how many files moved.  The partition value lives in the directory
    name, so preserving each staged file's partition-relative path IS the
    data move."""
    jvm, fs, table_path = _fs(spark, path)
    tag = uuid.uuid4().hex[:12]
    moved = 0

    def walk(d, rel: str) -> None:
        nonlocal moved
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                walk(st.getPath(), f"{rel}/{name}" if rel else name)
            elif st.isFile():
                dest_dir = (
                    jvm.org.apache.hadoop.fs.Path(table_path, rel)
                    if rel
                    else table_path
                )
                fs.mkdirs(dest_dir)
                _rename_part(jvm, fs, st.getPath(), dest_dir, tag, moved)
                moved += 1

    walk(jvm.org.apache.hadoop.fs.Path(staging), "")
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return moved


def _group_by_dir(files: list[str]) -> dict[str, list[str]]:
    """Group file URIs by their containing directory — the per-partition
    unit every partitioned verb swaps on.  One shared implementation so a
    future normalization fix (e.g. URI scheme forms) reaches all of them."""
    groups: dict[str, list[str]] = {}
    for f in files:
        groups.setdefault(f.rsplit("/", 1)[0], []).append(f)
    return groups


def _partition_cols(spark: SparkSession, path: str, sample_file: str) -> list[str]:
    """Partition columns of a hive-layout table = columns present in the
    partitioned read but absent from the physical files."""
    full_cols = spark.read.parquet(path).columns
    physical = spark.read.parquet(sample_file).columns
    return [c for c in full_cols if c not in physical]


def _delete_files(spark: SparkSession, files: list[str]) -> None:
    jvm, fs, _ = _fs(spark, files[0]) if files else (None, None, None)
    for f in files:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)


#: Underscore prefix ⇒ invisible to Spark's file discovery (same convention
#: as _SUCCESS/_metadata), so retired files and manifests never leak into a
#: normal table read.
RETIRED_DIR = "_retired"
SNAPSHOT_DIR = "_snapshots"
LOCK_FILE = "_cow.lock"


class _WriterLockHeld(RuntimeError):
    """The advisory writer lock is held by someone else (subclass of the
    historical RuntimeError so existing callers' handling keeps working).
    The optimistic verbs catch this to convert refuse into retry."""


def _is_already_exists(e: Exception) -> bool:
    """Did a py4j-wrapped Hadoop create(overwrite=False) fail because the
    file exists?  Match the Java exception CLASS — free-text matching
    breaks across FileSystem implementations; keep a message fallback only
    for wrappers that drop the class."""
    cls = ""
    je = getattr(e, "java_exception", None)
    if je is not None:
        with contextlib.suppress(Exception):
            cls = je.getClass().getName()
    return cls.endswith("FileAlreadyExistsException") or (
        not cls and "already exists" in str(e).lower()
    )


#: Per-path in-process mutexes serializing the create-if-absent attempt:
#: Hadoop's LOCAL FileSystem implements create(overwrite=false) as an
#: exists() check followed by the create (TOCTOU), so two threads of ONE
#: process hitting the lock at the same instant could BOTH "acquire" it —
#: observed as two OCC writers sharing a commit window and the second
#: manifest overwriting the first.  The mutex guards only the one create
#: call (never held across the verb); cross-PROCESS atomicity is the
#: filesystem's contract (HDFS create-if-absent is atomic; local
#: multi-process writers remain S3-class "bring a real lock service").
_LOCK_ATTEMPT_MUTEXES: dict[str, threading.Lock] = {}
_LOCK_ATTEMPT_GUARD = threading.Lock()


def _lock_attempt_mutex(path: str) -> threading.Lock:
    key = _txn_key(path)
    with _LOCK_ATTEMPT_GUARD:
        return _LOCK_ATTEMPT_MUTEXES.setdefault(key, threading.Lock())


def _acquire_writer_lock(
    spark: SparkSession, path: str, wait_seconds: float = 0.0
) -> None:
    """Atomically create ``_cow.lock`` (fails if present); see
    :func:`_writer_lock` for the semantics."""
    jvm, fs, table_path = _fs(spark, path)
    lock = jvm.org.apache.hadoop.fs.Path(table_path, LOCK_FILE)
    mutex = _lock_attempt_mutex(path)
    deadline = time.monotonic() + wait_seconds
    while True:
        try:
            with mutex:  # same-process threads: check+create is atomic
                out = fs.create(lock, False)
            break
        except Exception as e:  # py4j wraps the Java exception
            if not _is_already_exists(e):
                raise
            if time.monotonic() < deadline:
                time.sleep(0.1)
                continue
            raise _WriterLockHeld(
                f"another writer holds {lock}: concurrent COW DML is "
                "refused (single-writer). If the previous writer crashed, "
                "remove the lock file after confirming nothing is running."
            ) from None
    try:
        # a failure after the create must not leak the lock — a leaked
        # lock wedges every future DML on the table until manual removal
        out.write(bytearray(uuid.uuid4().hex.encode()))
        out.close()
    except Exception:
        with contextlib.suppress(Exception):
            fs.delete(lock, False)
        raise


def _release_writer_lock(spark: SparkSession, path: str) -> None:
    jvm, fs, table_path = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(table_path, LOCK_FILE), False)


#: Active multi-statement transactions (operators/txn.py): normalized
#: table path -> state.  Consulted by _writer_lock (the owning thread
#: re-enters: the transaction already holds the physical lock for its
#: whole span) and _autoversion/_refresh_indexes (defer the version
#: commit + index maintenance to Transaction.commit, which writes ONE
#: manifest for the whole batch).
_ACTIVE_TXNS: dict[str, "_TxnState"] = {}


@dataclass
class _TxnState:
    path: str
    owner: int  # threading.get_ident() of the beginning thread
    dirty: bool = False  # did any verb change anything?
    verbs: int = 0


def _txn_key(path: str) -> str:
    from ..catalog import _norm_path

    return _norm_path(path)


def _txn_state(path: str) -> "_TxnState | None":
    return _ACTIVE_TXNS.get(_txn_key(path))


def _refuse_in_txn(path: str, what: str) -> None:
    """Maintenance verbs that reclaim or re-commit state are refused while
    a transaction is open on the table: vacuum would delete the txn's own
    uncommitted (manifest-less) files, restore/drop would move the commit
    anchor the rollback plan targets."""
    st = _txn_state(path)
    if st is not None:
        raise RuntimeError(
            f"{what} refused: a multi-statement transaction is open on "
            f"{path} — commit() or rollback() it first"
        )


@contextlib.contextmanager
def _writer_lock(
    spark: SparkSession, path: str, wait_seconds: float = 0.0
):
    """Advisory single-writer lock: atomically create ``_cow.lock`` (fails
    if present), release on exit.

    ``wait_seconds=0`` (the classic verbs) DETECTS a concurrent writer and
    refuses immediately; the optimistic verbs pass a short bound and poll —
    their lock hold time is the metadata swap only, so waiting beats
    refusing.  Create-if-absent is atomic on HDFS and local filesystems
    (S3 needs a real catalog/log for that guarantee; stated, not papered
    over).  A crashed writer leaves a stale lock; the error says exactly
    which file to remove after confirming no writer is alive.

    Re-entrant for the thread that opened a multi-statement transaction
    on the table (operators/txn.py): the Transaction holds the physical
    lock for its whole span, so its verbs pass straight through while
    every other thread/process still hits the lock file and refuses.
    """
    st = _txn_state(path)
    if st is not None and st.owner == threading.get_ident():
        st.verbs += 1
        yield
        return
    _acquire_writer_lock(spark, path, wait_seconds)
    try:
        yield
    finally:
        _release_writer_lock(spark, path)


def _with_writer_lock(fn):
    """Decorator: run a mutating verb under the table's writer lock; on a
    version-enabled table (see :func:`enable_versioning`) every mutation
    that changed anything commits the next numbered version manifest
    before the lock releases — the single choke point that makes the
    version log linear."""

    @functools.wraps(fn)
    def wrapper(spark, path, *args, **kwargs):
        with _writer_lock(spark, path):
            out = fn(spark, path, *args, **kwargs)
            if isinstance(out, MutationStats) and (
                out.files_rewritten or out.rows_inserted
            ):
                from .versioning import _autoversion

                _autoversion(spark, path)
                # bloom sidecars: index the files this verb just created
                # (compact included — it replaces indexed files wholesale)
                _refresh_indexes(spark, path)
                # layout-only verbs (compact/recluster) move bytes but
                # change no row — ANALYZE row/NDV stats stay exact, so
                # they must not trip the staleness warning + re-harvest.
                # They DO rewrite files, so the catalog's file-listing
                # epoch (which the load_tables definition memo keys on)
                # must advance either way; _mark_mutated bumps both.
                if fn.__name__ not in _LAYOUT_ONLY_VERBS:
                    _mark_mutated(spark, path)
                else:
                    _mark_files_changed(spark, path)
            return out

    return wrapper


#: verbs whose rewrites preserve every row value (pure file layout)
_LAYOUT_ONLY_VERBS = frozenset({"compact"})


def _mark_mutated(spark: SparkSession, path: str) -> None:
    """Bump the catalog's per-path mutation epoch so registered ANALYZE
    stats for this table are surfaced as stale instead of silently served
    (catalog.stats_stale / plans.genetic.graph_for_advice).  Also bumps
    the file-listing epoch (every row mutation rewrites files)."""
    from ..catalog import mark_table_mutated

    with contextlib.suppress(Exception):
        mark_table_mutated(spark, path)


def _mark_files_changed(spark: SparkSession, path: str) -> None:
    """Bump ONLY the catalog's file-listing epoch — the layout-only-verb
    half of :func:`_mark_mutated`: compact() moves every byte into new
    files (the load_tables definition memo must invalidate) without
    changing a row value (ANALYZE stats stay exact)."""
    from ..catalog import mark_table_files_changed

    with contextlib.suppress(Exception):
        mark_table_files_changed(spark, path)


#: set to "false" to opt out of post-DML bloom-index maintenance (the
#: indexes stay CORRECT either way — unindexed files are always probe
#: candidates — they just stop earning skips until a manual refresh)
AUTO_REFRESH_INDEX_CONF = "spark.sqlopt.autoRefreshIndexes"


def _refresh_indexes(spark: SparkSession, path: str) -> None:
    """Post-commit bloom-index maintenance: re-index the files this DML
    just created, O(new files) per indexed column and one cheap dir
    listing when the table has no indexes.  Runs inside the writer lock
    (sidecar appends must not race another writer).  A failure degrades
    to always-candidate files — correctness never depends on this hook,
    so it warns instead of failing the already-committed mutation."""
    import warnings

    if _txn_state(path) is not None:
        # deferred: Transaction.commit() runs ONE refresh for the batch
        # (it pops the registry entry before calling back in here)
        return
    if str(
        spark.conf.get(AUTO_REFRESH_INDEX_CONF, "true")
    ).lower() != "true":
        return
    try:
        from .fileindex import refresh_all_bloom_indexes

        refresh_all_bloom_indexes(spark, path)
    except Exception as e:  # pragma: no cover - defensive
        warnings.warn(
            f"bloom index auto-refresh on {path} failed ({e}); point "
            "lookups stay correct (unindexed files are always "
            "candidates) — run refresh_bloom_index manually",
            stacklevel=2,
        )


def _default_retain(spark: SparkSession, path: str, retain: bool | None) -> bool:
    """``retain=None`` (the verbs' default) auto-retains when the table has
    snapshot manifests: deleting superseded files out from under a pinned
    manifest would break time travel later and misdirect the blame at
    ``vacuum``.  Explicit ``False`` still deletes — the caller owns the
    consequences.

    Doubles as the mutual-exclusion choke point with the merge-on-read
    layer: every file-rewriting verb (classic + optimistic + compact)
    resolves its retain policy here, so this is the one place that can
    refuse rewriting a table carrying live deletion vectors — a COW
    rewrite reads the BASE files (underscore dirs invisible) and would
    resurrect MOR-deleted rows into the rewritten output while their
    tombstones still point at the replaced file names."""
    from .mor import has_deletion_vectors

    if has_deletion_vectors(spark, path):
        raise ValueError(
            f"copy-on-write DML refused: {path} carries live deletion "
            "vectors (merge-on-read layer); a rewrite would resurrect "
            "MOR-deleted rows. Run operators.mor.materialize_deletes "
            "first, then retry."
        )
    if retain is not None:
        return retain
    from .versioning import list_snapshots

    return bool(list_snapshots(spark, path))


def _retire_files(spark: SparkSession, path: str, files: list[str]) -> None:
    """Move superseded files into ``_retired/<batch>/`` instead of deleting
    them — the raw material time travel and snapshot reads are made of.

    The TABLE-RELATIVE path is preserved under the batch dir (not just the
    basename): partitioned writes reuse part numbers across partition
    dirs, so ``lang=en/part-00000-x.parquet`` and
    ``lang=de/part-00000-x.parquet`` must retire to distinct locations.
    """
    if not files:
        return
    jvm, fs, table_path = _fs(spark, path)
    batch = f"{RETIRED_DIR}/{uuid.uuid4().hex[:12]}"
    for f in files:
        src = jvm.org.apache.hadoop.fs.Path(f)
        rel = _rel_to_table(path, f)
        dest = jvm.org.apache.hadoop.fs.Path(table_path, f"{batch}/{rel}")
        fs.mkdirs(dest.getParent())
        if not fs.rename(src, dest):
            raise IOError(f"retire: rename {f} -> {dest} failed")


def _swap_in(
    spark: SparkSession,
    path: str,
    old_files: list[str],
    rewritten: DataFrame,
    retain: bool = False,
    enforce: bool = False,
) -> None:
    """Materialize ``rewritten`` to a sibling staging dir, move its parts
    into the table, delete (or retire) ``old_files``.  Stage completes
    before any original is touched (crash ⇒ duplicates, never data loss).
    ``enforce``: verify table constraints over the staged output before
    the swap (value-changing verbs set it; DELETE cannot violate)."""
    staging = _stage(spark, path, rewritten)
    if enforce:
        try:
            __enforce_constraints(spark, path, [staging])
        except BaseException:
            jvm, fs, _ = _fs(spark, path)
            with contextlib.suppress(Exception):
                fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
            raise
    _move_in(spark, path, staging)
    if retain:
        _retire_files(spark, path, old_files)
    else:
        _delete_files(spark, old_files)
    # rewritten files changed on disk under this session's feet
    spark.catalog.clearCache()


#: Driver-side fs metadata concurrency for the per-partition swap phase.
#: Renames/deletes are independent per partition dir; a serial loop is
#: O(partitions) round-trips of driver latency — minutes at 10⁴ partitions.
SWAP_THREADS = 16


def _swap_staged(
    spark: SparkSession,
    path: str,
    staged: list[tuple[str, list[str], str]],
    retain: bool,
) -> None:
    """Phase 2 of every partitioned COW verb: move each ``(part_dir,
    old_files, staging)`` entry's staged parts in and delete/retire the
    originals, thread-pooled (independent per partition — pure driver-side
    fs metadata calls, no Spark jobs).

    MUST only run after ALL partitions are staged: phase 1 may re-evaluate
    a plan that reads the table itself (a MERGE source derived from the
    target), so no original file may disappear while any staging write is
    still pending.  Crash semantics: death in phase 1 leaves only orphan
    staging dirs (table untouched, ``repair_table`` reclaims); death in
    phase 2 can leave some partitions swapped and others not — the same
    window the flat-table verbs already have, now minimized.
    """
    from concurrent.futures import ThreadPoolExecutor

    def one(entry: tuple[str, list[str], str]) -> None:
        part_dir, pfiles, staging = entry
        _move_in(spark, part_dir, staging)
        if retain:
            _retire_files(spark, path, pfiles)
        else:
            _delete_files(spark, pfiles)

    if not staged:
        return
    if len(staged) == 1:
        one(staged[0])
        return
    # py4j is thread-safe (one gateway connection per thread); each task
    # touches a disjoint partition dir, retire batches are uuid-unique
    with ThreadPoolExecutor(max_workers=min(SWAP_THREADS, len(staged))) as ex:
        for _ in ex.map(one, staged):
            pass


#: Concurrent Spark jobs for the per-partition STAGING phase.  Partition
#: rewrites are independent jobs; a serial loop leaves the cluster idle
#: between job tails.  Kept below SWAP_THREADS — each staging job already
#: fans out across executor cores, so a few in flight saturate.
STAGE_JOBS = 8


def _run_partition_stages(spark: SparkSession, path: str, items, stage_one):
    """Phase 1 of every partitioned COW verb: run ``stage_one(item,
    created)`` for every partition, a few CONCURRENT Spark jobs at a time
    (partition rewrites are independent; Spark schedules concurrent jobs
    from threads fairly).  ``created`` is a list the callee must hand to
    :func:`_stage`, which registers each staging path BEFORE writing to
    it.  Returns results in the input order.

    On any failure: pending stages are CANCELLED (a failed mutation must
    not burn the cluster finishing rewrites whose output is about to be
    deleted), in-flight ones are awaited, and exactly the staging dirs
    THIS call registered are reclaimed — never a sibling's.  A pattern
    sweep (``<table>__cow_*``) would also delete a concurrent optimistic
    writer's staging, which stages lock-free by design.  No original has
    been touched in phase 1.
    """
    from concurrent.futures import ThreadPoolExecutor

    items = list(items)
    created: list[str] = []  # list.append is atomic under the GIL
    try:
        if len(items) == 1:
            return [stage_one(items[0], created)]
        with ThreadPoolExecutor(
            max_workers=min(STAGE_JOBS, max(len(items), 1))
        ) as ex:
            futures = [ex.submit(stage_one, it, created) for it in items]
            try:
                return [f.result() for f in futures]
            except Exception:
                for f in futures:
                    f.cancel()
                raise
    except Exception:
        # phase-1 failure: executor shutdown awaited the in-flight tasks,
        # so `created` is final — reclaim exactly what this call made
        jvm, fs, _ = _fs(spark, path)
        for staging in created:
            with contextlib.suppress(Exception):
                fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        raise


def _mutate_partitioned(
    spark: SparkSession,
    path: str,
    cond: Column,
    build,
    retain: bool,
    enforce: bool = False,
) -> MutationStats:
    """Per-partition copy-on-write: group affected files by their hive
    partition directory, stage EVERY partition's rewrite first, then swap
    them all in (thread-pooled fs metadata phase).

    - The prune scan runs over the PARTITIONED read, so predicates on
      partition columns prune whole directories before any footer is
      touched (the cheapest skip there is).
    - Each partition's rewrite reads with ``basePath`` so partition
      columns are in scope for the predicate, and drops them before
      writing (they live in the directory name, not the file).
    - Stage-all-THEN-swap (same discipline as the flat-table verbs):
      every original file still exists while any rewrite plan is being
      evaluated, so a predicate or source reading the table itself can
      never hit a mid-swap hole; a crash before phase 2 leaves the table
      untouched.
    """
    files_all = list_data_files(spark, path, recursive=True)
    hit = affected_files(spark, path, cond)
    if not hit:
        return MutationStats(len(files_all), 0, 0)
    part_cols = _partition_cols(spark, path, hit[0])
    groups = _group_by_dir(hit)

    def stage_one(item: tuple[str, list[str]], created: list[str]):
        part_dir, pfiles = item
        sub = spark.read.option("basePath", path).parquet(*pfiles)
        rewritten, matched = build(sub, part_cols)
        return (
            part_dir,
            pfiles,
            _stage(spark, path, rewritten.drop(*part_cols), created),
            matched,
        )

    results = _run_partition_stages(
        spark, path, sorted(groups.items()), stage_one
    )
    staged = [(d, p, s) for d, p, s, _ in results]
    matched_total = sum(m for _, _, _, m in results)
    if enforce:
        try:
            __enforce_constraints(spark, path, [s for _, _, s in staged])
        except BaseException:
            jvm, fs, _ = _fs(spark, path)
            for _, _, s in staged:
                with contextlib.suppress(Exception):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(s), True)
            raise
    _swap_staged(spark, path, staged, retain)
    spark.catalog.clearCache()
    return MutationStats(len(files_all), len(hit), matched_total)


@_with_writer_lock
def delete_where(
    spark: SparkSession,
    path: str,
    condition: str | Column,
    retain: bool | None = None,
) -> MutationStats:
    """``DELETE FROM <path> WHERE condition`` — SQL three-valued logic:
    only rows where the predicate is TRUE are deleted; NULL keeps the row
    (exactly what ``DELETE`` does in every SQL engine).  Works on flat and
    hive-partitioned tables (per-partition swap; partition-column
    predicates prune whole directories)."""
    retain = _default_retain(spark, path, retain)
    cond = _cond(condition)
    if is_partitioned(spark, path):
        def build(sub: DataFrame, part_cols: list[str]):
            return (
                sub.where(~F.coalesce(cond, F.lit(False))),
                sub.where(cond).count(),
            )

        return _mutate_partitioned(spark, path, cond, build, retain)
    files = list_data_files(spark, path)
    hit = affected_files(spark, path, cond)
    if not hit:
        return MutationStats(len(files), 0, 0)
    sub = spark.read.parquet(*hit)
    deleted = sub.where(cond).count()
    kept = sub.where(~F.coalesce(cond, F.lit(False)))
    _swap_in(spark, path, hit, kept, retain=retain)
    return MutationStats(len(files), len(hit), deleted)


@_with_writer_lock
def update_where(
    spark: SparkSession,
    path: str,
    set_map: dict[str, str | Column],
    condition: str | Column,
    retain: bool | None = None,
) -> MutationStats:
    """``UPDATE <path> SET col = expr, ... WHERE condition``.

    Each assignment is cast back to the column's EXISTING type: a COW
    rewrite must never drift the schema of rewritten files away from the
    untouched ones (a widened column would poison every later scan).

    Works on flat and hive-partitioned tables; assigning a PARTITION
    column is refused — changing a row's partition value means moving it
    between directories, which is a delete+insert, not an update.
    """
    retain = _default_retain(spark, path, retain)
    cond = _cond(condition)
    if is_partitioned(spark, path):
        full_cols = spark.read.parquet(path).columns
        unknown = set(set_map) - set(full_cols)
        if unknown:
            raise ValueError(
                f"UPDATE SET on unknown columns: {sorted(unknown)}"
            )

        def build(sub: DataFrame, part_cols: list[str]):
            part_here = [c for c in set_map if c in part_cols]
            if part_here:
                raise ValueError(
                    f"UPDATE SET on partition columns: {sorted(part_here)}; "
                    "changing a row's partition is a delete + insert"
                )
            projected = [
                F.when(F.coalesce(cond, F.lit(False)), _cond(set_map[c]))
                .otherwise(F.col(c))
                .cast(sub.schema[c].dataType)
                .alias(c)
                if c in set_map
                else F.col(c)
                for c in sub.columns
            ]
            return sub.select(*projected), sub.where(cond).count()

        return _mutate_partitioned(
            spark, path, cond, build, retain, enforce=True
        )
    files = list_data_files(spark, path)
    hit = affected_files(spark, path, cond)
    if not hit:
        return MutationStats(len(files), 0, 0)
    sub = spark.read.parquet(*hit)
    unknown = set(set_map) - set(sub.columns)
    if unknown:
        raise ValueError(f"UPDATE SET on unknown columns: {sorted(unknown)}")
    matched = sub.where(cond).count()
    projected = [
        F.when(F.coalesce(cond, F.lit(False)), _cond(set_map[c]))
        .otherwise(F.col(c))
        .cast(sub.schema[c].dataType)
        .alias(c)
        if c in set_map
        else F.col(c)
        for c in sub.columns
    ]
    _swap_in(
        spark, path, hit, sub.select(*projected), retain=retain, enforce=True
    )
    return MutationStats(len(files), len(hit), matched)


@dataclass
class _StagedMerge:
    """Everything a MERGE's lock-free phase produced, ready to commit:
    the file list it read (the OCC validation read-set), the matched-file
    prune, each staged rewrite, and the staged insert directory."""

    files: list[str]
    hit: list[str]
    staged: list[tuple[str, list[str], str]]
    rows_matched: int
    ins_staging: str
    rows_inserted: int
    part_cols: list[str]
    partitioned: bool
    #: the constraint set the lock-free enforcement pass verified — the
    #: optimistic commit re-checks under its lock if the set has changed
    checked_constraints: dict = None  # type: ignore[assignment]

    def staging_dirs(self) -> list[str]:
        return [s for _, _, s in self.staged] + [self.ins_staging]


#: Widening chains evolve_schema accepts: any hop rightward is safe (no
#: value can be lost).  Everything off-chain is refused loudly.
_WIDEN_RANK = {
    "tinyint": ("i", 1),
    "smallint": ("i", 2),
    "int": ("i", 3),
    "bigint": ("i", 4),
    "float": ("f", 1),
    "double": ("f", 2),
}


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Schema-merging read of a COW table.  Required after an
    ``evolve_schema`` MERGE added columns: older untouched files lack the
    new columns and backfill NULL at read time (the parquet-native
    evolution story — the schema lives in the union of file footers, and
    new-nullable-column evolution never rewrites old files)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def _merge_prepare(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    matched_set: dict[str, str | Column] | None,
    insert_values: dict[str, str | Column] | None,
    check_unique: bool,
    matched_delete: str | Column | None,
    insert_condition: str | Column | None,
    max_pruned_files: int | None,
    evolve_schema: bool = False,
) -> _StagedMerge:
    """Phase 1 of MERGE: validate, prune, and STAGE everything — matched
    rewrites and insert files — without touching a single original file.
    The serialized verb runs this under the writer lock; the optimistic
    verb runs it lock-free and validates before commit.  On any failure
    every staging dir this call made is reclaimed before the exception
    propagates.

    ``evolve_schema``: source columns absent from the target JOIN the
    table schema — written into insert files and rewritten matched files
    (matched rows take the source value, other rows NULL), while
    untouched files simply lack them (read the table via
    :func:`read_table`, which NULL-backfills).  A source column whose
    type safely WIDENS the target's (tinyint→…→bigint, float→double)
    widens the table — that one genuinely rewrites every file (parquet
    schema merging refuses conflicting physical types, so a
    metadata-only widening would poison reads).  Any other type mismatch
    is refused loudly rather than silently cast.
    """
    for k in on:
        if k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from source")
    if check_unique:
        dup = source.groupBy(*on).count().where(F.col("count") > 1).limit(1)
        if dup.count():
            raise ValueError(
                "MERGE source has duplicate join keys; each target row "
                "must match at most one source row (pass "
                "check_unique=False only if uniqueness is guaranteed "
                "upstream)"
            )
    if evolve_schema:
        # mergeSchema: a previously-evolved table's newest columns live
        # only in its newest files
        target = spark.read.option("mergeSchema", "true").parquet(path)
    else:
        target = spark.read.parquet(path)
    partitioned = is_partitioned(spark, path)
    files = list_data_files(spark, path, recursive=partitioned)
    part_cols: list[str] = []
    if partitioned:
        part_cols = _partition_cols(spark, path, files[0])
    # schema-evolution plan: columns the source ADDS, columns it WIDENS
    new_fields: list[tuple[str, object]] = []
    widen: dict[str, object] = {}
    if evolve_schema:
        tgt_types = {f.name: f.dataType for f in target.schema.fields}
        for f in source.schema.fields:
            if f.name not in tgt_types:
                new_fields.append((f.name, f.dataType))
                continue
            t_s = tgt_types[f.name].simpleString()
            s_s = f.dataType.simpleString()
            if t_s == s_s:
                continue
            t_rank = _WIDEN_RANK.get(t_s)
            s_rank = _WIDEN_RANK.get(s_s)
            if t_rank and s_rank and t_rank[0] == s_rank[0]:
                if s_rank[1] > t_rank[1]:
                    if f.name in part_cols:
                        raise ValueError(
                            f"evolve_schema cannot widen partition column "
                            f"{f.name!r} (its values live in directory "
                            "names, not files)"
                        )
                    widen[f.name] = f.dataType
                # source narrower: the existing cast-to-target handles it
                continue
            raise ValueError(
                f"evolve_schema: source column {f.name!r} is {s_s} but the "
                f"target is {t_s} — only new nullable columns and safe "
                "widenings (tinyint→smallint→int→bigint, float→double) "
                "evolve; anything else needs an explicit migration"
            )
    evolved: list[tuple[str, object]] = [
        (c, widen.get(c, target.schema[c].dataType)) for c in target.columns
    ] + new_fields
    evolved_names = {n for n, _ in evolved}
    if matched_set:
        unknown = set(matched_set) - evolved_names
        if unknown:
            raise ValueError(
                f"MERGE matched_set on unknown columns: {sorted(unknown)}"
            )
        part_hit = [c for c in matched_set if c in part_cols]
        if part_hit:
            raise ValueError(
                f"MERGE matched_set on partition columns: {sorted(part_hit)}; "
                "changing a row's partition is a delete + insert"
            )
    if insert_values:
        unknown = set(insert_values) - evolved_names
        if unknown:
            raise ValueError(
                f"MERGE insert_values on unknown columns: {sorted(unknown)}"
            )
    src = source.select(
        *[F.col(c).alias(c if c in on else f"src_{c}") for c in source.columns]
    )
    has_matched_action = matched_set is not None or matched_delete is not None
    # prune: files containing at least one matched key.  The semijoin runs
    # key-vs-key — at scale AQE broadcasts the (deduplicated, small) key
    # side and the target never shuffles.  An insert-only merge (no
    # matched action) skips the prune AND the rewrite entirely — matched
    # rows are untouched by definition, so rewriting their files would be
    # pure write amplification.
    hit: list[str] = []
    if has_matched_action:
        hit_df = (
            target.select(*on, F.input_file_name().alias("f"))
            .join(src.select(*on).distinct(), on=on, how="leftsemi")
            .select("f")
            .distinct()
        )
        if max_pruned_files is not None:
            hit_df = hit_df.limit(max_pruned_files + 1)
        hit_rows = hit_df.collect()
        if max_pruned_files is not None and len(hit_rows) > max_pruned_files:
            # prune list exceeds the metadata bound: full-table COW
            # rewrite (same result, no unbounded driver list)
            hit = list(files)
        else:
            hit = sorted(r["f"] for r in hit_rows)
    if widen:
        # a widened physical type must reach EVERY file: parquet schema
        # merging refuses int-vs-bigint conflicts, so this is the one
        # evolution that is honestly a full rewrite
        hit = list(files)

    # inserts: source keys with no target partner (keys stay distributed —
    # never collected).  STAGE the insert rows FIRST, while every target
    # file this plan reads still exists; the commit phase's matched-file
    # swap deletes files out from under any not-yet-evaluated plan.
    unmatched = src.join(target.select(*on).distinct(), on=on, how="left_anti")
    if insert_condition is not None:
        unmatched = unmatched.where(_cond(insert_condition))
    iv = insert_values or {}
    ins_cols = []
    for c, dt in evolved:
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
    ins_staging = path.rstrip("/") + f"__cow_{uuid.uuid4().hex}"
    jvm, fs, _ = _fs(spark, path)
    try:
        if partitioned:
            # inserted rows must land in their key=value directories; a
            # NULL partition value routes to Hive's default partition dir
            ins_df.write.mode("overwrite").partitionBy(*part_cols).parquet(
                ins_staging
            )
        else:
            ins_df.write.mode("overwrite").parquet(ins_staging)
        # an all-matched partitioned merge stages ZERO part files
        # (partitionBy writes nothing for an empty frame), which a bare
        # read cannot infer a schema from — count through the file list
        staged_files = list_data_files(spark, ins_staging, recursive=True)
        rows_inserted = (
            spark.read.parquet(ins_staging).count() if staged_files else 0
        )

        rows_matched = 0
        staged: list[tuple[str, list[str], str]] = []
        if hit:
            def stage_rewrite(item: tuple[str, list[str]], created: list[str]):
                dest_dir, pfiles = item
                reader = spark.read
                if evolve_schema:
                    # a previously-evolved file group may itself be
                    # schema-heterogeneous
                    reader = reader.option("mergeSchema", "true")
                if partitioned:
                    # basePath keeps partition columns in scope (a merge
                    # key may BE one); they drop before writing — the
                    # directory name carries them
                    sub = reader.option("basePath", path).parquet(*pfiles)
                else:
                    sub = reader.parquet(*pfiles)
                marked = src.withColumn("__matched", F.lit(True))
                joined = sub.join(marked, on=on, how="left")
                is_match = F.coalesce(F.col("__matched"), F.lit(False))
                # matched-count rides the staging write as an observed
                # metric (one job per file group, not count + write)
                obs = Observation()
                joined = joined.observe(
                    obs, F.count(F.when(is_match, F.lit(1))).alias("m")
                )
                if matched_delete is not None:
                    joined = joined.where(
                        ~(
                            is_match
                            & F.coalesce(_cond(matched_delete), F.lit(False))
                        )
                    )
                ms = matched_set or {}
                projected = [
                    F.when(is_match, _cond(ms[c]))
                    .otherwise(F.col(c))
                    .cast(widen.get(c, sub.schema[c].dataType))
                    .alias(c)
                    if c in ms
                    else F.col(c).cast(
                        widen.get(c, sub.schema[c].dataType)
                    ).alias(c)
                    for c in sub.columns
                ]
                # evolution: columns this FILE GROUP lacks join its
                # rewritten files — both brand-new source columns AND
                # columns an EARLIER evolution added to other files only
                # (review finding: projecting just sub.columns silently
                # dropped a matched_set update on a column every hit file
                # in this group predates — a lost update).  Matched rows
                # take the matched_set expression or the source value;
                # everything else NULL-backfills.
                sub_cols = set(sub.columns)
                gap_fields = list(new_fields) + [
                    (n, dt)
                    for n, dt in evolved
                    if n not in sub_cols
                    and all(n != m for m, _ in new_fields)
                ]
                for name, dt in gap_fields:
                    if name in ms:
                        e = F.when(is_match, _cond(ms[name])).otherwise(
                            F.lit(None)
                        )
                    elif f"src_{name}" in joined.columns:
                        e = F.when(is_match, F.col(f"src_{name}")).otherwise(
                            F.lit(None)
                        )
                    else:
                        e = F.lit(None)
                    projected.append(e.cast(dt).alias(name))
                rewritten = joined.select(*projected)
                if part_cols:
                    rewritten = rewritten.drop(*part_cols)
                return (
                    dest_dir,
                    pfiles,
                    _stage(spark, path, rewritten, created),
                    lambda: obs.get["m"],
                )

            # STAGE every partition's rewrite before touching any
            # original: ``src`` is caller-supplied and may read from this
            # very table (self-referential merge), and Spark re-evaluates
            # its plan per staging job — deleting partition A's files
            # before staging partition B would hand that plan a mid-swap
            # hole (FileNotFoundException at best, silent reads of
            # swapped-in data at worst).
            items = (
                sorted(_group_by_dir(hit).items())
                if partitioned
                else [(path, hit)]
            )
            results = _run_partition_stages(spark, path, items, stage_rewrite)
            # a widening-only rewrite (no matched clause) touches every
            # file but ACTS on no row — report 0 matched, not key hits
            rows_matched = (
                sum(m() for _, _, _, m in results)
                if has_matched_action
                else 0
            )
            staged = [(d, p, s) for d, p, s, _ in results]
    except Exception:
        # don't orphan the staged inserts (or, if the failure was in the
        # rewrite staging, anything the stage helper didn't already
        # reclaim) — no original has been touched, so it is all debris
        with contextlib.suppress(Exception):
            fs.delete(jvm.org.apache.hadoop.fs.Path(ins_staging), True)
        raise
    try:
        # everything is staged and nothing original has moved: verify the
        # table's CHECK constraints over exactly what this merge wrote
        # (rewrites + inserts) in one job; a violation reclaims it all
        checked_cons = __enforce_constraints(
            spark, path, [s for _, _, s in staged] + [ins_staging]
        )
    except BaseException:
        for d in [s for _, _, s in staged] + [ins_staging]:
            with contextlib.suppress(Exception):
                fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
        raise
    return _StagedMerge(
        files=files,
        hit=hit,
        staged=staged,
        rows_matched=rows_matched,
        ins_staging=ins_staging,
        rows_inserted=rows_inserted,
        part_cols=part_cols,
        partitioned=partitioned,
        checked_constraints=checked_cons,
    )


def _merge_commit(
    spark: SparkSession, path: str, st: _StagedMerge, retain: bool
) -> None:
    """Phase 2 of MERGE: swap the staged rewrites in (thread-pooled) and
    move the staged inserts into the table.  Caller holds the writer lock.
    A swap failure leaves the rewrite staging dirs for ``repair_table``
    but reclaims the never-moved insert staging (pure debris)."""
    jvm, fs, _ = _fs(spark, path)
    if st.staged:
        try:
            _swap_staged(spark, path, st.staged, retain)
        except Exception:
            with contextlib.suppress(Exception):
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(st.ins_staging), True
                )
            raise
        spark.catalog.clearCache()
    if st.rows_inserted:
        if st.partitioned:
            _move_in_partitioned(spark, path, st.ins_staging, st.part_cols)
        else:
            _move_in(spark, path, st.ins_staging)
        spark.catalog.clearCache()
    else:
        fs.delete(jvm.org.apache.hadoop.fs.Path(st.ins_staging), True)


@_with_writer_lock
def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: list[str],
    matched_set: dict[str, str | Column] | None = None,
    insert_values: dict[str, str | Column] | None = None,
    check_unique: bool = True,
    matched_delete: str | Column | None = None,
    insert_condition: str | Column | None = None,
    retain: bool | None = None,
    max_pruned_files: int | None = 100_000,
    evolve_schema: bool = False,
) -> MutationStats:
    """``MERGE INTO <path> USING source ON keys`` — upsert, copy-on-write.

    - WHEN MATCHED AND ``matched_delete`` (evaluated over the joined row;
      source columns as ``src_<name>``): drop the target row — the CDC
      tombstone path.
    - WHEN MATCHED (otherwise): apply ``matched_set`` (same ``src_<name>``
      scope; target columns are in scope too, so conditional updates like
      ``CASE WHEN src_ts >= ts THEN src_v ELSE v END`` express
      last-writer-wins); only files containing a matched key are rewritten
      (key-semijoin prune).
    - WHEN NOT MATCHED AND ``insert_condition`` (default: all): insert a
      row built from ``insert_values`` (unlisted target columns default to
      the source column of the same name, else NULL).  Inserts APPEND new
      files — no existing file is touched for them.

    Works on flat AND hive-partitioned tables: matched files swap
    per-partition directory, inserts stage ``partitionBy`` the partition
    columns and land in their ``key=value`` dirs (created as needed);
    assigning a partition column in ``matched_set`` is refused — that is
    a cross-directory move (delete + insert), not an update.

    ``check_unique`` guards the classic silent-corruption mode: a source
    with duplicate keys would multiply matched target rows.  The guard is
    one aggregation over the (small) source; Delta raises the same error.

    ``max_pruned_files`` bounds the one driver-side metadata transfer the
    prune makes: the matched-file NAME list (what Delta keeps in its log —
    names, never rows).  A merge whose keys touch more files than the
    bound skips the per-file prune and rewrites the whole table instead —
    at that match breadth the prune saves little and its list would cost
    driver memory.  The limit+fallback means at most ``max_pruned_files+1``
    names ever cross the driver.

    ``evolve_schema=True`` lets the source evolve the table: new nullable
    columns land in insert/rewritten files (older files NULL-backfill —
    read via :func:`read_table`), safe type widenings rewrite the table,
    anything else is refused loudly.  See :func:`_merge_prepare`.
    """
    retain = _default_retain(spark, path, retain)
    st = _merge_prepare(
        spark, path, source, on, matched_set, insert_values, check_unique,
        matched_delete, insert_condition, max_pruned_files, evolve_schema,
    )
    _merge_commit(spark, path, st, retain)
    return MutationStats(
        len(st.files), len(st.hit), st.rows_matched, st.rows_inserted
    )


@_with_writer_lock
def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_ratio: float = 0.5,
    retain: bool | None = None,
    zorder: list[str] | None = None,
    sort_by: list[str] | None = None,
    zorder_bits: int = 12,
) -> MutationStats:
    """Bin-pack small files into ~``target_bytes`` files (OPTIMIZE-style
    compaction, the companion every COW table needs).

    Repeated point DML and streaming appends accrete small files; at scale
    the resulting per-file open/footer overhead dominates scan cost (the
    classic small-file problem).  Compaction here touches ONLY files below
    ``small_ratio * target_bytes`` — already-right-sized files are never
    read or rewritten — and coalesces them WITHOUT a shuffle
    (``coalesce``, not ``repartition``: compaction moves bytes, it has no
    need to redistribute them).  Same stage-then-swap discipline as the
    DML verbs.  Hive-partitioned tables compact per ``key=value``
    directory (compaction is file-local; partition values never move).

    ``zorder=[cols]`` / ``sort_by=[cols]`` turn compaction into OPTIMIZE
    ZORDER BY (Morton-interleaved multi-dimension clustering via
    ``sources.writers.zorder_key``) / a single-dimension range recluster:
    the scope widens to ALL files (clustering is a property of the whole
    table — or of each partition directory, which reclusters
    independently), and the rewrite is ``repartitionByRange + sort`` —
    deliberately a SHUFFLE, because reclustering IS data movement; DML
    accretion destroys clustering and this is the verb that restores the
    footer-skipping layout.  Partition columns cannot be recluster keys
    (their values live in directory names, and each directory already
    clusters them perfectly).

    ``rows_matched`` in the returned stats is the row count that moved.
    """
    retain = _default_retain(spark, path, retain)
    if target_bytes <= 0 or not (0 < small_ratio <= 1):
        raise ValueError("target_bytes must be > 0 and 0 < small_ratio <= 1")
    if zorder and sort_by:
        raise ValueError("zorder and sort_by are mutually exclusive")
    recluster = list(zorder or sort_by or [])
    jvm, fs, jpath = _fs(spark, path)

    def _recluster_df(df: DataFrame, n_out: int) -> DataFrame:
        from ..sources.writers import zorder_key

        bad = [c for c in recluster if c not in df.columns]
        if bad:
            raise ValueError(
                f"recluster columns {bad} not in the data files "
                f"({df.columns}) — partition columns cannot recluster"
            )
        if zorder:
            # zorder_key ranks via a double cast: a string column casts
            # to all-NULL → constant rank 0 → repartitionByRange collapses
            # the whole table into ONE file.  Refuse loudly; range
            # reclustering (sort_by) orders strings natively.
            types = dict(df.dtypes)
            non_num = [
                c
                for c in zorder
                if types[c]
                not in (
                    "tinyint", "smallint", "int", "bigint",
                    "float", "double", "date", "timestamp",
                )
                and not types[c].startswith("decimal")
            ]
            if non_num:
                raise ValueError(
                    f"zorder needs numeric/date/timestamp columns; "
                    f"{[(c, types[c]) for c in non_num]} would rank "
                    "constant and collapse the layout — use sort_by for "
                    "string keys"
                )
            key = zorder_key(df, list(zorder), zorder_bits)
            return df.repartitionByRange(n_out, key).sortWithinPartitions(
                key
            )
        return df.repartitionByRange(
            n_out, *recluster
        ).sortWithinPartitions(*recluster)
    if is_partitioned(spark, path):
        # per-partition bin-pack: compaction is file-local, so each
        # key=value directory compacts independently (the partition value
        # lives in the directory name and never moves); at scale these are
        # parallel jobs per partition
        all_files = list_data_files(spark, path, recursive=True)
        # size filter first (pure metadata): only partitions with >= 2
        # small files reach the staging pool
        todo: list[tuple[str, tuple[list[str], int]]] = []
        for part_dir, pfiles in sorted(_group_by_dir(all_files).items()):
            small_p: list[str] = []
            small_p_bytes = 0
            for f in pfiles:
                sz = fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f)).getLen()
                if recluster or sz < target_bytes * small_ratio:
                    small_p.append(f)
                    small_p_bytes += sz
            if len(small_p) >= (1 if recluster else 2):
                todo.append((part_dir, (small_p, small_p_bytes)))
        if not todo:
            return MutationStats(len(all_files), 0, 0)

        def stage_one(item, created: list[str]):
            part_dir, (small_p, small_p_bytes) = item
            n_out = int(max(1, -(-small_p_bytes // target_bytes)))
            df = spark.read.parquet(*small_p)
            moved = df.count()
            out = (
                _recluster_df(df, n_out) if recluster else df.coalesce(n_out)
            )
            return (
                part_dir,
                small_p,
                _stage(spark, path, out, created),
                moved,
            )

        # same stage-all-then-swap discipline as the DML verbs (and the
        # same pooled staging-jobs + fs-metadata phases)
        results = _run_partition_stages(spark, path, todo, stage_one)
        _swap_staged(
            spark, path, [(d, p, s) for d, p, s, _ in results], retain
        )
        spark.catalog.clearCache()
        return MutationStats(
            len(all_files),
            sum(len(p) for _, p, _, _ in results),
            sum(m for _, _, _, m in results),
        )
    all_files = list_data_files(spark, path)
    small: list[str] = []
    small_bytes = 0
    for f in all_files:
        sz = fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f)).getLen()
        if recluster or sz < target_bytes * small_ratio:
            small.append(f)
            small_bytes += sz
    files_total = len(all_files)
    if len(small) < (1 if recluster else 2):
        return MutationStats(files_total, 0, 0)
    n_out = int(max(1, -(-small_bytes // target_bytes)))
    df = spark.read.parquet(*small)
    moved = df.count()
    out = _recluster_df(df, n_out) if recluster else df.coalesce(n_out)
    _swap_in(spark, path, small, out, retain=retain)
    return MutationStats(files_total, len(small), moved)


def _read_small_file(spark: SparkSession, path: str) -> bytes:
    jvm, fs, jpath = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _write_small_file(
    spark: SparkSession, path: str, data: bytes, overwrite: bool = True
) -> None:
    jvm, fs, jpath = _fs(spark, path)
    stream = fs.create(jpath, overwrite)
    try:
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()
    except BaseException:
        # a partial manifest would WEDGE the version log: every later
        # _autoversion back-walk json-decodes it, and the exclusive
        # create would misread the leftover as a concurrent commit.
        # The create succeeded, so the failed write's debris is ours to
        # remove — the caller's retry then starts clean.
        with contextlib.suppress(Exception):
            fs.delete(jpath, False)
        raise


def _rel_to_table(path: str, file_uri: str) -> str:
    """Manifest entries are table-relative so the table stays movable.

    Compare the PATH COMPONENTS of both URIs (scheme/authority stripped),
    not a basename marker: a marker search breaks the moment the table's
    directory name repeats earlier in the path (``/data/sales/sales``),
    and ``file:///x`` vs ``file:/x`` vs bare ``/x`` must all agree.
    """
    from urllib.parse import urlparse

    table_p = urlparse(path).path.rstrip("/")
    file_p = urlparse(file_uri).path
    if not file_p.startswith(table_p + "/"):
        raise ValueError(f"{file_uri} is not under table {path}")
    return file_p[len(table_p) + 1:]



# -- crash recovery -----------------------------------------------------------


@dataclass(frozen=True)
class RepairReport:
    """What :func:`repair_table` found (and, with ``remove=True``, cleaned)."""

    staging_dirs: tuple[str, ...]
    stale_lock: str | None
    removed: bool

    def render(self) -> str:
        lines = []
        if self.staging_dirs:
            lines.append(
                f"{len(self.staging_dirs)} orphaned staging dir(s): "
                + ", ".join(self.staging_dirs)
            )
        if self.stale_lock:
            lines.append(f"writer lock present: {self.stale_lock}")
        if not lines:
            return "clean: no staging dirs, no lock"
        lines.append("removed" if self.removed else "report only (remove=False)")
        return "\n".join(lines)


def repair_table(
    spark: SparkSession,
    path: str,
    remove: bool = False,
    min_age_seconds: float = 0.0,
) -> RepairReport:
    """Post-crash inventory of COW debris: sibling ``<table>__cow_*``
    staging directories and the advisory ``_cow.lock``.

    What the debris means depends on WHERE the writer died, and this tool
    cannot tell: a death before the swap began leaves a staging dir whose
    data was never moved (the table is consistent; removing the dir just
    reclaims space), but a death MID-swap — after some renames of
    ``_move_in``/``_move_in_partitioned``, before the originals were
    deleted — can leave duplicate rows (old + new files coexisting) or a
    partially-applied insert, and removing the staging remnant then
    makes the partial state permanent.  Before ``remove=True``, verify
    the table (row counts vs expectation, or ``read_version`` against
    the last committed manifest on a version-enabled table, which pins
    the pre-crash file list exactly) and re-run or repair the mutation
    first.

    ``remove=True`` deletes both kinds of debris.  ONLY run removal after
    confirming no writer is alive — a healthy in-flight mutation
    legitimately owns a staging dir and the lock; this tool cannot tell a
    crash from a slow writer, which is exactly why removal is not
    automatic.  "No writer is alive" is NOT implied by the lock being
    absent: OPTIMISTIC writers (``occ_update_where`` / ``occ_delete_where``)
    stage their ``__cow_*`` dirs while holding NO lock by design, so an
    unlocked table can still have a live writer mid-stage.  Pass
    ``min_age_seconds`` (e.g. a few hours) to treat only staging dirs whose
    modification time is older than the threshold as crash debris — a live
    optimistic writer's staging is always younger than its attempt.
    """
    jvm, fs, jpath = _fs(spark, path)
    parent = jpath.getParent()
    base = jpath.getName()
    cutoff_ms = (time.time() - min_age_seconds) * 1000.0
    staging = []
    for st in fs.listStatus(parent):
        n = st.getPath().getName()
        if (
            st.isDirectory()
            and n.startswith(base + "__cow_")
            and st.getModificationTime() <= cutoff_ms
        ):
            staging.append(st.getPath().toString())
    lock = jvm.org.apache.hadoop.fs.Path(jpath, LOCK_FILE)
    stale = lock.toString() if fs.exists(lock) else None
    if remove:
        for s in staging:
            fs.delete(jvm.org.apache.hadoop.fs.Path(s), True)
        if stale:
            fs.delete(lock, False)
    return RepairReport(tuple(sorted(staging)), stale, remove)


# -- submodule re-exports (r12 split) -----------------------------------------
#
# The OCC commit loop, the textual DML front-end, snapshots/versioning,
# and CHECK constraints moved to sibling modules (occ.py, dml_sql.py,
# versioning.py, constraints.py) purely for module size.  Every name they
# define stays importable from THIS module (the historical surface) via
# PEP 562 lazy attribute access, which also keeps the import graph
# acyclic: the submodules import mutate's helpers eagerly, mutate never
# imports a submodule at module scope.
_SUBMODULE_EXPORTS = {
    'CHECKPOINT_INTERVAL': 'versioning',
    'CONSTRAINTS_FILE': 'constraints',
    'ConcurrentWriteConflict': 'occ',
    'ConstraintViolation': 'constraints',
    '_ALTER_RE': 'dml_sql',
    '_DELETE_RE': 'dml_sql',
    '_EXPAND_CHUNK': 'versioning',
    '_MERGE_RE': 'dml_sql',
    '_NET_COL': 'versioning',
    '_SIGN_COL': 'versioning',
    '_UPDATE_RE': 'dml_sql',
    '_VERSION_RE': 'versioning',
    '_WHEN_HEAD_RE': 'dml_sql',
    '_alias_rewrite': 'dml_sql',
    '_autoversion': 'versioning',
    '_compose_next_manifest': 'versioning',
    '_constraints_doc': 'constraints',
    '_create_snapshot_unlocked': 'versioning',
    '_enforce_constraints': 'constraints',
    '_find_top_keyword': 'dml_sql',
    '_find_top_where': 'dml_sql',
    '_full_manifest_bytes': 'versioning',
    '_is_missing_file_error': 'occ',
    '_manifest': 'versioning',
    '_manifest_rel_files': 'versioning',
    '_manifest_state': 'versioning',
    '_occ_mutate': 'occ',
    '_occ_mutate_flat': 'occ',
    '_parse_commit_ts': 'versioning',
    '_parse_merge_on': 'dml_sql',
    '_read_pinned_files': 'versioning',
    '_resolve_pinned_files': 'versioning',
    '_segments': 'dml_sql',
    '_split_assignments': 'dml_sql',
    '_split_depth0': 'dml_sql',
    '_split_values': 'dml_sql',
    '_split_when_clauses': 'dml_sql',
    '_uri_path': 'occ',
    '_violation': 'constraints',
    '_write_constraints': 'constraints',
    'add_constraint': 'constraints',
    'create_snapshot': 'versioning',
    'current_version': 'versioning',
    'drop_constraint': 'constraints',
    'drop_snapshot': 'versioning',
    'drop_versions_before': 'versioning',
    'enable_versioning': 'versioning',
    'execute_dml': 'dml_sql',
    'list_snapshots': 'versioning',
    'occ_delete_where': 'occ',
    'occ_merge_into': 'occ',
    'occ_update_where': 'occ',
    'read_as_of': 'versioning',
    'read_changes': 'versioning',
    'read_snapshot': 'versioning',
    'read_version': 'versioning',
    'restore_version': 'versioning',
    'signed_net_expand': 'versioning',
    'table_constraints': 'constraints',
    'table_versions': 'versioning',
    'vacuum': 'versioning',
    'version_history': 'versioning',
}


def __getattr__(name):
    mod = _SUBMODULE_EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f'.{mod}', __package__), name)


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULE_EXPORTS))
