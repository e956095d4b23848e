"""Multi-statement transactions over the copy-on-write version log.

No reference analog — the reference parses single DML statements and
stops (``engine/src/parser.cpp:232-296``); this is the Delta-style
"one commit for a batch of verbs" shape the version log was built for:
every mutating verb in :mod:`.mutate` / :mod:`.mor` already stages its
change and then commits ONE manifest inside the writer lock, so a
transaction is exactly that choke point held open across verbs.

How it works (all metadata, no new data paths):

1. ``begin(spark, path)`` takes the table's physical writer lock and
   registers the transaction (``mutate._ACTIVE_TXNS``).  From here the
   lock is RE-ENTRANT for this thread only: every existing verb —
   ``update_where``, ``delete_where``, ``merge_into``, ``compact``, the
   ``dv_*`` merge-on-read verbs, ``execute_dml`` text statements — runs
   unmodified inside the transaction, while any other thread or process
   still hits the lock file and refuses (single-writer, as ever).
2. Each verb stages + swaps as normal but its version commit and bloom
   refresh are DEFERRED (``mutate._autoversion`` / ``_refresh_indexes``
   consult the registry).  Intermediate states are visible to bare-path
   readers — the same contract those readers always had on an
   in-progress verb — while version readers (``read_version`` /
   ``sql_at`` / CDC) see only committed manifests: the MVCC story is
   unchanged, the transaction just makes several verbs one commit.
3. ``commit()`` pops the registry entry and writes ONE version manifest
   for the whole batch (the live-state delta against the previous
   version IS the composed diff), runs one bloom refresh and one stats
   staleness bump, then releases the lock.  CDC over that version emits
   the NET change of the batch.
4. ``rollback()`` restores the live file set to the last committed
   manifest: files the batch retired move back from ``_retired/``
   (rename, the :func:`~.mutate.restore_version` plan), files the batch
   created are deleted — they are provably unpinned, since no manifest
   was written after their (globally unique) names came into existence.

Crash contract: a transaction that dies before commit/rollback leaves
the lock file and an uncommitted live state.  Nothing is lost (retire
moves, never deletes) and no version was committed, so version readers
never saw the partial batch; :func:`recover_table` re-runs the rollback
plan and removes the stale lock once the operator confirms the writer
is dead (``force=True``).

At 100 TB this is the same cost model as the verbs themselves: the
transaction adds zero data I/O — one deferred manifest write, one
rename/delete plan O(files the batch touched).
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import SparkSession

from .mutate import (
    LOCK_FILE,
    _ACTIVE_TXNS,
    _TxnState,
    _acquire_writer_lock,
    _autoversion,
    _delete_files,
    _fs,
    _manifest_state,
    _mark_mutated,
    _refresh_indexes,
    _rel_to_table,
    _release_writer_lock,
    _resolve_pinned_files,
    _txn_key,
    list_data_files,
    table_versions,
)

__all__ = ["Transaction", "begin", "recover_table"]


def _rollback_to_committed(spark: SparkSession, path: str) -> int:
    """Make the live file set (data + deletion-vector batches) equal the
    last committed manifest again; returns files that changed liveness.
    Restores retired files FIRST (crash mid-rollback ⇒ superset, never
    loss), then DELETES the uncommitted extras."""
    from .mor import list_dv_files

    vs = table_versions(spark, path)
    root = path.rstrip("/")
    target_files, target_dv = _manifest_state(spark, path, f"v{vs[-1]:08d}")
    target_rel = set(target_files) | set(target_dv)
    target_abs = [f"{root}/{r}" for r in target_files + target_dv]
    current = list_data_files(spark, path, recursive=True) + list(
        list_dv_files(spark, path)
    )
    current_rel = {_rel_to_table(path, f) for f in current}
    missing_abs = [
        f for f in target_abs if _rel_to_table(path, f) not in current_rel
    ]
    extras = [
        f for f in current if _rel_to_table(path, f) not in target_rel
    ]
    if missing_abs:
        resolved = _resolve_pinned_files(
            spark, path, missing_abs, "transaction rollback"
        )
        jvm, fs, _ = _fs(spark, path)
        for orig, now_at in zip(missing_abs, resolved):
            rel = _rel_to_table(path, orig)
            dest = jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}")
            fs.mkdirs(dest.getParent())
            if not fs.rename(jvm.org.apache.hadoop.fs.Path(now_at), dest):
                raise IOError(
                    f"rollback: rename {now_at} -> {dest} failed"
                )
    if extras:
        # created after the last commit, so no manifest pins them (COW
        # staging never reuses names): plain reclaim, not retire
        _delete_files(spark, extras)
    if missing_abs or extras:
        spark.catalog.clearCache()
    return len(missing_abs) + len(extras)


class Transaction:
    """A batch of DML verbs committing as ONE version (use via
    :func:`begin`, usually as a context manager)::

        with begin(spark, path) as txn:
            update_where(spark, path, {"v": "v + 1"}, "k < 10")
            delete_where(spark, path, "k = 99")
            merge_into(spark, path, src, on=["k"], ...)
        # clean exit -> txn.commit(): one manifest, CDC = the net diff
        # exception  -> txn.rollback(): table byte-identical to before

    Requires versioning (:func:`~.mutate.enable_versioning`): the last
    committed manifest is both the commit baseline and the rollback
    anchor.  Single-writer: the transaction holds the table's writer
    lock for its whole span, so it should stay short-lived — it is a
    batching construct, not a long-lived session.  Optimistic (``occ_*``)
    verbs and maintenance verbs (vacuum / restore / drop_versions) are
    refused inside a transaction.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._key = _txn_key(path)
        self._state: _TxnState | None = None
        if not table_versions(spark, path):
            raise ValueError(
                f"transactions require versioning on {path}; call "
                "enable_versioning first (the committed manifest is the "
                "rollback anchor)"
            )
        if self._key in _ACTIVE_TXNS:
            raise RuntimeError(
                f"a transaction is already open on {path} in this process"
            )
        _acquire_writer_lock(spark, path)
        self._state = _TxnState(
            path=path, owner=threading.get_ident()
        )
        _ACTIVE_TXNS[self._key] = self._state

    # -- introspection ----------------------------------------------------
    @property
    def active(self) -> bool:
        return self._state is not None

    @property
    def verbs_executed(self) -> int:
        return self._state.verbs if self._state else 0

    def _close(self) -> "_TxnState":
        st = self._state
        if st is None:
            raise RuntimeError(
                "transaction already committed or rolled back"
            )
        # pop BEFORE the commit/rollback work: _autoversion and
        # _refresh_indexes must see no active txn when called back
        _ACTIVE_TXNS.pop(self._key, None)
        self._state = None
        return st

    def _reopen(self, st: "_TxnState") -> None:
        """Commit/rollback work failed BEFORE reaching a resolved state:
        restore the handle (registry entry + state) and keep the writer
        lock, so the batch is still protected and the caller — or the
        context manager's exception path — can rollback() or retry.
        Discarding the handle here would leave the half-applied batch
        unlocked, and the next writer's commit would silently fold it
        into its own version."""
        _ACTIVE_TXNS[self._key] = st
        self._state = st

    def commit(self) -> int | None:
        """Write ONE version manifest for the whole batch (plus one bloom
        refresh and one stats-staleness bump) and release the lock.
        Returns the committed version number, or None if no verb changed
        anything (a no-op batch commits no version — idempotent).  If the
        manifest write itself fails, the transaction STAYS OPEN (lock
        held, handle valid) — rollback() or retry."""
        st = self._close()
        if st.dirty:
            try:
                _autoversion(self.spark, self.path)
            except BaseException:
                self._reopen(st)
                raise
        # the version (if any) is committed from here on: maintenance
        # hooks degrade-with-warning by design, and the lock must release
        try:
            if st.dirty:
                _refresh_indexes(self.spark, self.path)
                _mark_mutated(self.spark, self.path)
                self.spark.catalog.clearCache()
                return table_versions(self.spark, self.path)[-1]
            return None
        finally:
            _release_writer_lock(self.spark, self.path)

    def rollback(self) -> int:
        """Undo every verb of the batch: live state returns to the last
        committed manifest, uncommitted files are reclaimed.  Returns how
        many files changed liveness.  If the restore plan fails midway,
        the transaction STAYS OPEN (lock held, handle valid) — the plan
        is rerunnable (restore-first ordering), so retry rollback()."""
        st = self._close()
        changed = 0
        if st.dirty:
            try:
                changed = _rollback_to_committed(self.spark, self.path)
            except BaseException:
                self._reopen(st)
                raise
        _release_writer_lock(self.spark, self.path)
        return changed

    # -- context manager: commit on clean exit, rollback on exception -----
    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._state is None:
            return  # already resolved explicitly
        if exc_type is None:
            self.commit()
        else:
            self.rollback()


def begin(spark: SparkSession, path: str) -> Transaction:
    """Open a multi-statement transaction on a versioned table."""
    return Transaction(spark, path)


def recover_table(
    spark: SparkSession, path: str, force: bool = False
) -> int:
    """Crash recovery: roll an abandoned transaction back to the last
    committed manifest and remove the stale writer lock.  Refuses unless
    ``force=True`` — only the operator can know the lock holder is truly
    dead (a live holder's work would be yanked out from under it).
    Returns how many files changed liveness."""
    if _txn_key(path) in _ACTIVE_TXNS:
        raise RuntimeError(
            f"a transaction on {path} is still open in THIS process — "
            "commit() or rollback() it instead"
        )
    jvm, fs, table_path = _fs(spark, path)
    lock = jvm.org.apache.hadoop.fs.Path(table_path, LOCK_FILE)
    lock_held = fs.exists(lock)
    if lock_held and not force:
        raise RuntimeError(
            f"writer lock {lock} exists: pass force=True only after "
            "confirming the writer that held it is dead"
        )
    if not table_versions(spark, path):
        raise ValueError(
            f"versioning not enabled on {path}; recover_table can only "
            "roll back to a committed manifest"
        )
    changed = _rollback_to_committed(spark, path)
    if lock_held:
        with contextlib.suppress(Exception):
            fs.delete(lock, False)
    return changed
