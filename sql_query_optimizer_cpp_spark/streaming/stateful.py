"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-stateful path the built-in windows can't
express: a running per-user event counter with cumulative value, state
carried across micro-batches.  (The reference engine has no streaming or
state at all — SURVEY.md §2.8 — this is pure extension surface.)
"""

from __future__ import annotations

import importlib.util
import warnings
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in state across batches.

    Arrow-batched: each micro-batch group arrives as pandas DataFrames, so
    the Python cost is per-group-per-batch, not per-row.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningCountsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of :func:`running_user_counts` —
    the Spark 4 arbitrary-state API (SPARK-46815): typed state handles
    (ValueState here; ListState/MapState/timers available) replace the
    single state tuple, and the runtime owns encoding/expiry.  Same
    output contract as the applyInPandasWithState version so the test
    asserts both APIs converge to the batch aggregate.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("counts", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        prev = self._count.get() if self._count.exists() else None
        n, total = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._count.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas``.

    Functionally identical to :func:`running_user_counts`; exists because
    the two stateful APIs have different evolution paths (TWS adds typed
    composite state, timers, TTL, and initial-state bootstrap) and a
    pipeline migrating between them needs the equivalence demonstrated.

    transformWithState only runs on the RocksDB state store (the default
    HDFS-backed provider has no state server for it and the query dies at
    first micro-batch), so the provider is pinned here — session-global,
    and equally valid for every other streaming query in the session.

    Environment note: the TWS state-server wire protocol is protobuf-based;
    this container has no ``google.protobuf`` and nothing may be installed,
    so the query builds but the stream crashes at the first micro-batch
    (``ImportError ... google.protobuf`` from the driver worker).  The
    equivalence test skips with that exact reason when protobuf is absent
    and runs fully anywhere protobuf exists — the same honest-gating
    pattern as the image-codec stub in operators/multimodal.py.
    """
    # probe the ACTUAL dependency, not the bare 'google' namespace: any
    # other installed google-namespace package (google-auth, ...) would
    # make a find_spec('google') probe pass while the TWS stream still
    # dies at the first micro-batch
    try:
        _has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        _has_protobuf = False
    if not _has_protobuf:
        warnings.warn(
            "transformWithStateInPandas needs google.protobuf (absent in "
            "this environment); the returned stream will fail at its first "
            "micro-batch",
            RuntimeWarning,
            stacklevel=2,
        )
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningCountsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
