"""Structured Streaming surface: event-time windows (windows.py),
stream-stream interval join (joins.py), dedup-on-ingest (dedup.py),
CDC latest-snapshot maintenance (latest.py), incremental rollup
maintenance (rollup.py), vector ingest with exactly-once IVF index
maintenance (ann.py), and stateful running counts via
applyInPandasWithState + the gated transformWithState twin
(stateful.py).  Every operator has a streamed-equals-batch test in
tests/test_streaming.py."""
