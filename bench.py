#!/usr/bin/env python
"""Benchmark harness — runs the headline inventory queries and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": <scale factor>}.

Scale dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); cores
from $SPARK_GRAFT_CPUS (default all).  Each query is timed end-to-end
(plan + execute + collect-to-count) after a warm-up scan so JIT/session
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from sql_query_optimizer_cpp_spark.inventory import all_queries
from sql_query_optimizer_cpp_spark.session import get_session

#: Queries that represent the engine's throughput story: scan-heavy agg,
#: join-heavy agg + top-k, the flagship rewrite pipeline, window analytics,
#: and (added in later milestones) dedup / similarity / event-window ops.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "flagship_demo",
    "agg_having",
    "agg_rollup",
    "join_three_way",
    "join_inner",
    "join_asof",
    "win_topk_per_group",
    "scalar_subquery_agg",
    "text_quality",
    "dedup_minhash_pairs",
    "sim_topk_bruteforce",
    "events_tumbling",
    "events_session",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_session(app_name="bench")
    registry = all_queries()

    # Warm up: JVM classloading + parquet footer caches, not billed below.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        # cold run amortizes codegen/plan compile; measured run is the
        # steady-state number a long-lived engine delivers
        spec.fn(spark, sf_dir).count()
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows, warm)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
