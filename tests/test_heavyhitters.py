"""Exact heavy hitters (operators/heavyhitters.py): equality with plain
GROUP BY/HAVING, pigeonhole no-false-negatives across partitionings,
NULL-group semantics, and the zero-shuffle phase-1 plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_query_optimizer_cpp_spark.operators.heavyhitters import heavy_hitters


def _skewed(spark, parts):
    # key k appears k times for k in 1..60 (1830 rows): thresholds cut
    # mid-distribution, and every partitioning must agree
    rows = spark.range(1, 61).selectExpr(
        "explode(sequence(1, id)) AS dummy", "id AS k"
    )
    return rows.select("k", (F.col("k") % 3).alias("g")).repartition(parts)


@pytest.mark.parametrize("parts", [1, 4, 13])
def test_heavy_hitters_equals_group_by_having(spark, parts):
    df = _skewed(spark, parts)
    for t in (1, 17, 45, 61):
        got = sorted(
            (r["k"], r["n"]) for r in heavy_hitters(df, ["k"], t).collect()
        )
        expect = sorted(
            (r["k"], r["n"])
            for r in df.groupBy("k")
            .agg(F.count("*").cast("long").alias("n"))
            .where(F.col("n") >= t)
            .collect()
        )
        assert got == expect, f"parts={parts} t={t}"
        assert got == [(k, k) for k in range(max(t, 1), 61)]


def test_heavy_hitters_multi_key_and_null_group(spark):
    df = (
        spark.range(400)
        .selectExpr(
            "CASE WHEN id % 4 = 0 THEN NULL ELSE CONCAT('u', id % 3) END AS u",
            "id % 2 AS b",
        )
        .repartition(5)
    )
    got = {
        (r["u"], r["b"]): r["n"]
        for r in heavy_hitters(df, ["u", "b"], 50).collect()
    }
    expect = {
        (r["u"], r["b"]): r["n"]
        for r in df.groupBy("u", "b")
        .agg(F.count("*").cast("long").alias("n"))
        .where("count(1) >= 0")
        .collect()
        if r["n"] >= 50
    }
    assert got == expect
    assert (None, 0) in got  # the NULL group survives the semi join


def test_heavy_hitters_phase1_no_shuffle(spark):
    """The candidate pass must be mapInPandas directly over the scan — no
    Exchange below it; the only shuffles serve the final exact count."""
    df = _skewed(spark, 4)
    plan = heavy_hitters(df, ["k"], 30)._jdf.queryExecution().executedPlan()
    txt = plan.toString()
    # find the MapInPandas operator and assert nothing below it shuffles
    lines = txt.split("\n")
    map_idx = [i for i, l in enumerate(lines) if "MapInPandas" in l]
    assert map_idx, txt
    below = "\n".join(lines[map_idx[0]:])
    # below the candidate pass: only the repartition the fixture asked
    # for (round-robin on the INPUT), never a hash shuffle of key counts
    assert "hashpartitioning(k" not in below
    # and the candidate side reaches the join as a broadcast
    assert "BroadcastHashJoin" in txt and "LeftSemi" in txt


def test_heavy_hitters_validates(spark):
    df = _skewed(spark, 2)
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(df, ["k"], 0)
