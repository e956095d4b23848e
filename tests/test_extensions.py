"""JVM Catalyst rule injection (SURVEY §7.2 step 5).

The jar must be on the driver classpath at JVM launch, so the load is
verified in a subprocess with a fresh SparkSession — the shared test
session cannot pick up spark.sql.extensions after the fact.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

from .conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from jvmext.build import build
    from pyspark.sql import SparkSession

    jar = build()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("ext-probe")
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "sqloptspark.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # any optimized query exercises the injected rule
    assert spark.range(100).filter("id > 5").count() == 94
    jvm = spark.sparkContext._jvm.sqloptspark.GraftMarkerRule
    applied = jvm.applied()

    # the rule's real rewrite: x = x on a nullable parquet column becomes
    # IsNotNull(x) — Catalyst alone leaves the self-comparison in the plan
    # (SimplifyBinaryComparison needs non-nullable; InferFilters only ADDS
    # an isnotnull beside it) and IsNotNull pushes to the scan
    df = spark.read.parquet(
        {lineitem!r}
    ).where("l_orderkey = l_orderkey")
    assert df.count() == 6000
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "= l_orderkey" not in opt, "self-equality survived: " + opt
    assert "isnotnull(l_orderkey" in opt
    assert "PushedFilters: [IsNotNull(l_orderkey)]" in phys
    # r6 regression: the NULL->FALSE rewrite is only sound on the And/Or
    # spine — under NOT, `NOT (x = x)` is never TRUE (FALSE or NULL), so
    # the correct answer is 0 rows; the pre-fix rule returned null-x rows
    neg = spark.createDataFrame([(1, "a"), (2, None)], "id int, x string")
    neg.createOrReplaceTempView("neg")
    assert spark.sql("SELECT * FROM neg WHERE NOT (x = x)").count() == 0
    # ...while the spine position still rewrites: x=x keeps non-null rows
    assert spark.sql("SELECT * FROM neg WHERE x = x").count() == 1

    rewritten = jvm.rewritten()
    spark.stop()
    print("APPLIED", applied)
    print("REWRITTEN", rewritten)
    assert applied > 0, "injected rule never ran inside the optimizer"
    assert rewritten > 0, "self-equality rewrite never fired"
    """
)


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK compiler")
def test_jvm_rule_injected_and_fires():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            PROBE.format(
                repo=REPO,
                lineitem=os.path.join(SF_DIR, "lineitem.parquet"),
            ),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    applied = [l for l in proc.stdout.splitlines() if l.startswith("APPLIED")]
    assert applied and int(applied[0].split()[1]) > 0


def test_builder_produces_jar():
    if shutil.which("javac") is None:
        pytest.skip("no JDK compiler")
    from jvmext.build import build

    jar = build()
    assert os.path.exists(jar) and jar.endswith("graft-ext.jar")


PREFIX_PROBE = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from jvmext.build import build
    from pyspark.sql import SparkSession

    jar = build()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("ext-probe-prefix")
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "sqloptspark.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    part = {part!r}

    # the rewrite: substring(x,1,n) = 'lit' (len(lit)==n) -> StartsWith,
    # which parquet pushes as StringStartsWith; Catalyst alone leaves the
    # per-row Substring equality and pushes nothing
    df = spark.read.parquet(part).where("substring(p_brand, 1, 7) = 'Brand#1'")
    want = spark.read.parquet(part).where("p_brand LIKE 'Brand#1%'").count()
    got = df.count()
    assert got == want and got > 0, (got, want)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "startswith" in opt.lower(), opt
    assert "substring" not in opt.lower(), opt
    assert "StringStartsWith(p_brand,Brand#1)" in phys, phys

    # NOT rewritten when the literal is shorter than n (that form pins the
    # total length of x, not a prefix)
    df2 = spark.read.parquet(part).where("substring(p_brand, 1, 9) = 'Brand#1'")
    opt2 = df2._jdf.queryExecution().optimizedPlan().toString()
    assert "substring" in opt2.lower(), opt2
    # semantics check for the guarded form: only rows whose WHOLE value is
    # 'Brand#1' (length <= 9) qualify
    assert df2.count() == spark.read.parquet(part).where("p_brand = 'Brand#1'").count()

    jvm = spark.sparkContext._jvm.sqloptspark.PrefixEqualityRule
    rewritten = jvm.rewritten()
    spark.stop()
    print("REWRITTEN", rewritten)
    assert rewritten > 0, "prefix rewrite never fired"
    """
)


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK compiler")
def test_jvm_prefix_rule_rewrites_and_pushes():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            PREFIX_PROBE.format(
                repo=REPO,
                part=os.path.join(SF_DIR, "part.parquet"),
            ),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rewritten = [l for l in proc.stdout.splitlines() if l.startswith("REWRITTEN")]
    assert rewritten and int(rewritten[0].split()[1]) > 0


COALESCE_PROBE = textwrap.dedent(
    """
    import sys, tempfile
    sys.path.insert(0, {repo!r})
    from jvmext.build import build
    from pyspark.sql import SparkSession

    jar = build()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("ext-probe-coalesce")
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "sqloptspark.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    d = tempfile.mkdtemp() + "/t"
    spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "cd")], "id int, x string"
    ).write.parquet(d)
    spark.read.parquet(d).createOrReplaceTempView("t")

    # the rewrite: coalesce(x, L1) = L2 with L1 != L2 -> x = L2, which the
    # parquet scan pushes (Catalyst alone evaluates the coalesce per row
    # and pushes nothing)
    df = spark.sql("SELECT * FROM t WHERE coalesce(x, 'zz') = 'ab'")
    assert df.count() == 1
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "coalesce" not in opt.lower(), opt
    assert "EqualTo(x,ab)" in phys, phys

    # guard 1: same default literal means `x = L OR x IS NULL` — left alone
    df2 = spark.sql("SELECT * FROM t WHERE coalesce(x, 'ab') = 'ab'")
    assert df2.count() == 2  # the null row qualifies via the default
    assert "coalesce" in df2._jdf.queryExecution().optimizedPlan().toString().lower()

    # guard 2: not offered under NOT (NULL and FALSE diverge there) — the
    # null row must be KEPT: NOT(coalesce(NULL,'zz')='ab') = NOT FALSE
    df3 = spark.sql("SELECT * FROM t WHERE NOT (coalesce(x, 'zz') = 'ab')")
    assert df3.count() == 2, df3.count()

    jvm = spark.sparkContext._jvm.sqloptspark.CoalesceLiteralEqualityRule
    rewritten = jvm.rewritten()
    spark.stop()
    print("REWRITTEN", rewritten)
    assert rewritten > 0, "coalesce rewrite never fired"
    """
)


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK compiler")
def test_jvm_coalesce_rule_rewrites_guards_and_pushes():
    proc = subprocess.run(
        [sys.executable, "-c", COALESCE_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rewritten = [l for l in proc.stdout.splitlines() if l.startswith("REWRITTEN")]
    assert rewritten and int(rewritten[0].split()[1]) > 0


EMPTYLEN_PROBE = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from jvmext.build import build
    from pyspark.sql import SparkSession

    jar = build()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("emptylen-probe")
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "sqloptspark.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (4, "bb")], "id int, x string"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t")
    df.write.parquet(p)
    t = spark.read.parquet(p)

    # length(x) = 0 -> x = '' : rows exact, length gone, EqualTo pushed
    eq = t.where("length(x) = 0")
    assert sorted(r.id for r in eq.collect()) == [2]
    opt = eq._jdf.queryExecution().optimizedPlan().toString()
    phys = eq._jdf.queryExecution().executedPlan().toString()
    assert "length" not in opt, opt
    assert "EqualTo(x,)" in phys, phys  # pushed empty-string equality

    # flipped and inequality spellings all rewrite, NULL-faithfully
    for pred, want in (
        ("0 = length(x)", [2]),
        ("length(x) > 0", [1, 4]),
        ("0 < length(x)", [1, 4]),
        ("length(x) >= 1", [1, 4]),
        ("NOT (length(x) = 0)", [1, 4]),  # sound under NOT: NULL stays out
    ):
        q = t.where(pred)
        assert sorted(r.id for r in q.collect()) == want, pred
        assert "length" not in q._jdf.queryExecution().optimizedPlan().toString(), pred

    # guarded: BINARY length is a byte count, never rewritten to a
    # string comparison
    b = spark.createDataFrame([(1, bytearray(b""))], "id int, bx binary")
    bq = b.where("length(bx) = 0")
    assert [r.id for r in bq.collect()] == [1]
    assert "length" in bq._jdf.queryExecution().optimizedPlan().toString()
    # guarded: a non-zero comparison is not an emptiness test
    nz = t.where("length(x) = 2")
    assert sorted(r.id for r in nz.collect()) == [4]
    assert "length" in nz._jdf.queryExecution().optimizedPlan().toString()

    # guarded: collated strings are StringType too, but under a
    # trailing-space-insensitive collation x = '' is TRUE for '  '
    # while length(x) = 0 is FALSE — the rule must not fire there
    c = spark.createDataFrame(
        [(1, "  "), (2, ""), (3, "a")], "id int, raw string"
    ).selectExpr("id", "raw COLLATE UTF8_BINARY_RTRIM AS xc")
    cq = c.where("length(xc) = 0")
    assert sorted(r.id for r in cq.collect()) == [2], "collated semantics"
    assert "length" in cq._jdf.queryExecution().optimizedPlan().toString()

    jvm = spark.sparkContext._jvm.sqloptspark.EmptyStringLengthRule
    assert jvm.applied() > 0
    print("REWRITTEN", jvm.rewritten())
    spark.stop()
    """
)


def test_jvm_empty_length_rule_rewrites_guards_and_pushes():
    proc = subprocess.run(
        [sys.executable, "-c", EMPTYLEN_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rewritten = [l for l in proc.stdout.splitlines() if l.startswith("REWRITTEN")]
    assert rewritten and int(rewritten[0].split()[1]) > 0
