"""Property-based tests (hypothesis) for operator invariants.

The oracle parity suite checks point equality against DuckDB on the
fixtures; these check *algebraic invariants* on adversarial generated
inputs — the properties that must hold at any scale on any data:

- sequence packing tiles shards exactly (offsets in range, bins dense,
  cumsum consistent),
- salted aggregation/join are semantics-preserving vs their direct forms,
- hash-bucket sampling is invariant under repartitioning (the property
  rand()-sampling lacks).

``max_examples`` is small because each example runs Spark jobs; the
generators bias toward the edge cases that matter (empty strings,
single-token docs, duplicate texts, hot keys).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_WORDS = st.lists(
    st.sampled_from(["the", "cat", "sat", "on", "a", "mat", "x", "longword"]),
    min_size=0,
    max_size=30,
)
_DOCS = st.lists(_WORDS, min_size=1, max_size=25)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_pack_sequences_tiles_shards(spark, docs):
    from sql_query_optimizer_cpp_spark.operators.curation import pack_sequences

    ctx, n_shards = 16, 3
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(df, n_shards=n_shards, ctx=ctx).collect()
    assert len(rows) == len(docs)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.bin_offset < ctx
        assert r.shard == r.doc_id % n_shards
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        start = 0
        for r in shard_rows:
            # each doc's bin/offset must equal the running concat position
            assert r.bin_id == start // ctx
            assert r.bin_offset == start % ctx
            start += r.n_tokens


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # hot key space
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct(spark, rows):
    from sql_query_optimizer_cpp_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, ["k", "x"])
    direct = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("total"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count("*").cast("long"), F.sum("n").cast("long")),
                "total": (F.sum("x").cast("long"), F.sum("total").cast("long")),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == direct


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    n_parts=st.integers(min_value=1, max_value=7),
)
@settings(**_SETTINGS)
def test_stratified_sample_partition_invariant(spark, ids, n_parts):
    """The hash-bucket sample must pick the same rows however the input is
    partitioned — the reproducibility contract rand() cannot give."""
    from sql_query_optimizer_cpp_spark.operators.curation import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in ids], ["doc_id", "lang"]
    )
    rates = {"en": 0.5}
    base = {
        r.doc_id
        for r in stratified_sample(df, "lang", rates, 0.9).collect()
    }
    shuffled = {
        r.doc_id
        for r in stratified_sample(
            df.repartition(n_parts), "lang", rates, 0.9
        ).collect()
    }
    assert base == shuffled


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", categories=["L", "N", "P", "Z"]
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_hash64_cross_engine_portable(spark, duck, texts):
    """The seeded md5-prefix hash64 must agree bit-for-bit between Spark
    and DuckDB on arbitrary strings — it is the foundation every
    dedup/sampling/LSH oracle stands on, so probe it directly on
    generated inputs, not just the fixture corpus."""
    from sql_query_optimizer_cpp_spark.functions import hash64, hash64_sql

    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {
        r.s: r.h
        for r in df.select("s", hash64(F.col("s"), seed="pt:").alias("h")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _pt(s VARCHAR)")
    duck.executemany("INSERT INTO _pt VALUES (?)", [(t,) for t in texts])
    want = {
        s: h
        for s, h in duck.sql(
            f"SELECT s, {hash64_sql('s', seed='pt:')} AS h FROM _pt"
        ).fetchall()
    }
    duck.execute("DROP TABLE _pt")
    assert got == want


def test_pround_tie_parity_vs_duckdb(spark, tmp_path):
    """pround must agree bit-for-bit across engines ON TIES — the case
    native round() gets wrong (Spark BigDecimal HALF_UP vs DuckDB's
    scaled double multiply; the sf0.1 stress replay hit a real ...5
    mean).  Values chosen to land exactly on and around .xxxxxx5."""
    import duckdb

    from sql_query_optimizer_cpp_spark.functions import pround, pround_sql
    from pyspark.sql import functions as F

    vals = [
        33374.0610425,  # the real divergent mean from the stress run
        0.0000005,
        1.0000015,
        -2.0000025,
        123.4567895,
        0.1 + 0.2,      # classic non-exact double
    ]
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    p = str(tmp_path / "vals.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(p)

    got = {
        r.i: r.y
        for r in spark.read.parquet(p).select("i", pround("x").alias("y")).collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {pround_sql('x')} AS y FROM read_parquet('{p}/*.parquet')"
        ).fetchall()
    }
    con.close()
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),          # key
            st.one_of(st.none(), st.integers(-50, 50)),      # nullable value
        ),
        min_size=1,
        max_size=60,
    ),
    lo=st.integers(min_value=-10, max_value=40),
    span=st.integers(min_value=0, max_value=30),
    upd=st.integers(min_value=-10, max_value=60),
)
@settings(**_SETTINGS)
def test_cow_dml_equals_algebraic_fold(spark, rows, lo, span, upd):
    """Randomized COW DELETE+UPDATE vs the same mutation folded
    algebraically over the in-memory frame: NULL predicates must keep
    rows on DELETE and skip them on UPDATE, across arbitrary key ranges
    (including empty matches, full-table matches, and all-NULL values)."""
    import tempfile

    from sql_query_optimizer_cpp_spark.operators.mutate import (
        delete_where,
        update_where,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df.repartitionByRange(3, "k").write.parquet(path)
        del_pred = f"v >= {lo} AND v < {lo + span}"
        upd_pred = f"k >= {upd}"
        delete_where(spark, path, del_pred)
        update_where(spark, path, {"v": "coalesce(v, 0) + 1000"}, upd_pred)
        got = {
            (r.id, r.k, r.v) for r in spark.read.parquet(path).collect()
        }
    folded = df.where(
        ~F.coalesce(F.expr(del_pred), F.lit(False))
    ).withColumn(
        "v",
        F.when(
            F.coalesce(F.expr(upd_pred), F.lit(False)),
            F.coalesce(F.col("v"), F.lit(0)) + 1000,
        ).otherwise(F.col("v")),
    )
    want = {(r.id, r.k, r.v) for r in folded.collect()}
    assert got == want


# -- DML text front-end tokenizer (operators/mutate.py, r6 quote-awareness) --
#
# Pure-Python properties, so examples are cheap: the splitter/rewriter must
# treat single-quoted literals as opaque bytes no matter what SQL-looking
# junk (commas, parens, WHERE, alias patterns, '' escapes) they contain.

_LIT_BODY = st.text(
    alphabet=list("abc,() WHERE s.tx=+"), max_size=12
).map(lambda s: s.replace("'", ""))
_LITERAL = st.builds(
    lambda s, esc: "'" + s + ("''" if esc else "") + "'",
    _LIT_BODY,
    st.booleans(),
)
# code atoms carry no depth-0 comma themselves (commas only inside calls)
_CODE = st.sampled_from(
    ["a", "b1", "s.tag", "t.v", "1 + 2", "f(x, y)", "(a + b)", "g('q', 2)"]
)
_FRAG = st.lists(st.one_of(_LITERAL, _CODE), min_size=1, max_size=4).map(
    " ".join
)


@given(frags=st.lists(_FRAG, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_split_depth0_recovers_fragments(frags):
    from sql_query_optimizer_cpp_spark.operators.mutate import _split_depth0

    text = ",".join(frags)
    assert _split_depth0(text) == frags


@given(expr=_FRAG)
@settings(max_examples=100, deadline=None)
def test_segments_roundtrip_and_literal_opacity(expr):
    from sql_query_optimizer_cpp_spark.operators.mutate import (
        _alias_rewrite,
        _segments,
    )

    # lossless segmentation
    assert "".join(seg for seg, _ in _segments(expr)) == expr
    # literals pass through the alias rewrite byte-for-byte
    rewritten = _alias_rewrite(expr, "t", "s")
    lits_in = [seg for seg, q in _segments(expr) if q]
    lits_out = [seg for seg, q in _segments(rewritten) if q]
    assert lits_in == lits_out
    # outside literals, every s.col became src_col and t.col went bare
    for seg, q in _segments(rewritten):
        if not q:
            assert "s.tag" not in seg and "t.v" not in seg


@given(frags=st.lists(_FRAG, min_size=1, max_size=3), where=_FRAG)
@settings(max_examples=100, deadline=None)
def test_find_top_where_ignores_literal_where(frags, where):
    from sql_query_optimizer_cpp_spark.operators.mutate import (
        _find_top_where,
    )

    body = ",".join(frags)
    with_where = f"{body} WHERE {where}"
    idx = _find_top_where(with_where)
    # the first depth-0 unquoted WHERE is the one we appended — unless the
    # body itself contains an unquoted depth-0 WHERE token (the code atoms
    # never do; literals may, but those don't count)
    assert idx == len(body) + 1
    assert with_where[idx : idx + 5].upper() == "WHERE"


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),        # key
            st.floats(min_value=-5, max_value=5, allow_nan=False),
            st.integers(min_value=0, max_value=2),         # partition
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    src=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90),        # overlaps + new keys
            st.floats(min_value=-5, max_value=5, allow_nan=False),
            st.integers(min_value=0, max_value=3),         # incl. NEW partition 3
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@settings(**_SETTINGS)
def test_partitioned_merge_equals_flat_merge(spark, tmp_path_factory, rows, src):
    """MERGE over a hive-partitioned layout must produce exactly the rows
    the flat layout produces for the same data and statement — partition
    routing (per-directory swap, partitionBy insert staging, new
    partition dirs) is storage layout, never semantics."""
    import uuid as _uuid

    from sql_query_optimizer_cpp_spark.operators.mutate import merge_into

    base = tmp_path_factory.mktemp("pmerge") / _uuid.uuid4().hex
    flat, part = str(base / "flat"), str(base / "part")
    df = spark.createDataFrame(rows, "k int, v double, p int")
    df.coalesce(2).write.parquet(flat)
    df.write.partitionBy("p").parquet(part)
    source = spark.createDataFrame(src, "k int, delta double, p int")

    results = []
    for path in (flat, part):
        st_ = merge_into(
            spark,
            path,
            source,
            on=["k"],
            matched_set={"v": "v + src_delta"},
            insert_values={"v": "src_delta"},
        )
        got = {
            (r["k"], round(r["v"], 9), r["p"])
            for r in spark.read.parquet(path).collect()
        }
        results.append((st_.rows_matched, st_.rows_inserted, got))
    assert results[0] == results[1]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),          # key
            st.one_of(st.none(), st.integers(-50, 50)),      # nullable value
        ),
        min_size=1,
        max_size=60,
    ),
    lo=st.integers(min_value=-10, max_value=40),
    span=st.integers(min_value=0, max_value=30),
    upd=st.integers(min_value=-10, max_value=60),
    ratio=st.sampled_from([0.0, 0.5]),
)
@settings(**_SETTINGS)
def test_mor_dml_equals_algebraic_fold(spark, rows, lo, span, upd, ratio):
    """Randomized merge-on-read DELETE+UPDATE (+ a materialize, full or
    ratio-gated) vs the same mutations folded algebraically: the MOR
    verbs must agree with COW semantics exactly — three-valued DELETE,
    NULL-skipping UPDATE, copies never re-tombstoned — across empty
    matches, full-table matches, all-NULL values, and overlapping
    predicates, regardless of how much the materialize folded."""
    import tempfile

    from sql_query_optimizer_cpp_spark.operators.mor import (
        dv_delete_where,
        dv_update_where,
        materialize_deletes,
        read_mor,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df.repartitionByRange(3, "k").write.parquet(path)
        del_pred = f"v >= {lo} AND v < {lo + span}"
        upd_pred = f"k >= {upd}"
        dv_delete_where(spark, path, del_pred)
        dv_update_where(spark, path, {"v": "coalesce(v, 0) + 1000"}, upd_pred)
        materialize_deletes(spark, path, min_dead_ratio=ratio)
        got = {(r.id, r.k, r.v) for r in read_mor(spark, path).collect()}
    folded = df.where(
        ~F.coalesce(F.expr(del_pred), F.lit(False))
    ).withColumn(
        "v",
        F.when(
            F.coalesce(F.expr(upd_pred), F.lit(False)),
            F.coalesce(F.col("v"), F.lit(0)) + 1000,
        ).otherwise(F.col("v")),
    )
    want = {(r.id, r.k, r.v) for r in folded.collect()}
    assert got == want


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        build_bloom_index,
    )

    path = str(tmp_path_factory.mktemp("prop") / "bloomprop")
    (
        spark.range(3000)
        .selectExpr("id AS k", "CAST(hash(id) % 500 AS BIGINT) AS ref")
        .repartitionByRange(6, "k")
        .write.parquet(path)
    )
    build_bloom_index(spark, path, "ref", num_bits=1 << 14)
    return path


@given(
    vals=st.lists(
        st.one_of(st.integers(-600, 600), st.none()),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_bloom_lookup_equals_filter_property(spark, bloom_table, vals):
    """Random IN-lists (hits, misses, NULLs) through the index must equal
    the plain full-scan IN filter — the no-false-negative guarantee under
    arbitrary probes (the index is built once; examples only probe)."""
    from sql_query_optimizer_cpp_spark.operators.fileindex import (
        read_point_lookups,
    )

    base = spark.read.parquet(bloom_table)
    nn = [v for v in vals if v is not None]
    want = (
        sorted(r.k for r in base.where(F.col("ref").isin(nn)).collect())
        if nn
        else []
    )
    got = sorted(
        r.k
        for r in read_point_lookups(spark, bloom_table, "ref", vals).collect()
    )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),          # key
            st.one_of(st.none(), st.integers(-30, 30)),      # nullable value
        ),
        min_size=1,
        max_size=40,
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("delete"), st.integers(-10, 30)),
            st.tuples(st.just("update"), st.integers(-10, 40)),
            st.tuples(st.just("materialize"), st.just(0)),
            st.tuples(st.just("restore"), st.integers(1, 4)),
            st.tuples(st.just("merge"), st.integers(0, 40)),
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_mor_versioned_history_matches_model(spark, rows, ops):
    """Randomized DV history on a VERSIONED table vs a pure-Python model
    (r9 unification): after any interleaving of dv_delete / dv_update /
    dv_merge_into / materialize / restore, every committed version time-travels to the
    model's state for that version, and read_changes between any two
    versions equals the model's set diff — deletion vectors, retired
    batches, net-zero materializes, and restore round-trips included."""
    import tempfile

    from sql_query_optimizer_cpp_spark.operators.mor import (
        dv_delete_where,
        dv_merge_into,
        dv_update_where,
        materialize_deletes,
    )
    from sql_query_optimizer_cpp_spark.operators.mutate import (
        enable_versioning,
        read_changes,
        read_version,
        restore_version,
        table_versions,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "id long, k long, v long",
    )
    base = {(r.id, r.k, r.v) for r in df.collect()}

    def model_delete(state, lo):
        # three-valued: v >= lo deletes; NULL v keeps the row
        return {r for r in state if not (r[2] is not None and r[2] >= lo)}

    def model_update(state, klo):
        out = set()
        for rid, k, v in state:
            if k >= klo:
                out.add((rid, k, (v if v is not None else 0) + 1000))
            else:
                out.add((rid, k, v))
        return out

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df.repartitionByRange(3, "k").write.parquet(path)
        enable_versioning(spark, path)
        states = [base]  # states[i] = expected rows of version i+1
        for op, arg in ops:
            cur = states[-1]
            if op == "delete":
                n = dv_delete_where(spark, path, f"v >= {arg}")
                nxt = model_delete(cur, arg)
                assert n == len(cur) - len(nxt)
                if n:
                    states.append(nxt)
            elif op == "update":
                n = dv_update_where(
                    spark, path, {"v": "coalesce(v, 0) + 1000"},
                    f"k >= {arg}",
                )
                if n:
                    states.append(model_update(cur, arg))
            elif op == "merge":
                # source keys {arg, arg+1}: matched rows bump v by 5000
                # (tombstone + copy, id preserved); an unmatched key
                # inserts one row with a synthetic id
                src = spark.createDataFrame(
                    [(9000 + kk, kk, 0) for kk in (arg, arg + 1)],
                    "id long, k long, v long",
                )
                stx = dv_merge_into(
                    spark, path, src, on=["k"],
                    matched_set={"v": "coalesce(v, 0) + 5000"},
                    insert_values={"id": "src_id", "v": "src_v"},
                )
                if stx.rows_matched or stx.rows_inserted:
                    nxt = set()
                    matched_keys = {r[1] for r in cur}
                    for rid, k, v in cur:
                        if k in (arg, arg + 1):
                            nxt.add((rid, k, (v if v is not None else 0) + 5000))
                        else:
                            nxt.add((rid, k, v))
                    for kk in (arg, arg + 1):
                        if kk not in matched_keys:
                            nxt.add((9000 + kk, kk, 0))
                    states.append(nxt)
            elif op == "materialize":
                materialize_deletes(spark, path)
                # a version commits only when batches/files changed
                if len(table_versions(spark, path)) > len(states):
                    states.append(cur)
            else:  # restore
                target = min(arg, len(states))
                before_n = len(table_versions(spark, path))
                restore_version(spark, path, target)
                # a restore commits iff the FILE set changed — which can
                # happen even when the row state is identical (restoring
                # across a net-zero materialize), so observe the log
                if len(table_versions(spark, path)) > before_n:
                    states.append(states[target - 1])
        vs = table_versions(spark, path)
        assert len(vs) == len(states)
        for v, want in zip(vs, states):
            got = {
                (r.id, r.k, r.v)
                for r in read_version(spark, path, v).collect()
            }
            assert got == want, f"version {v} diverged from the model"
        # CDC between first and last: exactly the model's set diff
        ch = read_changes(spark, path, vs[0], vs[-1])
        ins = {
            (r.id, r.k, r.v)
            for r in ch.where("_change_type = 'insert'").collect()
        }
        dels = {
            (r.id, r.k, r.v)
            for r in ch.where("_change_type = 'delete'").collect()
        }
        assert ins == states[-1] - states[0]
        assert dels == states[0] - states[-1]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(-20, 20),
        ),
        min_size=1,
        max_size=40,
    ),
    muts=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=4),
    keep_last=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_retention_vacuum_preserves_kept_versions(spark, rows, muts, keep_last):
    """(r12) Randomized version-log retention: whatever random DML
    schedule built the log, after ``drop_versions_before(keep_last)`` +
    ``vacuum`` (a) the dropped count is exactly the manifests beyond
    keep_last, (b) every SURVIVING version still reads row-for-row equal
    to the content it pinned when it committed (vacuum never reclaims a
    byte a surviving manifest references — including a checkpointed
    oldest survivor whose delta chain was dropped), and (c) the live
    table equals the newest version.  The graded query
    (mutate_retention_vacuum) pins one fixed schedule; this sweeps
    arbitrary ones, including no-op mutations that commit no version."""
    import tempfile

    from sql_query_optimizer_cpp_spark.operators.mutate import (
        delete_where,
        drop_versions_before,
        enable_versioning,
        read_version,
        table_versions,
        update_where,
        vacuum,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        df.repartitionByRange(3, "k").write.parquet(path)

        def rowset():
            return frozenset(
                (r.id, r.k, r.v) for r in spark.read.parquet(path).collect()
            )

        enable_versioning(spark, path)
        expected = {table_versions(spark, path)[-1]: rowset()}
        for i, m in enumerate(muts):
            if i % 2 == 0:
                # may match zero rows -> commits NO version (tracked
                # dynamically via table_versions, never assumed)
                delete_where(spark, path, f"k % 5 = {m}")
            else:
                update_where(
                    spark, path, {"v": "v + 100"}, f"k >= {m * 8}"
                )
            expected[table_versions(spark, path)[-1]] = rowset()
        vs_before = table_versions(spark, path)
        dropped = drop_versions_before(spark, path, keep_last=keep_last)
        assert dropped == max(0, len(vs_before) - keep_last)
        vacuum(spark, path)
        surviving = table_versions(spark, path)
        assert surviving == vs_before[-keep_last:] or (
            keep_last >= len(vs_before) and surviving == vs_before
        )
        for v in surviving:
            got = frozenset(
                (r.id, r.k, r.v)
                for r in read_version(spark, path, v).collect()
            )
            assert got == expected[v], f"version {v} diverged after vacuum"
        assert rowset() == expected[surviving[-1]]
