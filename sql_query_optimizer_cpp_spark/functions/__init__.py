"""Curated expression helpers shared across operators and inventory queries.

The reference has no scalar-function library at all (SURVEY.md §2.7) — its
only string predicate is LIKE.  Everything here is therefore either (a) an
extension, or (b) glue needed for deterministic cross-engine comparison.

All helpers are built from `pyspark.sql.functions` (JVM-side, codegen'd);
none drop to Python row processing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: int64 range of the md5-prefix hash below: [0, 16**15) = [0, 2**60).
HASH64_SPACE = 16**15


def hash64(col: Column | str, seed: str = "") -> Column:
    """Deterministic, engine-portable 60-bit hash of a string column.

    Defined as the first 15 hex digits of md5(seed || value), read as an
    integer.  Chosen over ``F.xxhash64`` because DuckDB can reproduce it
    exactly (``('0x' || substr(md5(seed || x), 1, 15))::BIGINT``), which lets
    MinHash / SimHash / fingerprint pipelines carry full SQL oracles.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: str = "") -> str:
    """DuckDB-SQL twin of :func:`hash64` (same bits, same dtype)."""
    inner = f"concat('{seed}', {expr})" if seed else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"


#: Universal-hash family for MinHash permutations: mh_i(x) = (a_i*x + b_i)
#: mod P over x = hash64(shingle) truncated to 30 bits.  One md5 per
#: shingle feeds all k permutations — vs k seeded md5s, hashing cost drops
#: k-fold, which is the dominant CPU in signature computation at corpus
#: scale.  P = 2^31-1 (Mersenne); a < P, x < 2^30 keeps a*x + b < 2^62,
#: overflow-free in int64 on both engines, so the SQL twin is plain BIGINT
#: arithmetic.
MINHASH_P = 2_147_483_647
MINHASH_X_MASK = (1 << 30) - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the permutation family, derived
    from fixed md5 strings (no RNG state; identical in every process and
    round)."""
    import hashlib

    params = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mha{i}".encode()).hexdigest()[:15], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mhb{i}".encode()).hexdigest()[:15], 16) % MINHASH_P
        params.append((a, b))
    return params


def minhash_transform(h: Column, a: int, b: int) -> Column:
    """Permutation i applied to the base shingle hash (JVM-side integer ops)."""
    return (F.lit(a) * (h.bitwiseAND(F.lit(MINHASH_X_MASK))) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_transform_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB twin of :func:`minhash_transform` (same bits, same dtype)."""
    return f"(({a} * ({h_expr} & {MINHASH_X_MASK}) + {b}) % {MINHASH_P})"


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column.

    Summing doubles is order-dependent (different partitionings → different
    low bits), which breaks value-hash comparison against any other engine.
    Casting each value to DECIMAL first makes the aggregation exact, and the
    final cast back to DOUBLE is correctly rounded — both engines emit the
    identical bit pattern.  Per-row double arithmetic *before* the cast is
    IEEE-deterministic and portable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """SQL twin of :func:`dsum`; identical text is valid Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG (exact decimal sum / count, then one division)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale=scale) / F.count(c)


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale=scale)} / COUNT({expr}))"


def pround(col: Column | str, scale: int = 6) -> Column:
    """PORTABLE display rounding: ``floor(x * 10^s + 0.5) / 10^s``.

    Native round() is a latent cross-engine divergence on ties: Spark
    routes doubles through BigDecimal HALF_UP of the exact binary
    expansion while DuckDB scales in double arithmetic — the round-5
    sf0.1 stress replay caught them disagreeing by 1 ulp on a real
    value (events_gap_stats avg, ...042.5 microseconds).  This helper
    spells the same IEEE-exact op chain on both engines (multiply, add,
    floor, divide — each correctly rounded over identical inputs), so
    the result is bit-identical by construction, ties included.

    Caveat: |x|*10^s must stay below 2^53 for the quantization to be
    meaningful — true for every display-rounded metric here.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**scale)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)


def pround_sql(expr: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`pround` (same ops, same bits)."""
    p = float(10**scale)
    return f"(floor(({expr}) * {p!r} + 0.5) / {p!r})"


def values_df(spark, schema: str, rows: list[tuple]):
    """Small driver-side metadata frame as a SQL VALUES LocalRelation.

    ``createDataFrame(list)`` routes through the Python-RDD path: the
    rows become defaultParallelism pickled slices, and any downstream
    ``coalesce(1)`` (or plain collect) evaluates every slice through a
    Python worker round-trip — measured ~6.5 s for one 640-row codebook
    write.  A VALUES relation is JVM-only: same rows, same declared
    schema, ~0.2 s.  ``schema`` is the createDataFrame schema-string
    subset ``"name type, ..."`` with int/bigint/long/double/float/
    string/boolean columns; every cell is CAST to the declared type, so
    the result's schema is identical to the createDataFrame it
    replaces.  Doubles are emitted via repr (exact round-trip — the
    dot_expr discipline); strings are quote-escaped."""
    if not rows:  # VALUES needs >=1 tuple; empty stays a plain empty frame
        return spark.createDataFrame([], schema)
    cols = []
    for part in schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        cols.append((name.strip(), typ.strip().lower()))

    def _lit(x, typ: str) -> str:
        if x is None:
            return f"CAST(NULL AS {typ})"
        if typ in ("double", "float"):
            f = float(x)
            # repr(inf)/repr(nan) are bare identifiers — invalid inside
            # CAST.  Spark parses the string forms ('Infinity', 'NaN')
            # to the exact IEEE values, preserving createDataFrame
            # parity for non-finite cells (ADVICE r14).
            if f != f:
                return f"CAST('NaN' AS {typ})"
            if f == float("inf"):
                return f"CAST('Infinity' AS {typ})"
            if f == float("-inf"):
                return f"CAST('-Infinity' AS {typ})"
            return f"CAST({f!r} AS {typ})"
        if typ in ("int", "integer", "bigint", "long"):
            return f"CAST({int(x)} AS {'bigint' if typ == 'long' else typ})"
        if typ == "string":
            s = str(x).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        if typ == "boolean":
            return "true" if x else "false"
        raise TypeError(f"values_df: unsupported column type {typ!r}")

    tuples = ", ".join(
        "(" + ", ".join(_lit(x, t) for x, (_, t) in zip(row, cols)) + ")"
        for row in rows
    )
    names = ", ".join(n for n, _ in cols)
    return spark.sql(f"SELECT * FROM VALUES {tuples} AS t({names})")
