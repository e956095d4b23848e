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
