"""Order-insensitive result comparison between Spark and the DuckDB oracle.

Mirrors the driver's t2 check (row-count + schema-shape + value equality,
order-insensitive).  Stricter than the driver on values: floats must match
to 1e-9 relative — the inventory queries are built so aggregates are
bit-identical (DECIMAL trick), so any drift is a real portability bug.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def _rows_table(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return cols_sorted, out


def _cells_equal(a, b) -> bool:
    # Exact equality, even for floats: the inventory queries are built so
    # float results are bit-identical across engines (DECIMAL aggregation,
    # rounded similarity outputs).  Any drift is a portability bug that the
    # driver's value-hash would also flag — surface it here first.
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        # int-vs-float is a TYPE mismatch (e.g. Spark floor()->bigint vs
        # DuckDB floor()->double): the driver's value-hash would flag it,
        # so fail here even when the numeric values agree
        if isinstance(a, float) != isinstance(b, float):
            return False
        return a == b or (
            isinstance(a, float) and math.isnan(a) and math.isnan(b)
        )
    return a == b


def assert_same_result(spark_df, duck_rel, name: str = "?") -> None:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [c.lower() for c in duck_rel.columns]
    d_rows = [tuple(r) for r in duck_rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column sets differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )

    sc, st = _rows_table(s_cols, s_rows)
    dc, dt = _rows_table(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(st, dt)):
        for col, sv, dv in zip(sc, sr, dr):
            assert _cells_equal(sv, dv), (
                f"{name}: value mismatch at sorted-row {i} col {col}: "
                f"spark={sv!r} duck={dv!r}\nspark row: {sr}\nduck row: {dr}"
            )
