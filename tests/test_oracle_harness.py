"""Local replica of the driver's correctness gate.

For every registered query: run the Spark callable and the DuckDB oracle SQL
on the same sf directory, canonicalize (columns sorted by name, floats
rounded to 6 d.p., rows order-insensitive) and compare row count + column
names + values — mirroring CORRECTNESS_r{N}.json semantics so mismatches
surface locally before the driver runs at sf0.01.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import pytest

from cargo_chat_spark.queries import catalog
from tests.conftest import SF_DIR_SMALL


def _cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if hasattr(v, "tolist"):  # numpy scalars/arrays
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep the float/int distinction: the driver hashes pandas frames,
        # where DuckDB HUGEINT->float64 vs Spark int64 is a value mismatch
        # (round 1: uncast SUM() oracles). round() preserves float type.
        return ("f", round(v, 6))
    if isinstance(v, datetime):
        # the driver's canonicalizer routes results through pandas, whose
        # ns-resolution timestamps cap at 2262-04-11 — an out-of-bounds
        # datetime (e.g. a 9999-12-31 SCD2 sentinel) errors THERE even
        # though both engines agree on the values (CORRECTNESS_r07:
        # user_value_scd2 OutOfBoundsDatetime). Surface it locally, same
        # as the list-cell tripwire below.
        if v.year > 2261:
            raise TypeError(
                f"timestamp {v.isoformat()} exceeds pandas' ns-timestamp "
                "range (max 2262-04-11): the driver canonicalizer will "
                "raise OutOfBoundsDatetime — serialize the column to a "
                "string (same fixed format) in BOTH engines"
            )
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        # the driver's canonicalizer (pandas sort_values) dies on list
        # cells — surface that locally instead of silently tuple-izing
        raise TypeError(
            f"non-hashable output cell {type(v).__name__}: the driver "
            "contract requires scalar columns (serialize arrays, e.g. "
            "array_join(...,'|'), in BOTH engines)"
        )
    return v


def canonicalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = sorted(
        (tuple(_cell(r[i]) for i in order) for r in rows), key=repr
    )
    return cols, canon


def test_out_of_bounds_timestamp_tripwire():
    """A driver-only failure class made local: pandas ns timestamps cap at
    2262-04-11, so a 9999-12-31 sentinel passes both engines yet errors in
    the driver's canonicalizer (CORRECTNESS_r07 user_value_scd2)."""
    with pytest.raises(TypeError, match="OutOfBoundsDatetime"):
        _cell(datetime(9999, 12, 31))
    with pytest.raises(TypeError, match="2262-04-11"):
        _cell(datetime(2263, 1, 1))
    # in-range timestamps still canonicalize (the guard is conservative:
    # it cuts at year 2261 because 2262 is only partially representable)
    assert _cell(datetime(2261, 12, 31)) == "2261-12-31T00:00:00"


@pytest.mark.parametrize("name", sorted(catalog.SPARK_QUERIES))
def test_query_matches_oracle(name, spark, duck_small):
    sdf = catalog.SPARK_QUERIES[name](spark, SF_DIR_SMALL)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in catalog.ORACLE_SQL:
        # rows-only check, same as the driver's weak mode
        assert len(s_rows) >= 0
        return

    res = duck_small.execute(catalog.ORACLE_SQL[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = canonicalize(s_cols, s_rows)
    dc, dr = canonicalize(d_cols, d_rows)

    assert sc == dc, f"{name}: column names differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"{name}: row counts differ: {len(sr)} vs {len(dr)}"
    mism = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={sr[mism[0]]} duckdb={dr[mism[0]]}"
    )
