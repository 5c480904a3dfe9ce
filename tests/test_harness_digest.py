"""Digest compare mode — unit pins for the canonicalization contract.

The distributed compare reduces each engine's result to (count, two
60-bit md5 sums) over a canonical row string. These tests pin the
cross-engine contract directly on constructed edge cases — NaN, ±inf,
NULL, negative zero, exact 6dp ties, tier-boundary magnitudes, empty
results — plus the detection side: a genuinely differing multiset must
produce a differing digest (including same-count swaps that a naive
per-column sum would miss).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from spark_rapids_ml_spark.harness import _digest_duck, _digest_spark


def _duck_digest_of(pdf: pd.DataFrame):
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        return _digest_duck(con, "SELECT * FROM t")
    finally:
        con.close()


def _duck_digest_sql(sql: str):
    """Digest of a raw DuckDB query — needed when the fixture must
    carry NaN (a registered pandas float column turns NaN into NULL,
    which is a registration artifact, not an oracle behavior)."""
    con = duckdb.connect()
    try:
        return _digest_duck(con, sql)
    finally:
        con.close()


def _duck_lit(v) -> str:
    if v is None:
        return "CAST(NULL AS DOUBLE)"
    if isinstance(v, float) and math.isnan(v):
        return "'nan'::DOUBLE"
    if v == float("inf"):
        return "'infinity'::DOUBLE"
    if v == float("-inf"):
        return "'-infinity'::DOUBLE"
    return f"CAST({v!r} AS DOUBLE)"


def _both(spark, rows, spark_schema, pdf):
    sdf = spark.createDataFrame(rows, spark_schema)
    sn, s1, s2 = _digest_spark(sdf)
    on, o1, o2, _cols = _duck_digest_of(pdf)
    return (sn, s1, s2), (on, o1, o2)


EDGE_DOUBLES = [
    0.0, -0.0, float("nan"), float("inf"), float("-inf"), None,
    5e-07, -5e-07, 2.5e-06, 1/3, 0.1 + 0.2,
    8e12 - 1.0, 8e12, 8e12 + 2.0,           # S/M tier boundary
    8e18 / 1.001, 8e18, 1e20,               # M/L tier boundary
    9e30, 1e300, -1e300,                    # H tier
    123456.1234565, -123456.1234565,
]


def test_digest_agrees_on_edge_doubles(spark):
    rows = [(i, v) for i, v in enumerate(EDGE_DOUBLES)]
    a = _digest_spark(spark.createDataFrame(rows, "id bigint, x double"))
    values = ", ".join(
        f"(CAST({i} AS BIGINT), {_duck_lit(v)})" for i, v in rows
    )
    on, o1, o2, _ = _duck_digest_sql(f"SELECT * FROM (VALUES {values}) t(id, x)")
    assert a == (on, o1, o2), (a, (on, o1, o2))


def test_digest_agrees_on_strings_ints_nulls(spark):
    rows = [
        (1, "plain", 42),
        (2, "", 0),
        (3, None, None),
        (4, "unicode ✓ émoji 🚀", -7),
        (5, "embedded\x1fseparator\x02and\nnewline", 2**62),
    ]
    pdf = pd.DataFrame(
        {"id": [r[0] for r in rows], "s": [r[1] for r in rows],
         "n": pd.array([r[2] for r in rows], dtype="Int64")}
    )
    a, b = _both(spark, rows, "id bigint, s string, n bigint", pdf)
    assert a == b, (a, b)


def test_digest_order_insensitive_and_empty(spark):
    rows = [(1, 2.5), (2, -3.5), (3, 0.000001)]
    pdf = pd.DataFrame({"id": [3, 1, 2], "x": [0.000001, 2.5, -3.5]})
    a, b = _both(spark, rows, "id bigint, x double", pdf)
    assert a == b
    e1, e2 = _both(spark, [], "id bigint, x double",
                   pd.DataFrame({"id": pd.array([], dtype="Int64"),
                                 "x": pd.array([], dtype="float64")}))
    assert e1 == e2 == (0, None, None)


def test_digest_detects_value_and_swap_differences(spark):
    base = [(1, 10.0, "a"), (2, 20.0, "b")]
    sdf_digest = _digest_spark(spark.createDataFrame(base, "id bigint, x double, s string"))
    # single-cell difference beyond 6dp tolerance
    d1, *_ = [_duck_digest_of(pd.DataFrame(
        {"id": [1, 2], "x": [10.000002, 20.0], "s": ["a", "b"]}))]
    assert (d1[0], d1[1], d1[2]) != sdf_digest
    # same counts, same per-column multisets, swapped pairing — a
    # per-column digest would pass this; the per-ROW hash must not
    d2 = _duck_digest_of(pd.DataFrame(
        {"id": [1, 2], "x": [20.0, 10.0], "s": ["a", "b"]}))
    assert (d2[0], d2[1], d2[2]) != sdf_digest
    # within 6dp tolerance -> EQUAL by design
    d3 = _duck_digest_of(pd.DataFrame(
        {"id": [1, 2], "x": [10.0000001, 20.0], "s": ["a", "b"]}))
    assert (d3[0], d3[1], d3[2]) == sdf_digest


def test_digest_decimal_and_float32_coerce_to_double(spark):
    """DECIMAL (either engine) and float32 (Spark) canonicalize through
    DOUBLE, so a Spark float/decimal column digests equal to a DuckDB
    double column carrying the same values."""
    from decimal import Decimal

    rows = [(1, Decimal("1.50"), 2.5), (2, Decimal("-0.25"), float("nan"))]
    sdf = spark.createDataFrame(rows, "id bigint, d decimal(12,2), f float")
    a = _digest_spark(sdf)
    on, o1, o2, _ = _duck_digest_sql(
        "SELECT * FROM (VALUES "
        "(CAST(1 AS BIGINT), CAST(1.50 AS DECIMAL(12,2)), CAST(2.5 AS DOUBLE)), "
        "(CAST(2 AS BIGINT), CAST(-0.25 AS DECIMAL(12,2)), 'nan'::DOUBLE)"
        ") t(id, d, f)"
    )
    assert a == (on, o1, o2)


def test_digest_nan_vs_null_distinct(spark):
    """NaN and NULL must canonicalize differently (the pandas-mode
    convention distinguishes them too)."""
    a = _digest_spark(spark.createDataFrame([(1, float("nan"))], "id bigint, x double"))
    b = _digest_spark(spark.createDataFrame([(1, None)], "id bigint, x double"))
    assert a != b


def test_digest_separator_injection_distinct(spark):
    """ADVICE r12: string cells carrying the 0x1f separator or the
    0x02N sentinel must NOT canonicalize equal to a different row
    shape. Pre-escape, ("a\\x1fb","c") and ("a","b\\x1fc") joined to
    the same canonical string (column-boundary shift), and a literal
    "\\x02N" cell aliased NULL."""
    shift_a = _digest_spark(
        spark.createDataFrame([("a\x1fb", "c")], "s1 string, s2 string")
    )
    shift_b = _digest_spark(
        spark.createDataFrame([("a", "b\x1fc")], "s1 string, s2 string")
    )
    assert shift_a != shift_b
    sentinel = _digest_spark(spark.createDataFrame([("\x02N",)], "s string"))
    null = _digest_spark(spark.createDataFrame([(None,)], "s string"))
    assert sentinel != null
    # escape-char injectivity: a literal ESC+"S" cell must differ from
    # a separator cell (requires escaping ESC itself first)
    esc_lit = _digest_spark(spark.createDataFrame([("\x1bS",)], "s string"))
    sep_lit = _digest_spark(spark.createDataFrame([("\x1f",)], "s string"))
    assert esc_lit != sep_lit


def test_digest_escaping_cross_engine(spark):
    """Escaped cells still digest identically across engines."""
    rows = [(1, "a\x1fb"), (2, "\x02N"), (3, "\x1bS"), (4, "x\x1b\x1fy\x02z")]
    pdf = pd.DataFrame({"id": [r[0] for r in rows], "s": [r[1] for r in rows]})
    a, b = _both(spark, rows, "id bigint, s string", pdf)
    assert a == b, (a, b)


def test_compare_fallback_rows_env_malformed(spark, monkeypatch):
    """ADVICE r12: a malformed SPARK_GRAFT_COMPARE_FALLBACK_ROWS must
    fall back to the default instead of raising mid-sweep."""
    from spark_rapids_ml_spark.harness import compare
    from spark_rapids_ml_spark.registry import QuerySpec

    monkeypatch.setenv("SPARK_GRAFT_COMPARE_FALLBACK_ROWS", "not-a-number")
    spec = QuerySpec(
        name="__mismatch__",
        fn=lambda s, _sf: s.createDataFrame([(1,)], "id bigint"),
        oracle="SELECT CAST(2 AS BIGINT) AS id",
    )
    ok, details = compare(spark, spec, "/root/testdata/sf0.001", mode="auto")
    assert not ok  # genuine mismatch surfaced, no crash
    assert "digest_details" in details  # pandas fallback actually ran
