"""Portable column expressions — identical results in Spark and DuckDB.

The correctness harness hash-compares Spark output against a DuckDB
oracle, so every computed value must be bit-identical across engines.
Three tools make that possible:

- exact decimal arithmetic for money aggregates (sum/avg over
  DECIMAL(18,2) is exact in both engines; the final cast to double is
  a single identical IEEE op),
- ``round(x, 6)`` + cast to double for O(1)-magnitude floats,
- a *portable 60-bit hash*: ``bigint(hex(md5(x)[:15]))`` computes the
  same value in Spark (``conv``) and DuckDB (``'0x…'::BIGINT``), which
  makes MinHash / SimHash / fingerprint operators cross-engine
  checkable — unlike xxhash64/murmur which differ per engine.

All helpers come in pairs: a pyspark Column builder and a SQL-string
builder for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------- rounding / casting ----------

def duck_round(v: float, digits: int = 6) -> float:
    """Driver-side rounding with DuckDB ROUND semantics (half away from
    zero on the binary double: std::round(v*10^d)/10^d). Python's
    round() and np.round are half-to-even — a value landing exactly on
    a .5e-6 tie would hash-mismatch the oracle. Use this for any
    driver-computed value that a DuckDB oracle ROUNDs."""
    import math

    p = 10.0 ** digits
    x = v * p
    return math.copysign(math.floor(abs(x) + 0.5), x) / p


def r6(c: Column | str) -> Column:
    """Round to 6 dp and cast to double (hash-stable for O(1) floats)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c.cast("double"), 6).cast("double")


def dec2(c: Column | str) -> Column:
    """Cast to DECIMAL(18,2) for exact money aggregation."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(18,2)")


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum, surfaced as double. The sum is exact in both
    engines; the PORTABILITY hazard is the final decimal->double cast:
    DuckDB's direct cast double-rounds (hugeint -> double, then /10^s),
    so once |sum| exceeds ~2^53/10^scale the two roundings can straddle
    a ULP and the 6dp-formatted values differ (first seen at the sf1
    scale probe on q1's sum_charge: ...098007 vs ...098011). Spark's
    BigDecimal.doubleValue() is correctly rounded; sql_dsum therefore
    routes the oracle's cast through VARCHAR, whose strtod parse is
    also correctly rounded — both engines then produce the bit-same
    nearest double at ANY magnitude."""
    return F.sum(dec2(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact-decimal average: sum(dec)/count, one IEEE division."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec2(c)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    # CAST(... AS VARCHAR) first: DuckDB's direct DECIMAL->DOUBLE cast
    # is not correctly rounded (see dsum); the string round-trip is.
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------- portable 60-bit hash ----------

def hash60(c: Column | str, seed: int | None = None) -> Column:
    """60-bit integer hash of a string column, identical in DuckDB.

    Spark: conv(substr(md5(x), 1, 15), 16, 10)::bigint
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT  (see sql_hash60)
    """
    c = F.col(c) if isinstance(c, str) else c
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str, seed: int | None = None) -> str:
    if seed is not None:
        expr = f"('{seed}|' || {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
