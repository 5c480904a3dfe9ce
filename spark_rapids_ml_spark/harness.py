"""Local replica of the driver's DuckDB-oracle correctness check.

For each declared query: run the Spark DataFrame and the oracle SQL
on the same parquet tables, then compare row count, column names, and
an order-insensitive value comparison (sorted by all columns). Used
by pytest so every operator is validated the same way the driver
validates it (CORRECTNESS_r{N}.json).

Two compare modes:

* ``pandas`` — the original driver-replica: collect BOTH results to
  the driver, normalize (sorted column names, floats at 6dp,
  stringified), sort rows, compare cell-by-cell. Exact and great for
  diagnostics, but the collect is O(result) driver memory/time — a
  9.5M-row result at sf10 takes tens of minutes to hash.
* ``digest`` — distributed: each engine reduces its own result to ONE
  row — ``(count, sum(h1), sum(h2))`` where h1/h2 are two independent
  60-bit integers taken from md5 of a canonical per-row string — so
  only O(1) crosses to the driver on either side. The canonical string
  keeps the same conventions as the pandas mode (sorted column names,
  order-insensitive multiset compare via the commutative sum) but
  avoids cross-engine printf: floats canonicalize through
  ``floor(x*scale + 0.5)`` magnitude tiers — IEEE multiply/add/floor
  are correctly rounded and bit-identical in the JVM and DuckDB,
  unlike ``%.6f`` which rounds on the exact binary value in Java but
  on the shortest decimal repr in DuckDB's fmt (observed: 5e-07
  formats to 0.000001 vs 0.000000).

  Float tolerance is TIERED, not uniformly 6dp (ADVICE r12): the S
  tier (|x| < 8e12) compares at absolute granularity 1e-6 — same as
  pandas mode's %.6f — but the M/L/H tiers (|x| >= 8e12) compare at
  absolute granularity 1e6 / 1e18 / 1e294 respectively, i.e. a
  RELATIVE tolerance of <= 1.25e-7 of the tier's lower bound (~7
  significant digits). pandas mode's %.6f is effectively ULP-exact at
  those magnitudes, so digest mode is strictly LOOSER there; in auto
  mode a digest PASS is terminal, so a large-magnitude discrepancy
  below the tier granularity passes silently. This is a deliberate
  trade (cross-engine float aggregates at revenue scale differ by
  summation order well past 6 absolute decimals); use
  ``tools/digest_audit.py`` to sample-audit digest PASSes with the
  pandas compare on queries whose results carry |float| >= 8e12.

  String cells are escaped before joining (ESC=0x1b: ESC->ESC+E,
  0x1f->ESC+S, 0x02->ESC+T) so a cell containing the column
  separator or the null sentinel cannot shift column boundaries or
  alias NULL (ADVICE r12). A false PASS then needs a 2^-120 md5-sum
  collision; mode-equivalence vs the pandas compare is pinned over the
  full catalog by tools/pin_compare_modes.py.
* ``auto`` (default) — run digest; on digest PASS, done. On digest
  mismatch with a small result (<= SPARK_GRAFT_COMPARE_FALLBACK_ROWS,
  default 200k), re-run the pandas compare as the authoritative
  verdict with row-level diagnostics.

Select with SPARK_GRAFT_COMPARE_MODE=auto|digest|pandas or the
``mode=`` kwarg.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from spark_rapids_ml_spark.registry import QuerySpec
from spark_rapids_ml_spark.sources.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # Bound the oracle's memory so a heavy compare at large SF spills to
    # disk instead of tripping the machine OOM killer next to the Spark
    # JVM (observed at sf10: two concurrent sweeps OOM-killed the box).
    # The default is RAM-aware — min(40GB, 50% of physical memory) — so
    # on a small box it LOWERS DuckDB's own 80%-of-RAM default instead
    # of raising it. Overridable; no effect on results, only on spill.
    try:
        half_ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (2 * 1024**3)
        )
    except (ValueError, OSError, AttributeError):
        half_ram_gb = 40
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM", f"{max(1, min(40, half_ram_gb))}GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # Cap spill too: an unbounded spill at sf10 filled the root fs and
    # killed the sweep mid-catalog. Better one failed compare than a
    # wedged machine; the cap errors the offending oracle query only.
    tmp_cap = os.environ.get("SPARK_GRAFT_DUCKDB_TMP", "40GB")
    con.execute(f"SET max_temp_directory_size='{tmp_cap}'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values; stringify floats at 6dp."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].map(lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v)) else f"{v:.6f}")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


# ---------------------------------------------------------------------------
# Digest mode: O(1)-to-driver distributed compare.
# Canonical per-row string -> md5 -> two 60-bit terms -> commutative sum.
# Float canon uses magnitude tiers so the scaled value always fits a
# 64-bit integer; tier arithmetic is *, /, abs, floor, comparisons —
# all exact or correctly-rounded IEEE ops, hence bit-identical across
# the JVM and DuckDB (no printf, no log, no decimal parsing).
# ---------------------------------------------------------------------------

_SEP = "\x1f"
_NULL = "\x02N"  # per-column null sentinel (pre-coalesce, can't collide)
_ESC = "\x1b"  # escape char for string cells; see module docstring

# |x| tier bounds; scaled |value| stays < 8e18 < 2^63 in every tier.
_TIERS = (("S", 8e12, 1e6, "*"), ("M", 8e18, 1e6, "/"), ("L", 8e30, 1e18, "/"),
          ("H", float("inf"), 1e294, "/"))


def _classify_spark(dt: T.DataType) -> str:
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "float"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.StringType):
        return "str"
    return "other"


def _classify_duck(typ: str) -> str:
    base = typ.split("(")[0].upper()
    if base in ("DOUBLE", "FLOAT", "REAL", "DECIMAL"):
        return "float"
    if base in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
                "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        return "int"
    if base == "VARCHAR":
        return "str"
    return "other"


def _escape_spark(c):
    """Injective escape so no encoded cell contains _SEP or _NULL's 0x02.

    Order matters: escape the escape char first. Applied to str (and
    stringified fallback) cells only — int/float canon emits [-0-9a-z]
    and can't collide.
    """
    c = F.replace(c, F.lit(_ESC), F.lit(_ESC + "E"))
    c = F.replace(c, F.lit(_SEP), F.lit(_ESC + "S"))
    return F.replace(c, F.lit("\x02"), F.lit(_ESC + "T"))


def _escape_duck(expr: str) -> str:
    """DuckDB twin of _escape_spark (same order, same codes)."""
    e = f"chr({ord(_ESC)})"
    expr = f"replace({expr}, {e}, {e} || 'E')"
    expr = f"replace({expr}, chr({ord(_SEP)}), {e} || 'S')"
    return f"replace({expr}, chr(2), {e} || 'T')"


def _canon_spark(name: str, cls: str):
    c = F.col(name)
    if cls == "float":
        x = c.cast("double")
        expr = (
            F.when(F.isnan(x), F.lit("nan"))
            .when(x == float("inf"), F.lit("inf"))
            .when(x == float("-inf"), F.lit("-inf"))
        )
        for tag, bound, scale, op in _TIERS:
            scaled = x * scale if op == "*" else x / scale
            # Spark floor(double) returns BIGINT directly.
            term = F.concat(F.lit(tag), F.floor(scaled + F.lit(0.5)).cast("string"))
            expr = expr.when(F.abs(x) < bound, term) if bound != float("inf") else (
                expr.otherwise(term)
            )
        return F.coalesce(F.when(c.isNull(), F.lit(None)).otherwise(expr), F.lit(_NULL))
    if cls == "str":
        return F.coalesce(_escape_spark(c), F.lit(_NULL))
    if cls == "int":
        # exact decimal string via cast; digits can't collide with
        # the separator/sentinel so no escaping needed.
        return F.coalesce(c.cast("string"), F.lit(_NULL))
    # other (bool/date/struct/...): stringify then escape — a nested
    # string value could carry the separator byte.
    return F.coalesce(_escape_spark(c.cast("string")), F.lit(_NULL))


def _canon_duck(name: str, cls: str) -> str:
    q = '"' + name.replace('"', '""') + '"'
    if cls == "float":
        x = f"CAST({q} AS DOUBLE)"
        branches = [
            f"WHEN isnan({x}) THEN 'nan'",
            f"WHEN {x} = 'infinity'::DOUBLE THEN 'inf'",
            f"WHEN {x} = '-infinity'::DOUBLE THEN '-inf'",
        ]
        for tag, bound, scale, op in _TIERS:
            scaled = f"{x} {'*' if op == '*' else '/'} {scale!r}"
            term = f"'{tag}' || CAST(CAST(floor(({scaled}) + 0.5) AS BIGINT) AS VARCHAR)"
            if bound == float("inf"):
                branches.append(f"ELSE {term}")
            else:
                branches.append(f"WHEN abs({x}) < {bound!r} THEN {term}")
        case = "CASE " + " ".join(branches) + " END"
        return f"coalesce(CASE WHEN {q} IS NULL THEN NULL ELSE {case} END, '{_NULL}')"
    if cls == "str":
        return f"coalesce({_escape_duck(q)}, '{_NULL}')"
    if cls == "int":
        return f"coalesce(CAST({q} AS VARCHAR), '{_NULL}')"
    return f"coalesce({_escape_duck(f'CAST({q} AS VARCHAR)')}, '{_NULL}')"


def _digest_spark(sdf: DataFrame) -> tuple[int, int | None, int | None]:
    cols = sorted(sdf.columns)
    classes = {f.name: _classify_spark(f.dataType) for f in sdf.schema.fields}
    row = F.concat_ws(_SEP, *[_canon_spark(c, classes[c]) for c in cols])
    m = F.md5(row)
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(m, 17, 15), 16, 10).cast("decimal(38,0)")
    n, s1, s2 = sdf.select(
        F.count(F.lit(1)), F.sum(h1), F.sum(h2)
    ).first()
    return int(n), None if s1 is None else int(s1), None if s2 is None else int(s2)


def _digest_duck(
    con: duckdb.DuckDBPyConnection, oracle_sql: str
) -> tuple[int, int | None, int | None, list[str]]:
    desc = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    classes = {d[0]: _classify_duck(d[1]) for d in desc}
    cols = sorted(classes)
    canon = ", ".join(_canon_duck(c, classes[c]) for c in cols)
    chr_sep = f"chr({ord(_SEP)})"
    q = f"""
    WITH __r AS (SELECT md5(concat_ws({chr_sep}, {canon})) AS m
                 FROM ({oracle_sql}))
    SELECT count(*),
           sum(CAST(CAST('0x' || substr(m, 1, 15) AS UBIGINT) AS HUGEINT)),
           sum(CAST(CAST('0x' || substr(m, 17, 15) AS UBIGINT) AS HUGEINT))
    FROM __r
    """
    n, s1, s2 = con.execute(q).fetchone()
    return int(n), None if s1 is None else int(s1), None if s2 is None else int(s2), cols


def _compare_digest(
    spark: SparkSession, spec: QuerySpec, sf_dir: str
) -> tuple[bool, dict[str, Any]]:
    from spark_rapids_ml_spark.operators.dedup import release_caches

    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        release_caches()
        return n >= 0, {"rows": n, "oracle": "none", "mode": "digest"}
    sn, sh1, sh2 = _digest_spark(sdf)
    release_caches()
    con = duckdb_connect(sf_dir)
    try:
        on, oh1, oh2, ocols = _digest_duck(con, spec.oracle)
    finally:
        con.close()
    details: dict[str, Any] = {"spark_rows": sn, "oracle_rows": on, "mode": "digest"}
    if sn != on:
        return False, {**details, "why": "row count"}
    scols = sorted(sdf.columns)
    if scols != ocols:
        return False, {**details, "why": "columns", "spark_cols": scols,
                       "oracle_cols": ocols}
    if (sh1, sh2) != (oh1, oh2):
        return False, {**details, "why": "values",
                       "spark_digest": [sh1, sh2], "oracle_digest": [oh1, oh2]}
    return True, details


def compare(
    spark: SparkSession, spec: QuerySpec, sf_dir: str, mode: str | None = None
) -> tuple[bool, dict[str, Any]]:
    """Run spark query vs oracle; return (match, details).

    mode: "pandas" (driver-replica row compare), "digest" (O(1)-to-
    driver distributed hash compare), or "auto" (digest, with a pandas
    re-check on mismatch for small results). Default from
    SPARK_GRAFT_COMPARE_MODE, else "auto".
    """
    mode = mode or os.environ.get("SPARK_GRAFT_COMPARE_MODE", "auto")
    if mode not in ("pandas", "digest", "auto"):
        raise ValueError(f"unknown compare mode {mode!r}")
    if mode in ("digest", "auto"):
        ok, details = _compare_digest(spark, spec, sf_dir)
        if ok or mode == "digest":
            return ok, details
        try:
            fallback_rows = int(
                os.environ.get("SPARK_GRAFT_COMPARE_FALLBACK_ROWS", "200000")
            )
        except ValueError:  # malformed env value: use the default (ADVICE r12)
            fallback_rows = 200000
        if max(details.get("spark_rows", 0), details.get("oracle_rows", 0)) > fallback_rows:
            return ok, details
        # Small result: the pandas compare is authoritative and gives
        # row-level diagnostics (and absorbs any canon edge the digest
        # convention treats more strictly).
        ok2, d2 = _compare_pandas(spark, spec, sf_dir)
        return ok2, {**d2, "digest_details": details}
    return _compare_pandas(spark, spec, sf_dir)


def _compare_pandas(
    spark: SparkSession, spec: QuerySpec, sf_dir: str
) -> tuple[bool, dict[str, Any]]:
    """Driver-replica compare: collect both results, normalize, diff."""
    from spark_rapids_ml_spark.operators.dedup import release_caches

    sdf = spec.fn(spark, sf_dir).toPandas()
    release_caches()  # free any executor blocks the query pinned
    if spec.oracle is None:
        return len(sdf) >= 0, {"rows": len(sdf), "oracle": "none"}
    con = duckdb_connect(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()  # release spill files promptly between compares
    details: dict[str, Any] = {"spark_rows": len(sdf), "oracle_rows": len(odf)}
    if len(sdf) != len(odf):
        return False, {**details, "why": "row count"}
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, {
            **details,
            "why": "columns",
            "spark_cols": sorted(sdf.columns),
            "oracle_cols": sorted(odf.columns),
        }
    a, b = _normalize(sdf), _normalize(odf)
    eq = a.equals(b)
    if not eq:
        neq = (a != b).any(axis=1)
        details["why"] = "values"
        details["first_diff"] = {
            "spark": a[neq].head(3).to_dict("records"),
            "oracle": b[neq].head(3).to_dict("records"),
        }
    return eq, details
