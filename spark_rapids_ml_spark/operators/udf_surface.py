"""The full Arrow UDF surface as declared queries.

The engine's UDF tiers (all Arrow-batched; never row-at-a-time Python):

- scalar ``pandas_udf``          — PCA transform (ml/pca.py)
- ``mapInPandas``                — PCA partials, multimodal decode
- grouped-map ``applyInPandas``  — per-group z-score (here)
- grouped-agg ``pandas_udf``     — weighted average (here)
- ``applyInPandasWithState``     — streaming stateful (streaming/)

The two queries here have *full SQL oracles*: the numpy code inside the
UDF is formulated so every float op is the identical IEEE computation
DuckDB performs (decimal-exact sums, single divisions), keeping
value-hash parity even through Python.

Scale notes: applyInPandas shuffles on the group key and needs each
group to fit in one worker's memory — fine for per-language/segment
groups, wrong for skewed billion-row groups (pre-aggregate or use the
salted pattern in aggregates_salted instead).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "udf_grouped_map_zscore",
    tags=("udf",),
    oracle="""
WITH s AS (
  SELECT lang, COUNT(*) AS n,
         CAST(SUM(n_chars) AS DOUBLE) AS s1,
         CAST(SUM(n_chars * n_chars) AS DOUBLE) AS s2
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
       ROUND((d.n_chars - s.s1 / s.n)
             / SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6) AS zscore
FROM documents d JOIN s ON d.lang = s.lang
ORDER BY d.doc_id
""",
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via applyInPandas.

    Each language group arrives as one pandas DataFrame; the UDF uses
    integer sums (exact in float64) so mean/std match the SQL oracle
    bit-for-bit. Rounded because SQRT output feeds a division whose
    operand order differs from the oracle's — transcendental-ish, so
    the tie risk is measure-zero.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = float(len(pdf))
        x = pdf["n_chars"].astype("float64")
        s1 = float(x.sum())  # integer-valued: exact in float64
        s2 = float((x * x).sum())
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1)
        z = ((x - mean) / var**0.5).round(6)
        return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"], "zscore": z})

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        d.groupBy("lang")
        .applyInPandas(zscore, "doc_id long, lang string, zscore double")
        .orderBy("doc_id")
    )


@register(
    "udf_udtf_bigrams",
    tags=("udf", "udtf"),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id <= 50)
SELECT doc_id, CAST(u.g - 1 AS BIGINT) AS pos,
       toks[CAST(u.g AS INT)] || ' ' || toks[CAST(u.g + 1 AS INT)] AS bigram
FROM t CROSS JOIN LATERAL (
  SELECT unnest(generate_series(1, least(len(toks) - 1, 8)))
) u(g)
ORDER BY doc_id, pos
""",
)
def udf_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N bigram rows.
    Covers the UDTF surface (Spark 4 `udtf`); the SQL oracle is the
    lateral-unnest equivalent. Row expansion happens in the Python
    worker — appropriate for custom parsers that SQL can't express
    (here deliberately SQL-expressible so the oracle can check it).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos bigint, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(min(len(toks) - 1, 8)):
                yield doc_id, i, f"{toks[i]} {toks[i + 1]}"

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("bigrams_udtf", Bigrams)
    return spark.sql(
        """
        SELECT b.doc_id, b.pos, b.bigram
        FROM udtf_docs_in, LATERAL bigrams_udtf(doc_id, text) b
        ORDER BY b.doc_id, b.pos
        """
    )


@register(
    "udf_grouped_agg_weighted_avg",
    tags=("udf",),
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * c_nationkey) AS DOUBLE)
         / SUM(c_nationkey) AS weighted_bal
FROM customer
WHERE c_nationkey > 0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def udf_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-weighted account balance via a grouped-agg pandas_udf.

    The UDF works in integer cents (exact) so the single final
    division is the identical IEEE op the oracle performs.
    """

    @F.pandas_udf("double")
    def weighted_avg(bal: pd.Series, w: pd.Series) -> float:
        cents = (bal * 100).round().astype("int64")  # exact money
        num = float((cents * w.astype("int64")).sum()) / 100.0
        return num / float(w.sum())

    c = load(spark, sf_dir, "customer").where(F.col("c_nationkey") > 0)
    return (
        c.groupBy("c_mktsegment")
        .agg(weighted_avg("c_acctbal", "c_nationkey").alias("weighted_bal"))
        .orderBy("c_mktsegment")
    )


@register(
    "udf_map_in_arrow_textstats",
    tags=("udf", "text"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
FROM documents WHERE doc_id <= 200
ORDER BY doc_id
""",
)
def udf_map_in_arrow_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy end of the Python UDF surface:
    the batch arrives as a pyarrow RecordBatch and is transformed with
    Arrow compute kernels (C++, SIMD), skipping the pandas conversion
    ``mapInPandas`` pays. The right tier for byte/string-level work
    where pandas object-dtype boxing dominates.

    Scale: identical distribution story to mapInPandas (per-batch
    Arrow transfer, no shuffle), minus one copy per batch; all-integer
    outputs keep the oracle comparison exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200).select("doc_id", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column(1)
            toks = pc.list_value_length(pc.split_pattern(text, " "))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    toks.cast(pa.int64()),
                    pc.utf8_length(text).cast(pa.int64()),
                    pc.utf8_length(pc.replace_substring(text, " ", "")).cast(pa.int64()),
                ],
                ["doc_id", "n_tokens", "n_chars", "n_nonspace"],
            )

    out = d.mapInArrow(stats, "doc_id long, n_tokens long, n_chars long, n_nonspace long")
    return out.orderBy("doc_id")


@register(
    "udf_arrow_scalar_tokenstats",
    tags=("udf", "arrow"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '), t -> len(t) >= 6)) AS BIGINT) AS n_long_tokens
FROM documents
WHERE doc_id <= 200
ORDER BY doc_id
""",
)
def udf_arrow_scalar_tokenstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized SCALAR Python UDF (Spark 4 ``useArrow=True``) —
    the remaining row of the Python UDF surface next to pandas_udf /
    mapInPandas / mapInArrow / UDTF / grouped ops: a plain-Python
    function whose exchange with the JVM is Arrow-batched instead of
    pickled row-at-a-time, closing most of the classic 10-100x
    serialization gap while keeping per-row Python ergonomics.

    Scale: still per-row Python compute — the engine's hot paths stay
    on built-in expressions (see udf_map_in_arrow_textstats for the
    batch-vectorized tier); this query pins the API's correctness, and
    its docstring is the policy: arrow-scalar for convenience code,
    never for the 100 TB inner loop.
    """
    from pyspark.sql.functions import udf

    @udf("bigint", useArrow=True)
    def n_long_tokens(text: str) -> int:
        return sum(1 for t in text.split(" ") if len(t) >= 6)

    @udf("bigint", useArrow=True)
    def n_tokens(text: str) -> int:
        return len(text.split(" "))

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    return (
        d.select(
            "doc_id",
            n_tokens("text").alias("n_tokens"),
            n_long_tokens("text").alias("n_long_tokens"),
        )
        .orderBy("doc_id")
    )


# deterministic "model" for the iterator-UDF inference tier: 64 exact
# rational weights (shared by the Spark UDF and the DuckDB oracle)
_MODEL_DIM = 64
_MODEL_WEIGHTS = [((i * 37) % 19 - 9) / 19.0 for i in range(_MODEL_DIM)]


@register(
    "udf_iter_batch_inference",
    tags=("udf", "ml", "scale"),
    oracle=f"""
SELECT vec_id,
       CAST(label AS BIGINT) AS label,
       ROUND(list_dot_product(
         CAST(embedding AS DOUBLE[]),
         {_MODEL_WEIGHTS!r}::DOUBLE[]), 6) AS score
FROM embeddings
ORDER BY vec_id
""",
)
def udf_iter_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas_udf (SCALAR_ITER) — the ML batch-inference
    tier: the 'model' (a 64-dim linear scorer) is materialized ONCE
    per task, OUTSIDE the batch loop, then scores every Arrow batch
    via one BLAS matmul. This is the pattern that makes per-task model
    load O(1) instead of O(batches) — at 100 TB with a real
    checkpoint, the load is seconds and batches are thousands, so the
    plain scalar pandas_udf (which would re-enter per batch anyway)
    vs iterator matters for weight setup, warm caches, and pinned
    buffers. The oracle recomputes the identical float64 dot product
    with the same literal weights in DuckDB.

    Scale: embarrassingly parallel scan -> Arrow batches -> matmul;
    no shuffle, no driver state; weights ride the closure (broadcast
    would be used for real multi-MB checkpoints).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = np.asarray(_MODEL_WEIGHTS, dtype=np.float64)  # once per task
        for vecs in batches:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.Series(m @ w)

    e = load(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.round(score("embedding"), 6).alias("score"),
        )
        .orderBy("vec_id")
    )


@register(
    "udf_grouped_apply_in_arrow",
    tags=("udf", "arrow"),
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n_cust,
       ROUND(MAX(c_acctbal) - MIN(c_acctbal), 2) AS bal_spread,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def udf_grouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over Arrow (Spark 4 ``groupBy().applyInArrow``) —
    the zero-copy sibling of applyInPandas: each group arrives as a
    pyarrow.Table and is reduced with Arrow compute kernels (C++,
    SIMD), skipping pandas boxing entirely. Completes the declared UDF
    matrix: {scalar, iterator, grouped-map, grouped-agg} × {pandas,
    arrow} (udf_map_in_arrow_textstats is the ungrouped arrow tier,
    udf_grouped_map_zscore the pandas grouped tier). Money sums run on
    the decimal128 column so the reduction is exact, matching the
    oracle's DECIMAL arithmetic bit-for-bit.

    Scale: one shuffle on the grouping key, then per-group Arrow
    batches — a group must fit in one worker (25 nations here; for
    high-cardinality skewed groups pre-aggregate or salt, cf.
    salted_skew_aggregation).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    c = load(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )

    def reduce_group(table: pa.Table) -> pa.Table:
        bal = table.column("bal")
        spread = pc.round(
            pc.subtract(pc.max(bal).cast(pa.float64()), pc.min(bal).cast(pa.float64())),
            ndigits=2,
        )
        total = pc.sum(bal)  # exact decimal128 sum
        return pa.table(
            {
                "c_nationkey": pa.array(
                    [table.column("c_nationkey")[0].as_py()], pa.int32()
                ),
                "n_cust": pa.array([table.num_rows], pa.int64()),
                "bal_spread": pa.array([spread.as_py()], pa.float64()),
                "total_bal": pa.array([float(total.as_py())], pa.float64()),
            }
        )

    return (
        c.groupBy("c_nationkey")
        .applyInArrow(
            reduce_group,
            "c_nationkey int, n_cust long, bal_spread double, total_bal double",
        )
        .orderBy("c_nationkey")
    )


UDTF_SPLIT_N = 3


@register(
    "udf_udtf_polymorphic_split",
    tags=("udf", "udtf", "spark4"),
    oracle=f"""
SELECT doc_id,
       string_split(text, ' ')[1] AS tok0,
       string_split(text, ' ')[2] AS tok1,
       string_split(text, ' ')[3] AS tok2
FROM documents
WHERE doc_id <= 50
ORDER BY doc_id
""",
)
def udf_udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze``): the output
    schema is not fixed at registration — the static ``analyze``
    method computes it from the call-site arguments at plan time
    (here: N constant -> N token columns), the table-function
    equivalent of generics. udf_udtf_bigrams is the fixed-schema
    tier; this one exercises the analyzer round-trip through
    AnalyzeArgument/AnalyzeResult and a LATERAL correlated call.

    Scale: same execution story as any UDTF (per-partition Python
    eval over Arrow batches, no shuffle introduced by the function
    itself); the schema work happens ONCE in the analyzer, not per
    row, so polymorphism is free at execution time.
    """
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import StructType

    @udtf
    class SplitN:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"tok{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            if text is None:
                # match SQL NULL semantics: string_split(NULL) -> NULL
                # tokens, not ''-derived tokens
                yield tuple(None for _ in range(n))
                return
            toks = text.split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("split_n", SplitN)
    load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.tok0, s.tok1, s.tok2
        FROM udtf_docs d, LATERAL split_n(d.text, {UDTF_SPLIT_N}) s
        ORDER BY d.doc_id
        """
    )


@register(
    "api_dataframe_transpose",
    tags=("api", "spark4", "reshape"),
    oracle="""
WITH agg AS (
  SELECT r.r_name,
         CAST(COUNT(DISTINCT n.n_nationkey) AS DOUBLE) AS n_nations,
         CAST(COUNT(DISTINCT s.s_suppkey) AS DOUBLE) AS n_suppliers
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_nationkey = n.n_nationkey
  GROUP BY r.r_name
)
SELECT 'n_nations' AS key,
       MAX(CASE WHEN r_name = 'AFRICA' THEN n_nations END) AS "AFRICA",
       MAX(CASE WHEN r_name = 'AMERICA' THEN n_nations END) AS "AMERICA",
       MAX(CASE WHEN r_name = 'ASIA' THEN n_nations END) AS "ASIA",
       MAX(CASE WHEN r_name = 'EUROPE' THEN n_nations END) AS "EUROPE",
       MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN n_nations END) AS "MIDDLE EAST"
FROM agg
UNION ALL
SELECT 'n_suppliers',
       MAX(CASE WHEN r_name = 'AFRICA' THEN n_suppliers END),
       MAX(CASE WHEN r_name = 'AMERICA' THEN n_suppliers END),
       MAX(CASE WHEN r_name = 'ASIA' THEN n_suppliers END),
       MAX(CASE WHEN r_name = 'EUROPE' THEN n_suppliers END),
       MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN n_suppliers END)
FROM agg
ORDER BY key
""",
)
def api_dataframe_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4.0): rows become columns with
    the first column's values as the new header — the matrix-style
    reshape pandas users reach for, now a native API whose inverse is
    the unpivot surface (agg_unpivot_measures). Applied to the
    per-region dimension rollup; the oracle is the manual
    conditional-aggregation transpose, pinning both the cell values
    and the derived column names.

    Scale: transpose REQUIRES the frame to be column-count-bounded
    after the flip (here 5 regions); it collects the header values to
    the driver at plan time — correct for dimension-sized summaries,
    never for fact tables (the same bounded-pivot contract as
    agg_pivot's pinned value set vs agg_pivot_dynamic's two-phase
    discovery).
    """
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    agg = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").cast("double").alias("n_nations"),
            F.countDistinct("s_suppkey").cast("double").alias("n_suppliers"),
        )
        .orderBy("r_name")
    )
    return agg.transpose().orderBy("key")
