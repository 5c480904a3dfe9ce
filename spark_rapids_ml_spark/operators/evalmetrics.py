"""Model-evaluation metrics as first-class distributed queries: ROC
AUC via the Mann-Whitney rank statistic, per-class confusion /
precision / recall / F1, and least-squares fit diagnostics from exact
integer power sums.

A 100 TB training pipeline evaluates models on held-out slices with
exactly these reductions; each is expressed as a shuffle-light
aggregate (no per-row Python), and every ratio is an exact-integer
IEEE division so the DuckDB oracle matches bit-for-bit (FIXTURES.md
determinism contract).

Reference parity note: the reference repo (spark-rapids-ml) ships
only a PCA estimator (SURVEY.md §2.A); the evaluation surface is part
of the declared §2.B ML-extension contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load


@register(
    "ml_eval_auc_rank",
    tags=("ml", "eval"),
    oracle="""
WITH scored AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS label,
         CAST(round(o.o_totalprice * 100) AS BIGINT) * 1000000000 + o.o_orderkey AS score_key
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT segment, label,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY score_key) AS r
  FROM scored
),
s AS (
  SELECT segment,
         SUM(CASE WHEN label = 1 THEN r ELSE 0 END) AS pos_rank_sum,
         SUM(label) AS n_pos,
         COUNT(*) - SUM(label) AS n_neg
  FROM ranked GROUP BY segment
)
SELECT segment,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(2 * pos_rank_sum - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM s ORDER BY segment
""",
)
def ml_eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC per evaluation slice (market segment) via the
    Mann-Whitney U rank statistic: AUC = (Σ ranks of positives −
    P(P+1)/2) / (P·N), with the score made a UNIQUE bigint key
    (price cents ⊕ orderkey) so rank — and therefore the AUC — has one
    deterministic value in both engines (ties under the raw score
    would make the statistic engine-dependent; the composite key IS
    the declared tie-break).

    Scale: one broadcast dim join + one rank shuffle per slice + a
    partial-aggregable reduction. Evaluation slices are numerous in
    practice (model × segment × cohort), so the per-slice sort
    parallelizes across slices; a single global-AUC call at 100 TB
    would instead bucket scores into a fixed histogram and integrate
    (the approximate path), but eval sets are sampled, not the full
    corpus. The final ratio is one IEEE division of exact integers.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    scored = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("label"),
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") * F.lit(1000000000)
            + F.col("o_orderkey")
        ).alias("score_key"),
    )
    w = Window.partitionBy("segment").orderBy("score_key")
    ranked = scored.withColumn("r", F.row_number().over(w))
    s = ranked.groupBy("segment").agg(
        F.sum(F.when(F.col("label") == 1, F.col("r")).otherwise(0)).alias("pos_rank_sum"),
        F.sum("label").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n_neg"),
    )
    return s.select(
        "segment",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        (
            (2 * F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    ).orderBy("segment")


@register(
    "ml_eval_confusion_prf",
    tags=("ml", "eval"),
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
),
profile AS (
  SELECT lang, term FROM (
    SELECT lang, term, COUNT(*) AS n,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, term) AS rk
    FROM tok GROUP BY lang, term
  ) WHERE rk <= 20
),
overlap AS (
  SELECT t.doc_id, t.lang AS true_lang, p.lang AS cand_lang, COUNT(*) AS hits
  FROM (SELECT DISTINCT doc_id, lang, term FROM tok) t
  JOIN profile p ON t.term = p.term
  GROUP BY t.doc_id, t.lang, p.lang
),
pred AS (
  SELECT doc_id, true_lang, cand_lang AS pred_lang FROM (
    SELECT doc_id, true_lang, cand_lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rk
    FROM overlap
  ) WHERE rk = 1
),
by_true AS (
  SELECT true_lang AS lang, COUNT(*) AS n_true,
         SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END) AS tp
  FROM pred GROUP BY true_lang
),
by_pred AS (
  SELECT pred_lang AS lang, COUNT(*) AS n_pred FROM pred GROUP BY pred_lang
)
SELECT t.lang,
       CAST(t.tp AS BIGINT) AS tp,
       CAST(COALESCE(p.n_pred, 0) - t.tp AS BIGINT) AS fp,
       CAST(t.n_true - t.tp AS BIGINT) AS fn,
       CASE WHEN COALESCE(p.n_pred, 0) = 0 THEN NULL
            ELSE CAST(t.tp AS DOUBLE) / CAST(p.n_pred AS DOUBLE) END AS prec,
       CAST(t.tp AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS rec,
       CAST(2 * t.tp AS DOUBLE)
         / CAST(t.n_true + COALESCE(p.n_pred, 0) AS DOUBLE) AS f1
FROM by_true t LEFT JOIN by_pred p ON t.lang = p.lang
ORDER BY t.lang
""",
)
def ml_eval_confusion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class confusion counts + precision/recall/F1 for the
    profile-based language classifier (the same deterministic
    predictor text_langid_profile reports accuracy for — this is the
    metrics surface a curation pipeline gates on: per-language recall
    tells you which slice of the corpus the lang filter is dropping).

    F1 uses the single-division identity 2·tp / (n_true + n_pred),
    equal to the harmonic mean but with one exact-integer IEEE
    division (no nested rounding); precision is NULL for a class never
    predicted. Scale: the classifier is a broadcast join against a
    (n_langs × 20)-row profile; the metric is two partial-aggregable
    group-bys joined on the tiny class key.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
    wl = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    profile = (
        tok.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(wl))
        .where(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand_lang"), "term")
    )
    doc_terms = tok.select("doc_id", F.col("lang").alias("true_lang"), "term").distinct()
    overlap = (
        doc_terms.join(F.broadcast(profile), "term")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("cand_lang"))
    pred = (
        overlap.withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") == 1)
        .select("doc_id", "true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    by_true = pred.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)).alias("tp"),
    )
    by_pred = pred.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = by_true.join(by_pred, "lang", "left").withColumn(
        "n_pred", F.coalesce(F.col("n_pred"), F.lit(0))
    )
    return j.select(
        "lang",
        F.col("tp").cast("bigint").alias("tp"),
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_true") - F.col("tp")).cast("bigint").alias("fn"),
        F.when(F.col("n_pred") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_pred").cast("double"))
        .alias("prec"),
        (F.col("tp").cast("double") / F.col("n_true").cast("double")).alias("rec"),
        (
            (2 * F.col("tp")).cast("double")
            / (F.col("n_true") + F.col("n_pred")).cast("double")
        ).alias("f1"),
    ).orderBy("lang")


REGR_KEY_CAP = 20000  # bounded eval slice: exact bigint power sums stay in range


@register(
    "ml_regr_diagnostics",
    tags=("ml", "eval", "agg"),
    oracle=f"""
WITH pts AS (
  SELECT l_linestatus,
         CAST(l_quantity AS BIGINT) AS ix,
         CAST(round(l_extendedprice) AS BIGINT) AS iy
  FROM lineitem WHERE l_orderkey <= {REGR_KEY_CAP}
),
sums AS (
  SELECT l_linestatus,
         COUNT(*) AS n,
         SUM(ix) AS sx, SUM(iy) AS sy,
         SUM(ix * ix) AS sxx, SUM(ix * iy) AS sxy, SUM(iy * iy) AS syy
  FROM pts GROUP BY l_linestatus
)
SELECT l_linestatus,
       CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept,
       ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
FROM sums ORDER BY l_linestatus
""",
)
def ml_regr_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit diagnostics (slope, intercept, R²)
    of whole-dollar extended price on quantity, computed from EXACT
    bigint power sums (n, Σx, Σy, Σx², Σxy, Σy²) — the mergeable
    sufficient statistics — then combined in double with the identical
    expression in both engines, so the result is bit-deterministic
    regardless of partitioning or accumulation order (the same
    convention as agg_moments_exact; Spark's native regr_slope /
    regr_r2 stream doubles whose accumulation order varies with the
    partitioning — a pytest pins that they agree to 1e-9).

    Scale: one partial-aggregable group-by carrying six integers per
    group — the canonical map-side-combine reduction; the eval slice
    is key-bounded so the y² sum stays within bigint at any SF.
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= REGR_KEY_CAP)
    pts = li.select(
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("ix"),
        F.round(F.col("l_extendedprice"), 0).cast("bigint").alias("iy"),
    )
    s = pts.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ix").alias("sx"),
        F.sum("iy").alias("sy"),
        F.sum(F.col("ix") * F.col("ix")).alias("sxx"),
        F.sum(F.col("ix") * F.col("iy")).alias("sxy"),
        F.sum(F.col("iy") * F.col("iy")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, sxyd, syyd = (
        F.col("sxx").cast("double"),
        F.col("sxy").cast("double"),
        F.col("syy").cast("double"),
    )
    cov_num = nd * sxyd - sxd * syd
    varx_num = nd * sxxd - sxd * sxd
    vary_num = nd * syyd - syd * syd
    slope = cov_num / varx_num
    return s.select(
        "l_linestatus",
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
        ((cov_num * cov_num) / (varx_num * vary_num)).alias("r2"),
    ).orderBy("l_linestatus")
