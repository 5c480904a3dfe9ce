"""spark_rapids_ml_spark — a PySpark-native analytics + ML engine.

A from-scratch engine with the capabilities of the reference
(wjxiz1992/spark-rapids-ml: distributed GPU PCA on Spark ML,
see SURVEY.md) re-expressed Spark-first, extended with the relational
surface and the LLM-data-pipeline operator set (dedup, similarity
search, text analysis, multimodal columns) — all designed for a
1000-executor / 100 TB deployment even though tests run on local[*].

Layout:
  session    — SparkSession bootstrap with scale-ready defaults
  sources    — table catalog over the driver testdata / generic IO
  registry   — declared-query registry (the correctness contract)
  functions  — portable column expressions (hashing, vectors, text)
  operators  — relational + LLM-pipe operator implementations
  ml         — Estimator/Model framework + PCA (reference parity)
  streaming  — Structured Streaming ops w/ batch-equivalence oracles
  plans      — plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
