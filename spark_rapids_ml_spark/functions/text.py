"""Text expression helpers shared by dedup/textstats operators.

All builders come in (pyspark Column, DuckDB SQL string) pairs so the
same shingling/tokenization is computed in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    return F.split(col, " ")


SQL_TOKENS = "string_split(text, ' ')"


def shingles(toks_col: str = "toks", n: int = 3) -> Column:
    """Distinct n-token shingles over a *materialized* token-array
    column; docs shorter than n yield one whole-text shingle (both
    engines agree on this degenerate case).

    IMPORTANT: pass a column that already holds the token array (e.g.
    ``F.split(text).alias("toks")`` in a prior select). Inlining the
    split sub-expression here would re-evaluate it per array element
    inside the transform lambda — O(tokens²) per document.
    """
    t = F.col(toks_col)
    core = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, core).otherwise(F.array(F.concat_ws(" ", t)))
    )


def sql_shingle_rows(n: int = 3, table: str = "documents", where: str = "TRUE") -> str:
    """DuckDB CTE body producing (doc_id, shingle) distinct rows."""
    return f"""
  SELECT DISTINCT doc_id,
         array_to_string(toks[CAST(g.i AS INT):CAST(least(g.i + {n - 1}, len(toks)) AS INT)], ' ') AS shingle
  FROM (SELECT doc_id, {SQL_TOKENS} AS toks FROM {table} WHERE {where}) t
  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1)))) g(i)
"""


# Adaptive evaluation slice shared by the doc-corpus pairwise operators
# (containment, LSH quality eval, sparse cosine, substring spans): a
# FIXED doc cap loses dup/containment pairs quadratically as the corpus
# grows around it; n/5 floored at 400 (small corpora evaluated whole)
# and capped at 50k (bounds the posting-list truth join) keeps pair
# yield nonzero at every SF. The SQL and Python forms must stay in
# lockstep — the oracle and the implementation bind the SAME cap.
DOC_SLICE_FLOOR = 400
DOC_SLICE_CEIL = 50_000
SQL_DOC_SLICE_CAP = (
    f"GREATEST({DOC_SLICE_FLOOR},"
    f" LEAST((SELECT COUNT(*) FROM documents) // 5, {DOC_SLICE_CEIL}))"
)


def doc_slice_cap(n_docs: int) -> int:
    """Python twin of SQL_DOC_SLICE_CAP (same integer arithmetic)."""
    return max(DOC_SLICE_FLOOR, min(n_docs // 5, DOC_SLICE_CEIL))
