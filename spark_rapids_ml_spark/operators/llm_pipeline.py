"""Training-data pipeline operators: the reproducibility-critical
steps between a raw corpus and a training set — deterministic splits,
hash-stratified sampling, sequence packing, chunking, and benchmark
decontamination. All five are content-hash / window-function driven,
so they are exactly reproducible across engines AND across cluster
topologies (no RNG, no partition-order dependence) — the property a
100 TB pipeline needs so a re-run yields byte-identical training sets.

Scale notes: split/sample are stateless row-local hash predicates —
perfectly parallel scan-speed filters (the md5 expression itself is
not parquet-pushable; what matters at scale is that they need no
shuffle and no state); packing computes its global
prefix sum as a DISTRIBUTED SCAN (range-partition → parallel local
cumsums → tiny offset merge), never a single-task unpartitioned
window; chunking is a row-expanding projection; decontamination is a
semi-join on the shingle posting list (equi-join, the same shape as
the n-gram dedup verifier).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_rapids_ml_spark.functions.portable import hash60, sql_hash60
from spark_rapids_ml_spark.functions.localframe import local_df
from spark_rapids_ml_spark.functions.text import SQL_TOKENS, shingles, sql_shingle_rows
from spark_rapids_ml_spark.registry import register
from spark_rapids_ml_spark.sources.catalog import load

# hash-bucket boundaries of the 3-way split (train < 80, val < 90)
SPLIT_BUCKETS = 100
TRAIN_LT, VAL_LT = 80, 90
SAMPLE_MOD = 10  # keep 1-in-10 per stratum
PACK_BUDGET = 256  # tokens per packed sequence
CHUNK_LEN, CHUNK_STRIDE = 50, 40  # tokens per chunk / stride (overlap 10)


@register(
    "pipe_deterministic_split",
    tags=("llm-pipe", "split"),
    oracle=f"""
WITH b AS (
  SELECT lang, n_chars, {sql_hash60('text')} % {SPLIT_BUCKETS} AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < {TRAIN_LT} THEN 'train'
            WHEN bucket < {VAL_LT} THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1, 2
ORDER BY lang, split
""",
)
def pipe_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash train/val/test split (80/10/10): a document's
    split is a pure function of its text, so duplicates land in the
    same split (no train→test leakage via copies), re-runs are
    byte-identical, and new data never reshuffles old assignments —
    the three properties RNG-based splits lack.

    Scale: stateless per-row predicate; no shuffle before the
    reporting aggregate."""
    d = load(spark, sf_dir, "documents")
    bucket = hash60("text") % SPLIT_BUCKETS
    split = (
        F.when(bucket < TRAIN_LT, "train")
        .when(bucket < VAL_LT, "val")
        .otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


@register(
    "pipe_stratified_sample",
    tags=("llm-pipe", "sample"),
    oracle=f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE {sql_hash60('text', 3)} % {SAMPLE_MOD} = 0
ORDER BY doc_id
""",
)
def pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-10 sample keyed on a seeded content hash —
    the reproducible alternative to rand()-sampling for eval slices
    and ablations: the same document is always in (or out), across
    engines, runs, and partitionings. Different seeds give independent
    sampling 'channels' over the same corpus.

    Scale: row-local predicate; at 100 TB this is a full scan that
    writes 10% — no shuffle at all."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(hash60("text", seed=3) % SAMPLE_MOD == 0)
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
        .orderBy("doc_id")
    )


PACK_PARTITIONS = 16  # range-partition width of the distributed scan


@register(
    "pipe_sequence_packing",
    tags=("llm-pipe", "packing"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
-- FLOOR, not bare CAST: DuckDB's double->BIGINT cast rounds to
-- nearest, it does not truncate
SELECT CAST(FLOOR(cum_excl / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c
GROUP BY 1
ORDER BY seq_id
""",
)
def pipe_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: documents are concatenated in a
    fixed total order and cut into {PACK_BUDGET}-token training
    sequences — a doc belongs to the sequence its exclusive prefix
    sum falls in. This is the concatenate-then-chunk packing used for
    pretraining corpora (not optimal bin packing, which is NP-hard and
    order-destroying); a sequence can overflow by at most one doc's
    tail, which the chunking stage (pipe_chunk_documents) absorbs.

    Scale: the global prefix sum is the textbook DISTRIBUTED SCAN, not
    a naive unpartitioned window (which Spark executes in a single
    task): range-partition on doc_id, local exclusive cumsum per
    partition in parallel, then add each partition's broadcast offset
    (the cumulative total of all earlier partitions — a tiny
    n_partitions-row driver reduction). Result is identical to the
    single-task window at any partition count (partition-invariance
    pinned in tests)."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return _pack_token_counts(t)


def _pack_token_counts(tokens: DataFrame) -> DataFrame:
    """The distributed-scan packer over any (doc_id, n_tokens) frame
    (see pipe_sequence_packing for the algorithm and scale notes;
    pipe_bpe_tokenize_pack feeds it learned-tokenizer counts). The
    scan itself lives in functions/scan.py (factored out in round 8 so
    RFM scoring and token-budget admission share the audited
    implementation); exclusive prefix = inclusive running sum minus
    the row's own count."""
    from spark_rapids_ml_spark.functions.scan import ranged_cumsum

    c = ranged_cumsum(
        tokens, "n_tokens", ["doc_id"], cum_col="cum_incl",
        num_partitions=PACK_PARTITIONS,
    ).withColumn("cum_excl", F.col("cum_incl") - F.col("n_tokens"))
    return (
        c.select(
            F.floor(F.col("cum_excl") / PACK_BUDGET).cast("bigint").alias("seq_id"),
            "n_tokens",
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("seq_id")
    )


@register(
    "pipe_chunk_documents",
    tags=("llm-pipe", "chunk"),
    oracle=f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS} AS toks, CAST(len({SQL_TOKENS}) AS BIGINT) AS n
  FROM documents WHERE doc_id <= 100
),
nc AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= {CHUNK_LEN} THEN 1
              ELSE 1 + CAST(FLOOR((n - {CHUNK_LEN} + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE}.0) AS BIGINT)
         END AS n_chunks
  FROM t
)
SELECT doc_id,
       CAST(g.i AS BIGINT) AS chunk_idx,
       CAST(least({CHUNK_LEN}, n - g.i * {CHUNK_STRIDE}) AS BIGINT) AS chunk_tokens,
       toks[CAST(g.i * {CHUNK_STRIDE} + 1 AS INT)] AS first_token
FROM nc CROSS JOIN LATERAL (SELECT unnest(generate_series(0, n_chunks - 1))) g(i)
ORDER BY doc_id, chunk_idx
""",
)
def pipe_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (CHUNK_LEN=50 tokens, stride
    CHUNK_STRIDE=40): the standard retrieval/embedding preprocessing —
    every token is covered, consecutive chunks share CHUNK_LEN -
    CHUNK_STRIDE = 10 tokens of context, and the chunk count
    is a pure function of the token count. Bounded to doc_id <= 100
    for the declared query (the operator itself is unbounded).

    Scale: row-expanding projection (posexplode of a computed index
    range) — no shuffle; at 100 TB this runs scan-speed."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    t = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    extra = F.col("n") - CHUNK_LEN
    n_chunks = F.when(F.col("n") <= CHUNK_LEN, F.lit(1)).otherwise(
        1 + F.floor((extra + (CHUNK_STRIDE - 1)) / float(CHUNK_STRIDE)).cast("bigint")
    )
    nc = t.withColumn("n_chunks", n_chunks)
    return (
        nc.select(
            "doc_id",
            "toks",
            "n",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("_p", "i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_idx"),
            F.least(F.lit(CHUNK_LEN), F.col("n") - F.col("i") * CHUNK_STRIDE)
            .cast("bigint")
            .alias("chunk_tokens"),
            F.element_at("toks", (F.col("i") * CHUNK_STRIDE + 1).cast("int")).alias(
                "first_token"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "pipe_contamination_overlap",
    tags=("llm-pipe", "decontamination"),
    oracle=f"""
WITH bench AS ({sql_shingle_rows(where="doc_id < 20")}),
corpus AS (SELECT DISTINCT shingle FROM ({sql_shingle_rows(where="doc_id >= 20")})),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM bench GROUP BY doc_id),
hit AS (
  SELECT b.doc_id, COUNT(*) AS n_matched
  FROM bench b WHERE EXISTS (SELECT 1 FROM corpus c WHERE c.shingle = b.shingle)
  GROUP BY b.doc_id
)
SELECT t.doc_id, t.n_shingles,
       COALESCE(h.n_matched, 0) AS n_matched,
       -- exact int ratio: unrounded (identical IEEE division)
       CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / t.n_shingles AS contamination
FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
ORDER BY t.doc_id
""",
)
def pipe_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for each held-out document (doc_id
    < 20 stands in for an eval benchmark), the fraction of its
    3-gram shingles that appear ANYWHERE in the training corpus —
    the overlap score used to drop or flag contaminated eval items.

    Scale: a left-semi equi-join of the tiny benchmark shingle list
    against the corpus posting list, keyed on the shingle — at 100 TB
    the corpus side is enormous and must NEVER be broadcast; the
    planner shuffles both sides on the shingle key (or runtime-
    broadcasts whichever side is actually small — AQE's call, not a
    hard-coded hint)."""
    d = load(spark, sf_dir, "documents")
    sh = lambda df: df.select(  # noqa: E731
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", F.explode(shingles("toks")).alias("shingle"))
    bench = sh(d.where(F.col("doc_id") < 20))
    corpus = sh(d.where(F.col("doc_id") >= 20)).select("shingle").distinct()
    tot = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit = (
        bench.join(corpus, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    contamination = F.col("n_matched").cast("double") / F.col("n_shingles")
    return (
        tot.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.coalesce(contamination, F.lit(0.0)).alias("contamination"),
        )
        .orderBy("doc_id")
    )


RESERVOIR_K = 5  # fixed sample size per stratum


@register(
    "pipe_group_reservoir_sample",
    tags=("llm-pipe", "sample"),
    oracle=f"""
WITH r AS (
  SELECT lang, source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY {sql_hash60('text')}, doc_id
         ) AS rn
  FROM documents
)
SELECT lang, source, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
FROM r WHERE rn <= {RESERVOIR_K}
ORDER BY lang, source, rn
""",
)
def pipe_group_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-stratum sample (the distributed
    stand-in for reservoir sampling): rank documents inside each
    (lang, source) stratum by a content hash and keep the first K.
    Content-keyed order makes the sample a pure function of the data —
    identical across engines, partitionings, and re-runs — unlike
    rand()-based reservoirs, which are irreproducible, and unlike
    LIMIT, which samples whatever partition order delivers first.

    Scale: one shuffle on the stratum key; Catalyst pushes rn <= K
    into the sort as a WindowGroupLimit, so each map task keeps only
    K candidates per stratum before the exchange — the same
    merge-of-local-reservoirs structure classic reservoir sampling
    uses, with the hash standing in for the random tags.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(hash60("text"), "doc_id")
    return (
        d.select(
            "lang",
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= RESERVOIR_K)
        .select("lang", "source", "rn", "doc_id", "n_chars")
        .orderBy("lang", "source", "rn")
    )


# Mixture weights per source bucket: upsample-by-inclusion is not
# possible without duplication, so weights here are KEEP RATES in
# [0, 1] per source group (the downsampling half of mixture building;
# epoch-style upsampling is a union of repeated passes at these rates).
MIXTURE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIXTURE_DEFAULT_RATE = 0.1
MIXTURE_BUCKETS = 10_000


@register(
    "pipe_mixture_sampling",
    tags=("llm-pipe", "sample"),
    oracle=f"""
WITH rated AS (
  SELECT source, n_chars,
         CASE source
           WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25
           ELSE {MIXTURE_DEFAULT_RATE} END AS rate,
         {sql_hash60('text', seed=41)} % {MIXTURE_BUCKETS} AS bucket
  FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(COUNT(*) FILTER (WHERE bucket < rate * {MIXTURE_BUCKETS}) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) FILTER (WHERE bucket < rate * {MIXTURE_BUCKETS}) AS BIGINT) AS kept_chars
FROM rated
GROUP BY source
ORDER BY source
""",
)
def pipe_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: each source gets a configured keep
    rate and every document's keep decision is a pure content-hash
    threshold — deterministic (re-runs identical), stable under
    corpus growth (old docs never flip), and duplicate-consistent
    (copies of a doc are all kept or all dropped, composing with the
    dedup stage). This is the downsampling half of mixture building;
    upsampling is repeated passes at these rates.

    Scale: a stateless per-row predicate — the mixture is applied
    during the scan with zero shuffle; the reporting aggregate here
    exists for the oracle. Rates live in one broadcastable map.
    """
    d = load(spark, sf_dir, "documents")
    rate = F.lit(MIXTURE_DEFAULT_RATE)
    for src, r in sorted(MIXTURE_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    bucket = hash60("text", seed=41) % MIXTURE_BUCKETS
    kept = bucket < rate * MIXTURE_BUCKETS
    return (
        d.select("source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("long")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars"))).cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )


BPE_MERGES = 8
BPE_VOCAB_CAP = 20_000


def bpe_train_merges(word_counts: list[tuple[str, int]], n_merges: int = BPE_MERGES):
    """Classic BPE training loop over a (word, count) vocabulary:
    words start as character sequences; each iteration counts adjacent
    symbol pairs weighted by word count, picks the most frequent pair
    (count desc, then lexicographic pair — fully deterministic), and
    merges it everywhere. Returns [(rank, left, right, pair_count)].

    Pure function of the vocabulary, shared by the declared query and
    its pytest oracle (tests/test_quality.py pins a hand-computed
    corpus)."""
    seqs = [(list(w), c) for w, c in word_counts]
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        merged = a + b
        new_seqs = []
        for sym, c in seqs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, c))
        seqs = new_seqs
    return merges


@register(
    "pipe_bpe_train_merges",
    tags=("llm-pipe", "tokenizer"),
    # No SQL oracle: BPE training is an iterative merge loop (the
    # sanctioned rows-only case); tests/test_quality.py pins the
    # learned rules on a hand-computed corpus and the declared run's
    # determinism.
)
def pipe_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training — the missing half of token counting:
    ONE distributed pass reduces the corpus to a (word, count)
    vocabulary (the only unbounded-data step), then the merge loop
    runs on the driver over the BOUNDED vocabulary — the same
    bounded-driver-state architecture as k-means centroids
    (ml/kmeans.py) and exactly how production BPE trainers work
    (corpus → word counts → in-memory merges). Vocabulary is capped at
    the top BPE_VOCAB_CAP words by (count desc, word), the standard
    fidelity/memory knob. Output: the learned merge table
    (rank, left, right, pair_count) — deterministic: every tie in the
    pair-count argmax breaks lexicographically.

    Scale: the corpus pass is a map-side-combined group-by; at 100 TB
    the vocab table is millions of rows — still driver-feasible capped,
    and the merge loop never touches the corpus again. Tokenizer
    APPLICATION at scale is text_token_count's regex path or a
    broadcast of these rules.
    """
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(BPE_VOCAB_CAP)
    )
    word_counts = [(r["word"], r["cnt"]) for r in vocab.collect()]
    merges = bpe_train_merges(word_counts)
    return local_df(
        spark, merges, "merge_rank bigint, left string, right string, pair_count bigint"
    ).orderBy("merge_rank")


# The merge table learned by pipe_bpe_train_merges on the sf0.001
# documents corpus, pinned as the deployed tokenizer. This is the
# production shape: a tokenizer is trained ONCE on a reference corpus
# and then applied unchanged to every dataset — retraining per input
# would change the vocabulary under the model. tests/test_quality.py
# re-trains at sf0.001 and asserts equality with these constants, so
# the train→apply pair stays coupled (the apply side provably uses
# what the train side learns), mirroring PCA's fit→transform.
BPE_FIXED_MERGES: list[tuple[int, str, str]] = [
    (1, "e", "r"),
    (2, "o", "r"),
    (3, "i", "n"),
    (4, "o", "w"),
    (5, "s", "t"),
    (6, "l", "u"),
    (7, "a", "r"),
    (8, "p", "ar"),
]


def bpe_apply(word: str, merges: list[tuple[int, str, str]]) -> list[str]:
    """Apply learned BPE merges to one word, left-greedy in rank
    order — the exact inverse-direction pass of bpe_train_merges'
    merge step (same non-overlap semantics: after a merge the scan
    resumes AFTER the merged pair). Pure function; shared by the
    distributed query, its pytest oracle, and hand-computed cases in
    tests/test_quality.py."""
    syms = list(word)
    for _, a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _sql_bpe_merge_values() -> str:
    return ", ".join(
        f"({r}, '{a}', '{b}')" for r, a, b in BPE_FIXED_MERGES
    )


_BPE_LAST_RANK = BPE_FIXED_MERGES[-1][0]


def _sql_bpe_wt_ctes() -> str:
    """The WITH-RECURSIVE CTE chain computing ``words(doc_id, word)``
    and ``wt(word, w_tokens, w_chars)`` under BPE_FIXED_MERGES —
    shared by the apply and tokenize-pack oracles. Must follow a
    ``WITH RECURSIVE`` keyword in the consuming statement."""
    return f"""merges(mrank, ma, mb) AS (VALUES {_sql_bpe_merge_values()}),
words AS (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) > 0
),
dw AS (SELECT DISTINCT word FROM words),
-- flattened per-word recursion: state (merge rank, emitted symbols,
-- remaining symbols); one row per word advances one symbol per step,
-- and an exhausted pass promotes acc to rest under the next rank.
-- Rank {_BPE_LAST_RANK + 1} rows join no merge row, ending recursion.
step(word, wrank, acc, rest) AS (
  SELECT word, 1, CAST([] AS VARCHAR[]), string_split_regex(word, '')
  FROM dw
  UNION ALL
  SELECT word,
         CASE WHEN len(rest) = 0 THEN wrank + 1 ELSE wrank END,
         CASE WHEN len(rest) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(rest) >= 2 AND rest[1] = ma AND rest[2] = mb
                THEN list_append(acc, ma || mb)
              ELSE list_append(acc, rest[1]) END,
         CASE WHEN len(rest) = 0 THEN acc
              WHEN len(rest) >= 2 AND rest[1] = ma AND rest[2] = mb
                THEN list_slice(rest, 3, len(rest))
              ELSE list_slice(rest, 2, len(rest)) END
  FROM step JOIN merges ON mrank = wrank
),
wt AS (
  SELECT word, len(rest) AS w_tokens, length(word) AS w_chars
  FROM step WHERE wrank = {_BPE_LAST_RANK + 1}
)"""


@register(
    "pipe_bpe_apply_tokens",
    tags=("llm-pipe", "tokenizer"),
    oracle=f"""
WITH RECURSIVE
{{wt_ctes}}
SELECT w.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(t.w_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(t.w_chars) AS BIGINT) AS n_word_chars
FROM words w JOIN wt t USING (word)
GROUP BY w.doc_id
ORDER BY w.doc_id
""".replace("{wt_ctes}", _sql_bpe_wt_ctes()),
)
def pipe_bpe_apply_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the corpus-wide step a tokenization
    pipeline actually runs at 100 TB, completing pipe_bpe_train_merges'
    train→apply pair the way PCA pairs fit with transform (reference:
    RapidsPCA.scala:169's transform after fit). The deployed merge
    table (BPE_FIXED_MERGES, provably equal to what training learns on
    the reference corpus) rides into executors as a closure constant —
    the broadcast-small-model pattern — and tokenization runs
    distributed: one Arrow-batched pandas_udf evaluation per DISTINCT
    word, then an equi-join maps word-level token counts back onto the
    corpus. Output: per-document word/token/char counts under the
    learned vocabulary.

    Scale: applying an expensive pure function once per distinct key
    and joining back is the canonical dedup-the-work pattern — the
    distinct-word table is orders of magnitude smaller than the corpus
    (Heaps' law), so the pandas_udf touches a vanishing fraction of
    rows. The word→count join is a broadcast here (bounded vocab); at a
    scale where the vocabulary itself outgrows broadcast, drop the hint
    and the same plan runs as a shuffled hash join on the word key. The
    DuckDB oracle independently re-implements left-greedy merge
    application as a flattened recursive CTE, so the hash check pins
    the apply semantics, not just row counts.
    """
    words = _bpe_tokenized_words(spark, sf_dir)
    return (
        words.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("w_tokens").cast("bigint").alias("n_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_word_chars"),
        )
        .orderBy("doc_id")
    )


def _bpe_tokenized_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, word, w_tokens) — every corpus word joined with its
    BPE token count under BPE_FIXED_MERGES, via the
    tokenize-distinct-words-then-join-back pattern (see
    pipe_bpe_apply_tokens). Shared by the apply and tokenize-pack
    queries."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.length("word") > 0)
    merges = list(BPE_FIXED_MERGES)

    @F.pandas_udf("long")
    def n_tokens_udf(col: pd.Series) -> pd.Series:
        return col.map(lambda w: len(bpe_apply(w, merges)))

    wt = (
        words.select("word")
        .distinct()
        .select("word", n_tokens_udf("word").alias("w_tokens"))
    )
    return words.join(F.broadcast(wt), "word")


@register(
    "pipe_bpe_tokenize_pack",
    tags=("llm-pipe", "tokenizer", "packing"),
    oracle=f"""
WITH RECURSIVE
{{wt_ctes}},
t AS (
  SELECT w.doc_id, CAST(SUM(wt.w_tokens) AS BIGINT) AS n_tokens
  FROM words w JOIN wt USING (word)
  GROUP BY w.doc_id
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT CAST(FLOOR(cum_excl / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c
GROUP BY 1
ORDER BY seq_id
""".replace("{wt_ctes}", _sql_bpe_wt_ctes()),
)
def pipe_bpe_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-then-pack — the two-stage shape a pretraining data
    job actually ships: per-document token counts under the DEPLOYED
    tokenizer (BPE_FIXED_MERGES, the learned vocabulary — not the
    whitespace proxy pipe_sequence_packing uses) feed the
    concatenate-then-chunk packer that cuts the corpus into
    {PACK_BUDGET}-token training sequences. Token counting is the
    distinct-word pandas_udf + join-back of pipe_bpe_apply_tokens;
    packing is the same distributed-scan prefix sum as
    pipe_sequence_packing (range-partition, parallel local cumsums,
    tiny driver offset merge) — composition changes NEITHER stage's
    plan, which is the point: operators that compose without
    re-shuffling are what keep a 100 TB pipeline at one pass per
    stage. Output: per-sequence doc/token totals, hash-checked
    against the recursive-CTE BPE oracle feeding the same window
    arithmetic.
    """
    t = (
        _bpe_tokenized_words(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("w_tokens").cast("bigint").alias("n_tokens"))
    )
    return _pack_token_counts(t)


# pipeline-filter thresholds: minimum tokens, maximum mean chars/token,
# and the language allowlist (drops zh in the testdata distribution)
MIN_TOKENS, MAX_MEAN_TOKEN_LEN = 30, 6.0
KEEP_LANGS = ("de", "en", "es", "fr")


@register(
    "pipe_end_to_end_curation",
    tags=("llm-pipe", "dedup", "quality", "split"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, text, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
filtered AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS}
    AND CAST(n_chars AS DOUBLE) / n_tokens <= {MAX_MEAN_TOKEN_LEN}
    AND lang IN ('de', 'en', 'es', 'fr')
),
deduped AS (
  SELECT * FROM filtered
  WHERE doc_id IN (
    SELECT MIN(doc_id) FROM filtered GROUP BY {sql_hash60('text')}
  )
),
assigned AS (
  SELECT lang, n_chars,
         CASE WHEN {sql_hash60('text')} % {SPLIT_BUCKETS} < {TRAIN_LT} THEN 'train'
              WHEN {sql_hash60('text')} % {SPLIT_BUCKETS} < {VAL_LT} THEN 'val'
              ELSE 'test' END AS split
  FROM deduped
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM assigned
GROUP BY split
ORDER BY split
""",
)
def pipe_end_to_end_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline — quality filter → language
    filter → exact dedup → deterministic split — as one declared DAG,
    the C4/RefinedWeb-style shape a training-data pipeline actually
    runs, hash-locked end to end against the same four stages in SQL.

    Stage properties that make the composition one job, not four:
    quality + language filters are row-local predicates (fused into
    the scan, no shuffle); exact dedup is ONE shuffle on the content
    hash keeping min(doc_id) (deterministic representative); the
    split is again row-local on the same content hash (computed once,
    reused by dedup and split); the reporting rollup is the only
    other exchange. At 100 TB: two shuffles total, both on bounded
    aggregation state — and every stage is individually declared
    above (text_quality_score, dedup_exact_text,
    pipe_deterministic_split), so this query pins that composing them
    changes nothing semantically.
    """
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    filtered = (
        d.withColumn("n_tokens", n_tokens)
        .where(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_chars").cast("double") / F.col("n_tokens") <= MAX_MEAN_TOKEN_LEN)
            & F.col("lang").isin(*KEEP_LANGS)
        )
        .withColumn("thash", hash60("text"))
    )
    deduped = (
        filtered.withColumn(
            "rep_id", F.min("doc_id").over(Window.partitionBy("thash"))
        )
        .where(F.col("doc_id") == F.col("rep_id"))
    )
    bucket = F.col("thash") % SPLIT_BUCKETS
    split = (
        F.when(bucket < TRAIN_LT, "train")
        .when(bucket < VAL_LT, "val")
        .otherwise("test")
    )
    return (
        deduped.select("lang", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


LB_BUCKET_WIDTH = 32  # token-length bucket width
LB_BUCKET_MAX = 8  # lengths >= width*max all land in the top bucket
LB_BATCH_SIZE = 16  # docs per training batch within a bucket


@register(
    "pipe_length_bucket_batches",
    tags=("pipe",),
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents
),
b AS (
  SELECT doc_id, n_tok,
         LEAST(n_tok // {LB_BUCKET_WIDTH}, {LB_BUCKET_MAX}) AS bucket
  FROM t
),
r AS (
  SELECT bucket, n_tok,
         (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n_tok, doc_id) - 1)
           // {LB_BATCH_SIZE} AS batch_idx
  FROM b
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(batch_idx AS BIGINT) AS batch_idx,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(MAX(n_tok) AS BIGINT) AS max_tok,
       CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS pad_waste
FROM r GROUP BY bucket, batch_idx
ORDER BY bucket, batch_idx
""",
)
def pipe_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly — the dynamic-batching step that
    makes padded training efficient: docs are bucketed by token length
    (width-{LB_BUCKET_WIDTH} rungs, top rung open), sorted by (length,
    doc_id) within the bucket, and cut into {LB_BATCH_SIZE}-doc
    batches; each batch pads to its own max length, and the reported
    pad_waste = n·max−Σ is exactly the token budget padding burns —
    the statistic you tune bucket width against (global sorting would
    minimize waste but destroy shuffle locality; random batching
    maximizes it).

    Scale: bucket assignment is a stateless in-row predicate; the
    within-bucket ordering is a window per bucket — with the
    fixed bucket count this is the documented skew point, and the
    100 TB path is the pipe_sequence_packing distributed-scan shape
    (range-partition by (bucket, n_tok), local row_number, broadcast
    per-partition offsets); the per-batch aggregate is
    partial-aggregable on the (bucket, batch) key.
    """
    t = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    b = t.withColumn(
        "bucket",
        F.least(F.col("n_tok") / F.lit(LB_BUCKET_WIDTH), F.lit(LB_BUCKET_MAX)).cast(
            "bigint"
        ),
    )
    w = Window.partitionBy("bucket").orderBy("n_tok", "doc_id")
    r = b.withColumn(
        "batch_idx",
        ((F.row_number().over(w) - 1) / F.lit(LB_BATCH_SIZE)).cast("bigint"),
    )
    return (
        r.groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
            (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
            .cast("bigint")
            .alias("pad_waste"),
        )
        .orderBy("bucket", "batch_idx")
    )


# --------------------------------------------- token-budget selection

TB_SCORE_SCALE = 1_000_000  # integer quality score = distinct-ratio micro
TB_BUDGET_NUM, TB_BUDGET_DEN = 2, 5  # budget = 40% of corpus tokens


@register(
    "pipe_token_budget_selection",
    tags=("pipeline", "selection"),
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         len({SQL_TOKENS}) AS n_tok,
         len(list_distinct({SQL_TOKENS})) AS n_dis
  FROM documents
),
scored AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         (CAST(n_dis AS BIGINT) * {TB_SCORE_SCALE}) // n_tok AS score
  FROM t
),
budget AS (SELECT (SUM(n_tok) * {TB_BUDGET_NUM}) // {TB_BUDGET_DEN} AS b FROM scored),
ranked AS (
  SELECT doc_id, n_tok, score,
         SUM(n_tok) OVER (ORDER BY score DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scored
),
sel AS (SELECT * FROM ranked WHERE cum <= (SELECT b FROM budget))
SELECT CAST((SELECT COUNT(*) FROM scored) AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM sel) AS BIGINT) AS n_selected,
       CAST((SELECT b FROM budget) AS BIGINT) AS budget_tokens,
       CAST((SELECT MAX(cum) FROM sel) AS BIGINT) AS tokens_selected,
       CAST((SELECT MIN(score) FROM sel) AS BIGINT) AS cut_score
""",
)
def pipe_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-per-token data selection under a token budget —
    the "which 40% of the corpus do we train on" knapsack that data
    curation runs after dedup/filtering: rank docs by an integer
    quality score (distinct-token ratio in micro units — the
    repetition-penalty proxy), admit in rank order while the running
    token total fits the budget (budget = 40% of corpus tokens,
    computed from the same scan).

    Determinism: score and budget are pure integer arithmetic; the
    admission order (score DESC, doc_id) is total, so the cumulative
    sum and the cut point are exact.

    Scale: scoring is per-row; the admission cumsum is the DISTRIBUTED
    SCAN (functions/scan.ranged_cumsum): range-partition by
    (score DESC, doc_id), per-range local cumsums in parallel,
    broadcast per-range exclusive offsets — no single-task global
    window anywhere in the plan (plan-asserted in tests/test_plans.py;
    partition-invariance pinned). Every range computes its local scan
    concurrently, so admission cost is corpus-size / parallelism.
    Output is a 1-row summary, so nothing corpus-sized leaves the
    executors.
    """
    from spark_rapids_ml_spark.functions.scan import ranged_cumsum

    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("n_dis"),
    )
    scored = t.select(
        "doc_id",
        "n_tok",
        F.expr(f"(n_dis * {TB_SCORE_SCALE}) div n_tok").alias("score"),
    )
    # budget and n_docs ride the admission scan's own per-partition
    # totals (guide §1/§2: the scan already aggregates SUM(n_tok) and
    # COUNT per range for its offsets — a separate budget aggregate
    # re-ran the whole tokenize+score lineage a second time). Exact
    # integer arithmetic, so the threshold is bit-identical to the
    # oracle's (SUM(n_tok) * NUM) // DEN scalar subquery.
    totals: dict = {}
    ranked = ranged_cumsum(
        scored.select("doc_id", "n_tok", "score"),
        "n_tok",
        [F.col("score").desc(), F.col("doc_id")],
        cum_col="cum",
        totals_out=totals,
    )
    b = (totals["sum"] * TB_BUDGET_NUM) // TB_BUDGET_DEN
    sel = ranked.where(F.col("cum") <= F.lit(b))
    # budget comes from the corpus total, never from the selection:
    # max('cum') over an empty selection (one doc exceeding the whole
    # budget) would be NULL where the oracle emits the computed budget
    summary = sel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.max("cum").cast("bigint").alias("tokens_selected"),
        F.min("score").cast("bigint").alias("cut_score"),
    )
    return summary.select(
        F.lit(totals["count"]).cast("bigint").alias("n_docs"),
        "n_selected",
        F.lit(b).cast("bigint").alias("budget_tokens"),
        "tokens_selected",
        "cut_score",
    )


# ------------------------------------------ composed curate->budget->pack

CBP_MIN_TOK, CBP_MAX_TOK = 5, 1000  # curation length gate
CBP_MIN_RATIO_MICRO = 300_000  # distinct-token ratio floor (0.3 in micro)


@register(
    "pipe_curate_budget_pack",
    tags=("llm-pipe", "composed", "selection", "packing"),
    bench=True,  # round 10: the composed curation pipeline as a headline row

    oracle=f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text,
         CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tok,
         CAST(len(list_distinct({SQL_TOKENS})) AS BIGINT) AS n_dis
  FROM documents
),
filt AS (
  SELECT doc_id, text, n_tok, (n_dis * {TB_SCORE_SCALE}) // n_tok AS score
  FROM t
  WHERE n_tok BETWEEN {CBP_MIN_TOK} AND {CBP_MAX_TOK}
    AND (n_dis * {TB_SCORE_SCALE}) // n_tok >= {CBP_MIN_RATIO_MICRO}
),
dedup AS MATERIALIZED (
  SELECT MIN(doc_id) AS doc_id, MIN(n_tok) AS n_tok, MIN(score) AS score
  FROM filt GROUP BY text
),
budget AS (SELECT (SUM(n_tok) * {TB_BUDGET_NUM}) // {TB_BUDGET_DEN} AS b FROM dedup),
ranked AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY score DESC, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dedup
),
adm AS MATERIALIZED (SELECT doc_id, n_tok FROM ranked WHERE cum <= (SELECT b FROM budget)),
packed AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum_excl
  FROM adm
)
SELECT CAST(cum_excl // {PACK_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM packed
GROUP BY 1
ORDER BY seq_id
""",
)
def pipe_curate_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data path: quality filter (length gate +
    distinct-token-ratio floor) → exact dedup (keep the smallest
    doc_id per text) → greedy token-budget admission (40% of the
    curated corpus's tokens, by quality-per-token score) → sequence
    packing of the admitted docs — four pipeline stages as ONE
    declared DAG, hash-locked end to end like pipe_end_to_end_curation
    but exercising the round-8 order-statistic machinery: BOTH the
    admission cumsum and the packing prefix sum ride the distributed
    scan (functions/scan.ranged_cumsum), chained in one plan.

    Scale: filter and scoring are per-row; dedup is one hash shuffle
    on the text; each scan is range-partitioned parallel work with an
    n_partitions-row driver reduction — no single-task window anywhere
    (the composition inherits every stage's own plan pins). Output is
    the packed-sequence summary, ~total_tokens/{PACK_BUDGET} rows.
    """
    from spark_rapids_ml_spark.functions.scan import ranged_cumsum

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("n_dis"),
    )
    filt = d.where(
        F.col("n_tok").between(CBP_MIN_TOK, CBP_MAX_TOK)
        & (F.expr(f"(n_dis * {TB_SCORE_SCALE}) div n_tok") >= CBP_MIN_RATIO_MICRO)
    ).select(
        "doc_id",
        "text",
        "n_tok",
        F.expr(f"(n_dis * {TB_SCORE_SCALE}) div n_tok").alias("score"),
    )
    dedup = filt.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tok").alias("n_tok"),
        F.min("score").alias("score"),
    ).drop("text")
    # budget rides the admission scan's own per-partition totals: the
    # previous separate budget aggregate re-ran the whole tokenize +
    # filter + dedup lineage a second time just for SUM(n_tok) (the
    # multi-consumer shape that defeated scan widening in r13). Exact
    # bigint arithmetic — the threshold is bit-identical to the
    # oracle's (SUM(n_tok) * NUM) // DEN scalar subquery.
    totals: dict = {}
    ranked = ranged_cumsum(
        dedup.select("doc_id", "n_tok", "score"),
        "n_tok",
        [F.col("score").desc(), F.col("doc_id")],
        cum_col="cum",
        totals_out=totals,
    )
    b = (totals["sum"] * TB_BUDGET_NUM) // TB_BUDGET_DEN
    adm = ranked.where(F.col("cum") <= F.lit(b)).select("doc_id", "n_tok")
    packed = ranged_cumsum(adm, "n_tok", [F.col("doc_id")], cum_col="cum_incl")
    return (
        packed.select(
            F.floor((F.col("cum_incl") - F.col("n_tok")) / PACK_BUDGET)
            .cast("bigint")
            .alias("seq_id"),
            "n_tok",
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("seq_id")
    )


N_SHARDS = 8  # output shards for the size-balanced packing


@register(
    "pipe_shard_bin_packing",
    tags=("pipe", "curation"),
    oracle=f"""
WITH rk AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r0
  FROM documents
),
a AS (
  SELECT doc_id, n_chars,
         CASE WHEN (r0 // {N_SHARDS}) % 2 = 0
              THEN r0 % {N_SHARDS}
              ELSE {N_SHARDS - 1} - (r0 % {N_SHARDS}) END AS shard
  FROM rk
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM a GROUP BY shard ORDER BY shard
""",
)
def pipe_shard_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced dataset sharding by serpentine (boustrophedon)
    rank assignment: rank documents by size descending and deal them
    across {N_SHARDS} shards alternating direction each pass — the
    deterministic O(1)-state approximation of greedy bin packing
    (largest-first serpentine keeps shard totals within one document
    of each other, and unlike greedy it needs no running-total state,
    so it distributes). This is how training pipelines cut a corpus
    into equal-weight input shards for data-parallel workers.

    Scale: the global size rank is the DISTRIBUTED range-partitioned
    scan (functions/scan.ranged_row_number — no single-task sort);
    the shard id is then a pure function of the rank, and the rollup
    is one {N_SHARDS}-row partial-aggregable reduce.
    """
    from spark_rapids_ml_spark.functions.scan import ranged_row_number

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rk = ranged_row_number(
        d, [F.col("n_chars").desc(), F.col("doc_id")], rn_col="rn"
    ).withColumn("r0", F.col("rn") - 1)
    # integer DIV, not float division: r0/8 via float64 loses exactness
    # past 2^53 ranks (same defect class the ranged_ntile fix removed)
    pass_even = F.expr(f"r0 div {N_SHARDS}") % 2 == 0
    pos = F.col("r0") % N_SHARDS
    a = rk.select(
        "doc_id",
        "n_chars",
        F.when(pass_even, pos).otherwise(F.lit(N_SHARDS - 1) - pos).alias("shard"),
    )
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .select(F.col("shard").cast("bigint").alias("shard"), "n_docs", "total_chars", "min_doc_id")
        .orderBy("shard")
    )


CURRICULUM_STAGES = 4  # easy -> hard training stages


@register(
    "pipe_curriculum_stages",
    tags=("pipe", "curation"),
    oracle=f"""
WITH m AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS nt,
         CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS difficulty
  FROM documents
),
rk AS (
  SELECT doc_id, n_chars, nt, difficulty,
         NTILE({CURRICULUM_STAGES}) OVER (ORDER BY difficulty, doc_id) AS stage
  FROM m
)
SELECT CAST(stage AS BIGINT) AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       ROUND(MIN(difficulty), 6) AS min_difficulty,
       ROUND(MAX(difficulty), 6) AS max_difficulty,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM rk GROUP BY stage ORDER BY stage
""",
)
def pipe_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning staging: order documents by a difficulty
    proxy (mean word length — a ratio of exact ints, so the order is
    deterministic cross-engine) and split them into
    {CURRICULUM_STAGES} equal-population stages, easy first — the
    curriculum schedule a training pipeline materializes so each epoch
    phase reads one stage. Emits per-stage document counts, token
    budgets and the difficulty band.

    Scale: the stage assignment is NTILE over a total order — run on
    the DISTRIBUTED range-partitioned scan (functions/scan.
    ranged_ntile, bit-identical to the single-task window at any
    partition count, no Exchange SinglePartition); the rollup is a
    {CURRICULUM_STAGES}-row reduce.
    """
    from spark_rapids_ml_spark.functions.scan import ranged_ntile

    d = load(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("nt"),
        (F.col("n_chars").cast("double") / F.size(F.split("text", " "))).alias(
            "difficulty"
        ),
    )
    rk = ranged_ntile(
        m, CURRICULUM_STAGES, [F.col("difficulty"), F.col("doc_id")], out_col="stage"
    )
    return (
        rk.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            F.round(F.min("difficulty"), 6).alias("min_difficulty"),
            F.round(F.max("difficulty"), 6).alias("max_difficulty"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .orderBy("stage")
    )


# ------------------------------------ mixture budget apportionment

MIX_BUDGET = 10_000  # training slots (documents to draw) to apportion


@register(
    "pipe_mixture_budget_apportionment",
    tags=("llm-pipe", "sample", "scale"),
    oracle=f"""
WITH tok AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n_docs, toks,
         CAST(FLOOR(SQRT(CAST(toks AS DOUBLE))) AS BIGINT) AS weight
  FROM tok
),
tw AS (SELECT SUM(weight) AS wsum FROM w),
quota AS (
  SELECT lang, n_docs, toks, weight,
         ({MIX_BUDGET} * weight) // (SELECT wsum FROM tw) AS base,
         ({MIX_BUDGET} * weight) % (SELECT wsum FROM tw) AS rem
  FROM w
),
lo AS (SELECT {MIX_BUDGET} - SUM(base) AS leftover FROM quota),
ranked AS (
  SELECT lang, n_docs, toks, weight, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
  FROM quota
)
SELECT lang, n_docs, toks, weight,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM lo)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked ORDER BY lang
""",
)
def pipe_mixture_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture BUDGET apportionment: split a fixed sampling
    budget of {MIX_BUDGET} slots across languages by α=0.5
    exponent-smoothed mass (weight = ⌊√tokens⌋ — the multilingual
    sub-linear sampling recipe: low-resource languages get a larger
    share than raw proportional, high-resource ones saturate), using
    LARGEST-REMAINDER (Hamilton) apportionment so the integer
    allocations sum EXACTLY to the budget — the piece proportional
    rounding gets wrong. Complements pipe_mixture_sampling (which
    applies per-source keep RATES); this query is where those rates
    come from.

    Cross-engine exactness: token counts are integers; √ is the
    IEEE-correctly-rounded sqrt in both engines (the ivf_n_cells
    discipline) and floor of it is deterministic; quotas/remainders
    are pure bigint div/mod; the remainder ranking breaks ties by
    lang. No FP comparison anywhere near a decision boundary.

    Scale: one partial-aggregable groupBy over the corpus (tokens per
    language — the only data-sized pass), then everything downstream
    operates on |languages| rows: the weight sum is a 1-row broadcast
    attach, the remainder rank a value-domain-bounded window. At
    100 TB the apportionment itself costs the same as at 100 MB.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("toks"),
    )
    w = tok.withColumn(
        "weight", F.floor(F.sqrt(F.col("toks").cast("double"))).cast("bigint")
    )
    tw = w.agg(F.sum("weight").alias("wsum"))
    quota = w.crossJoin(F.broadcast(tw)).select(
        "lang",
        "n_docs",
        "toks",
        "weight",
        F.expr(f"CAST({MIX_BUDGET} * weight AS BIGINT) div wsum").alias("base"),
        F.expr(f"CAST({MIX_BUDGET} * weight AS BIGINT) % wsum").alias("rem"),
    )
    lo = quota.agg((F.lit(MIX_BUDGET) - F.sum("base")).alias("leftover"))
    ranked = quota.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "lang")),
    )
    return (
        ranked.crossJoin(F.broadcast(lo))
        .select(
            "lang",
            "n_docs",
            "toks",
            "weight",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("lang")
    )
