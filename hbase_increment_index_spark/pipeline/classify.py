"""Model-based quality classification — SURVEY.md §2.3 E4/E12
companion: a fastText-style hashed linear classifier as a pure
column expression.

The standard LLM-corpus curation stack runs a cheap linear text
classifier over every document (fastText quality/topic filters in
CCNet, GPT-3's Wikipedia-vs-CommonCrawl LR filter, RedPajama/Dolma's
quality taggers). The model is: hash each token into one of ``dim``
buckets, average the bucket weights, squash through a sigmoid.
Inference is embarrassingly parallel and needs no Python at all —
exactly the shape Spark executes best: a per-row higher-order-function
expression inside whole-stage codegen, zero shuffle, zero UDF.

Weight storage: real deployments broadcast a trained weight vector
(a ``dim``-row table joined by bucket id, or a literal array). Here
the weights are derived deterministically from the portable 60-bit
md5 hash so the DuckDB oracle can rebuild them bit-for-bit —
swapping in trained weights changes one expression, not the plan.

Numeric portability: per-token weights are INTEGER milli-units
(hash % 2001 - 1000 ∈ [-1000, 1000]); the per-doc sum is exact
integer arithmetic (no float-order sensitivity in either engine) and
converts to double exactly once, at the final sigmoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.pipeline.dedup import PORTABLE_HASH60_SQL, portable_hash60
from hbase_increment_index_spark.search.tokenize import tokens


def _weight_milli(token: Column, dim: int, seed: str) -> Column:
    """Integer milli-weight of a token's hash bucket, in [-1000, 1000]."""
    bucket = portable_hash60(token) % F.lit(int(dim))
    return (
        portable_hash60(F.concat(F.lit(seed + ":"), bucket.cast("string")))
        % F.lit(2001)
        - F.lit(1000)
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    seed: str = "qclf",
    bias: float = 0.0,
    score_decimals: int = 6,
) -> DataFrame:
    """Per-document classifier probability + keep label.

    score(d) = sigmoid(bias + mean_t w[h(t) mod dim]); empty docs get
    the bias-only prior. One projection over the corpus: the token
    fold is a sequential integer ``aggregate`` per row.
    """
    toks = tokens(text_col)
    sum_milli = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + _weight_milli(t, dim, seed),
    )
    n = F.size(toks)
    logit = F.lit(float(bias)) + F.when(
        n > 0, sum_milli.cast("double") / (F.lit(1000.0) * n)
    ).otherwise(F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(prob, score_decimals).alias("clf_score"),
        (F.round(prob, score_decimals) >= 0.5).cast("int").alias("keep"),
    )


def hashed_linear_sql(
    dim: int = 1024, seed: str = "qclf", bias: float = 0.0, score_decimals: int = 6
) -> str:
    """DuckDB twin of :func:`hashed_linear_score` over ``documents``
    (kept adjacent to the Spark expression so the two stay in lockstep)."""
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    bucket = PORTABLE_HASH60_SQL.format(c="t") + f" % {int(dim)}"
    w = (
        PORTABLE_HASH60_SQL.format(c=f"'{seed}:' || CAST({bucket} AS VARCHAR)")
        + " % 2001 - 1000"
    )
    return f"""
WITH scored AS (
  SELECT doc_id,
         len({toks}) AS n_tokens,
         list_sum(list_transform({toks}, t -> CAST({w} AS BIGINT))) AS sum_milli
  FROM documents
)
SELECT doc_id, n_tokens,
       ROUND(1.0 / (1.0 + exp(-({float(bias)} + CASE WHEN n_tokens > 0
                 THEN CAST(sum_milli AS DOUBLE) / (1000.0 * n_tokens)
                 ELSE 0.0 END))), {int(score_decimals)}) AS clf_score,
       CAST(ROUND(1.0 / (1.0 + exp(-({float(bias)} + CASE WHEN n_tokens > 0
                 THEN CAST(sum_milli AS DOUBLE) / (1000.0 * n_tokens)
                 ELSE 0.0 END))), {int(score_decimals)}) >= 0.5 AS INT) AS keep
FROM scored
"""
