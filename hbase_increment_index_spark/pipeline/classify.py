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


# ------------------------------------------------------------- DSIR


def dsir_importance(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
    decimals: int = 9,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by the log-likelihood ratio of its hashed-unigram
    features under a target-distribution model vs the raw-corpus
    model — the signal DSIR resamples on to skew pretraining data
    toward a target domain.

    Model: tokens hash into ``n_buckets`` buckets; each side gets
    add-one-smoothed bucket probabilities; a document's score is
    Σ_b c_b · (ln p_target[b] − ln p_raw[b]) over its bucket counts.

    Plan shape (the 100 TB story): the two bucket-count aggregates are
    ``n_buckets``-row frames (tiny, broadcast); the per-doc bucket
    counts are one (doc, bucket) map-side-combined agg over the corpus
    scan; the final score joins the broadcast log-ratio table and
    reduces per doc. One corpus-wide shuffle on (doc, bucket), bounded
    fan-in per doc. Numeric portability: per-bucket log-ratios are
    rounded once, and the per-doc Σ c_b·lr_b rides an exact decimal
    sum — order-independent under any partitioning (numeric.py
    argument), so retries/AQE never change scores.
    """
    from hbase_increment_index_spark.numeric import dec

    B = int(n_buckets)

    def bucketed(df: DataFrame):
        return df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
        ).select(F.col(id_col), (portable_hash60(F.col("_tok")) % F.lit(B)).alias("bucket"))

    # Measured note (sf0.1, local[32]): deriving the raw model from the
    # per-doc counts (one tokenize pass) or fanning the explode out both
    # LOSE to this plain two-pass shape — the extra shuffle costs more
    # than the duplicated map work on a corpus this wide-per-row. At
    # real scale the doc_counts frame is the natural checkpoint if the
    # double scan ever dominates.
    tgt_counts = (
        bucketed(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    )
    raw_counts = (
        bucketed(corpus).groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    )
    tgt_total = tgt_counts.agg(F.sum("ct").alias("nt"))
    raw_total = raw_counts.agg(F.sum("cr").alias("nr"))

    # dense 0..B-1 bucket frame so zero-count buckets still smooth
    spark = corpus.sparkSession
    all_buckets = spark.range(B).select(F.col("id").alias("bucket"))
    lr = (
        all_buckets.join(F.broadcast(tgt_counts), "bucket", "left")
        .join(F.broadcast(raw_counts), "bucket", "left")
        .crossJoin(F.broadcast(tgt_total))
        .crossJoin(F.broadcast(raw_total))
        .select(
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / (F.col("nt") + F.lit(float(B))))
                - F.log((F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0)) / (F.col("nr") + F.lit(float(B)))),
                decimals,
            ).alias("lr"),
        )
    )
    doc_counts = (
        bucketed(corpus).groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("cb"))
    )
    return (
        doc_counts.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(dec(F.col("cb") * F.col("lr"), decimals)).cast("double").alias("dsir_logratio")
        )
    )
