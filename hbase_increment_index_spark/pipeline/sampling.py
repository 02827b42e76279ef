"""Dataset sampling / splitting / packing — the training-data-pipeline
operators a 100 TB corpus job runs after dedup and quality filtering
(BASELINE.json north_star: LLM-data-pipeline operators beyond the
reference surface).

Everything here is DETERMINISTIC BY CONTENT — assignment is a pure
function of the row's id via the portable hash, never an RNG:

- reruns and backfills produce the same split (reproducible training);
- no shuffle is needed for split/sample — they're narrow projections
  and filters, embarrassingly parallel at any scale;
- the DuckDB oracle computes the identical assignment, so these are
  value-checked, not just row-counted.

Packing is the one operator that needs an order: it windows a running
token total per shard (shard = hash of id), so the only shuffle is on
the shard key — bounded parallelism with deterministic output, instead
of a single global sort that would bottleneck at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_increment_index_spark.pipeline.dedup import portable_hash60

# Assignment granularity: hash is reduced mod 1e6 and compared against
# frac * 1e6 — exact integer thresholds, no float comparison drift.
_BUCKETS = 1_000_000


def _unit_bucket(id_col: Column | str, salt: str) -> Column:
    """Deterministic bucket in [0, 1e6) from (salt, id). The salt keeps
    independent decisions (split vs sample) uncorrelated — same idea as
    seeding two RNG streams, but content-addressed."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(portable_hash60(F.concat(F.lit(salt + ":"), c.cast("string"))), F.lit(_BUCKETS))


def train_val_split(
    df: DataFrame,
    id_col: str,
    val_frac: float = 0.1,
    test_frac: float = 0.0,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' / 'val' / 'test') by hashed id.

    Fractions are exact integer thresholds on a 1e6-bucket hash, so
    expected proportions hold corpus-wide and every executor decides a
    row locally (no shuffle, no coordination)."""
    b = _unit_bucket(id_col, salt)
    val_hi = int(val_frac * _BUCKETS)
    test_hi = val_hi + int(test_frac * _BUCKETS)
    split = (
        F.when(b < F.lit(val_hi), F.lit("val"))
        .when(b < F.lit(test_hi), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (domain-mixing
    downsampling: e.g. keep 100% of books, 10% of web crawl).

    A filter over a narrow projection — no shuffle, no sampleBy RNG;
    the kept set is stable across reruns and cluster sizes."""
    b = _unit_bucket(id_col, salt)
    thresh = F.lit(int(default_frac * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))).otherwise(thresh)
    return df.filter(b < thresh)


def pack_batches(
    df: DataFrame,
    id_col: str,
    token_col: Column | str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each document a (shard, batch_id) so every batch holds
    consecutive docs totalling ~``budget`` tokens (sequence packing for
    training). batch_id = exclusive-prefix-sum(tokens) div budget
    within the shard, docs ordered by id — a document that crosses a
    budget boundary starts the next batch's count but stays whole.

    Sharding first (by hashed id) keeps the window partition bounded:
    the shuffle is on ``n_shards`` keys sized corpus/n_shards, not one
    global sort. Deterministic: same corpus → same batches, regardless
    of parallelism."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = F.pmod(portable_hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), F.lit(n_shards))
    staged = df.withColumn("shard", shard).withColumn("_tok", tok)
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    prefix_excl = F.coalesce(
        F.sum("_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        staged.withColumn("batch_id", F.floor(prefix_excl / F.lit(budget)).cast("long"))
        .drop("_tok")
    )


def token_budget_head(
    df: DataFrame,
    id_col: str,
    token_col: Column | str,
    budget: int,
    n_shards: int = 32,
    salt: str = "head",
) -> DataFrame:
    """Deterministic token-budget head: the documents whose cumulative
    token count, in content-addressed order, stays ≤ ``budget`` — "take
    the first 50B tokens of the corpus" as one reproducible, order-
    stable operator (a doc that would cross the budget is excluded
    whole; same corpus + salt ⇒ same head at any parallelism).

    Plan — a distributed EXCLUSIVE-free prefix sum, never one global
    window: the global order is a 60-bit content hash whose TOP bits
    define ``n_shards`` order-contiguous shards, so (a) a per-shard
    window computes local inclusive prefix sums over corpus/n_shards
    rows, (b) a shard-level aggregate (n_shards rows) turns into
    per-shard starting offsets via one tiny window, broadcast back,
    and (c) the keep filter is offset + local_prefix ≤ budget. The only
    corpus-wide movement is the shard repartition implied by the
    window; the cross-shard coupling travels through n_shards rows.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    h = portable_hash60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # top bits → shard: shard boundaries are contiguous hash ranges, so
    # (shard asc, h asc, id asc) IS the global hash order
    shard = F.floor(h / F.lit((1 << 60) // n_shards)).cast("int")
    staged = df.withColumn("_h", h).withColumn("_shard", shard).withColumn("_tok", tok)

    w = Window.partitionBy("_shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    staged = staged.withColumn("_local", F.sum("_tok").over(w))

    shard_tot = staged.groupBy("_shard").agg(F.max("_local").alias("_tot"))
    w_off = Window.orderBy(F.col("_shard").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = shard_tot.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_shard", "_off")

    return (
        staged.join(F.broadcast(offsets), "_shard")
        .filter(F.col("_off") + F.col("_local") <= F.lit(budget))
        .drop("_h", "_shard", "_tok", "_local", "_off")
    )


def temperature_resample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    source_col: str,
    alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual-sampling
    mixture rule (p_s ∝ tokens_s^alpha; alpha=1 keeps the natural
    mixture, alpha→0 approaches uniform-over-sources; the exponential
    smoothing used for multilingual pretraining corpora, e.g. XLM-R,
    Conneau et al. 2020 §3).

    Per-source keep rate r_s = min(1, p_s · T / tokens_s) with
    T = total corpus tokens — heavy sources are downsampled toward the
    tempered share, light sources keep everything (no upsampling /
    duplication). Rows are then kept by the content-addressed hash, so
    the sample is rerun-stable like every sampler in this module.

    Adds ``keep_rate`` (rounded) and filters to the kept rows.

    Plan: one hash agg on the low-cardinality source key (a handful of
    rows), a single-partition window over that TINY frame to normalize
    weights, broadcast-join the rates back, then a narrow filter — the
    corpus is scanned once and never shuffled.

    Numerics are determinism-hardened for the oracle (and for retry
    stability at scale): token totals are summed in INTEGER space
    (pass an integer token count), and the tempered weight is
    quantized to integer micro-units (floor(t^alpha · 1e6 + 0.5))
    BEFORE normalization — so every cross-row sum is exact under any
    partitioning/association order, and the remaining float ops are a
    fixed-association chain of exactly-agreed inputs. alpha=0.5 uses
    sqrt (correctly rounded per IEEE-754 in both engines); other
    alphas go through pow, whose last-ulp behavior is engine-specific
    — value-check those with rounded rates only.
    """
    per_src = df.groupBy(source_col).agg(F.sum(token_col).alias("_toks"))
    td = F.col("_toks").cast("double")
    w = F.sqrt(td) if alpha == 0.5 else F.pow(td, F.lit(alpha))
    wq = F.floor(w * F.lit(1e6) + F.lit(0.5)).cast("long")  # integer micro-weights
    tiny = Window.partitionBy()  # whole frame = n_sources rows
    rates = (
        per_src.withColumn("_wq", wq)
        .withColumn(
            "_rate",
            F.least(
                F.lit(1.0),
                F.col("_wq").cast("double")
                / F.sum("_wq").over(tiny).cast("double")
                * F.sum("_toks").over(tiny).cast("double")
                / td,
            ),
        )
        .select(source_col, "_rate")
    )
    b = _unit_bucket(id_col, salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(b < F.floor(F.col("_rate") * F.lit(float(_BUCKETS))))
        .withColumn("keep_rate", F.round("_rate", 6))
        .drop("_rate")
    )


def deterministic_shuffle(df: DataFrame, id_col: str, salt: str = "shuffle") -> DataFrame:
    """Reproducible corpus shuffle for training order: a content-
    addressed ``shuffle_key`` (md5 of salt:id) whose sort order IS the
    shuffled order — rerun-stable under any partitioning, restartable
    mid-epoch (resume = filter key > last seen), and re-seedable per
    epoch by changing the salt.

    A pure projection: no shuffle is added here. Materialize the order
    with ``sinks.export_sorted(out, path, ["shuffle_key"])`` — range-
    partitioned parallel write, never a single global sort funnel; a
    training job then reads files in name order for the full epoch
    permutation."""
    return df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    key_decimals: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: keep the ``n`` rows with
    the largest Efraimidis–Spirakis key u^(1/w) (IPL 2006) — the
    standard distributed weighted reservoir, here with u derived from
    the portable content hash instead of an RNG, so the selected set is
    a pure function of (salt, ids, weights): rerun-stable at any
    parallelism, like every sampler in this module.

    Ranked on ln(u)/w (monotone in u^(1/w)), rounded so both engines
    rank identical keys; ties break on id. Rows with non-positive
    weight are excluded (zero weight = never sampled).

    Plan: narrow projection → TakeOrderedAndProject(n) — per-partition
    heaps and a driver merge of n·P candidates, no global sort.
    """
    b = _unit_bucket(id_col, salt)
    u = (b.cast("double") + F.lit(0.5)) / F.lit(float(_BUCKETS))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, key_decimals)
    return (
        df.filter(w > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_phases: int = 4,
    salt: str = "curriculum",
) -> DataFrame:
    """Curriculum training order: bucket documents into quality phases
    (phase 0 = highest-scoring = served first, the standard
    easy/clean-first curriculum) and shuffle deterministically WITHIN
    each phase. ``score_col`` must be in [0, 1] — e.g. the hashed
    linear classifier's ``clf_score`` or the heuristic quality score.

    Phase boundaries are fixed thresholds (floor((1-score)·n)), NOT
    ntile: a global ntile needs a full sort/rank over the corpus,
    while thresholding is a zero-shuffle projection that scales
    embarrassingly. The within-phase order is the content-addressed
    md5 key of :func:`deterministic_shuffle` — rerun-stable,
    restartable, re-seedable via ``salt``. Materialize with
    ``sinks.export_sorted(out, path, ["phase", "order_key"])``.
    """
    phase = F.least(
        F.floor((F.lit(1.0) - F.col(score_col)) * n_phases).cast("int"),
        F.lit(int(n_phases) - 1),
    )
    return df.select(
        F.col(id_col),
        F.col(score_col),
        phase.alias("phase"),
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))).alias(
            "order_key"
        ),
    )
