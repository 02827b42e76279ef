"""Text analysis — SURVEY.md §2.3 E4: token counting, quality scoring,
language identification, document fingerprinting.

All pure JVM-side expressions (codegen'd, no Python in the row path):
these run as a single narrow projection over the corpus — the ideal
shape at 100 TB (no shuffle at all until an aggregation is asked for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.tokenize import posting_list, tokens

# Tiny per-language function-word lists for the n-gram/stopword
# language-ID heuristic. Deliberately small and ASCII-safe so the same
# lists inline into the DuckDB oracle SQL.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "para", "con", "por"),
    "zh": ("de", "shi", "le", "bu", "wo", "ni", "ta", "men", "zai", "you"),
}


def token_count(text_col: Column | str) -> Column:
    """Whitespace/punct token count (the `wc -w`-style budget number)."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """BPE-approximate token count: word-piece-ish segments — runs of
    letters, runs of digits, or single non-space symbols. A cheap,
    deterministic proxy for tokenizer budgeting when the real
    tokenizer is out of process.

    Implemented with regexp_extract_all (RE2-compatible pattern, no
    lookarounds) so the DuckDB oracle is the same expression:
    ``len(regexp_extract_all(lower(c), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))``.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, punctuation
    and stopword ratios, plus a [0,1] composite quality score.

    The score formula is fixed and documented (not learned): docs that
    are long enough, word-like, and stopword-bearing score high —
    the standard pre-training corpus filter shape.
    """
    c = F.col(text_col)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])

    # stage 1: materialize the token array and raw counts once — the
    # derived ratios reference them many times, and projection staging
    # keeps the expensive regexp/HOF work single-evaluation
    staged = df.withColumns(
        {
            "_toks": tokens(c),
            "_n_chars": F.length(c),
            "_n_nospace": F.length(F.regexp_replace(c, r"\s+", "")),
            "_n_nopunct": F.length(F.regexp_replace(c, r"[^\w\s]", "")),
        }
    ).withColumns(
        {
            "_n_tok": F.size("_toks"),
            "_n_stop": F.size(F.filter("_toks", lambda t: F.array_contains(en_stop, t))),
        }
    )

    n_tok = F.col("_n_tok")
    n_chars = F.col("_n_chars")
    n_punct = n_chars - F.col("_n_nopunct")
    avg_tok_len = F.when(n_tok > 0, F.col("_n_nospace") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.col("_n_stop") / n_tok).otherwise(F.lit(0.0))
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_score = F.when((avg_tok_len >= 2) & (avg_tok_len <= 12), 1.0).otherwise(0.0)
    quality = F.round(
        F.lit(0.4) * length_score
        + F.lit(0.3) * word_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    return staged.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def source_quality_rollup(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    low_threshold: float = 0.5,
) -> DataFrame:
    """Per-source curation dashboard: doc and token volume, mean
    quality, and the low-quality share — the aggregate a pipeline
    operator reads before deciding which sources to down-weight.

    Composition of :func:`quality_features` (pure projection) with one
    hash aggregate on the source key; sums go through exact decimals
    (numeric.py) so the mean is order-independent and oracle-stable.
    Sources are low-cardinality, so the shuffle carries one partial
    row per (partition, source) — linear scan at any scale.
    """
    from hbase_increment_index_spark.numeric import exact_avg, exact_sum

    feat = quality_features(df, text_col)
    low = F.when(F.col("quality_score") < F.lit(low_threshold), 1).otherwise(0)
    return (
        feat.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(exact_avg("quality_score"), 6).alias("mean_quality"),
            F.sum(low).cast("long").alias("n_low_quality"),
        )
        .withColumn(
            "low_quality_share",
            F.round(F.col("n_low_quality") / F.col("n_docs"), 6),
        )
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: count function-word hits per language,
    argmax with lexicographic tie-break ('und' = no hits anywhere).

    One projection, no shuffle; the stopword lists are literals inside
    the codegen'd expression (nothing broadcast, nothing Python).
    """
    toks = tokens(text_col)

    def _hits(stop):
        # single-arg lambda: a second parameter would make PySpark pass the
        # element index, not the captured stoplist
        return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))

    scores = []
    for lang in sorted(STOPWORDS):
        stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(F.struct(_hits(stop).alias("hits"), F.lit(lang).alias("lang")))
    arr = F.array(*scores)
    max_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    tied = F.filter(arr, lambda s: s["hits"] == max_hits)
    winner = F.array_min(F.transform(tied, lambda s: s["lang"]))
    return df.select(
        "*",
        F.when(max_hits > 0, winner).otherwise(F.lit("und")).alias(out_col),
        max_hits.alias("lang_pred_hits"),
    )


def fingerprint(text_col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text. Identical function exists in DuckDB (``md5``), so exact-dedup
    joins on this column are oracle-checkable."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(norm)


# PII patterns (applied in order; counts are measured on the raw text).
# RE2-compatible (no lookarounds/backrefs) so the DuckDB oracle runs the
# identical patterns; ``\b`` and ``\d`` mean the same in Java regex and RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4s /
    phone-shaped numbers with typed placeholder tokens and report
    per-doc match counts.

    One narrow projection (regexp_replace chain, codegen'd, no
    shuffle). Replacement order matters: emails go first so their
    digit-bearing local parts can't later match the phone pattern;
    placeholders contain no digits, so later patterns never touch
    earlier redactions.
    """
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    out = c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return df.select("*", *counts, out.alias(out_col))


def repetition_features(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/boilerplate signals per document
    (Rae et al., "Scaling Language Models: ... Gopher", 2021, §A1.1):
    type-token ratio, duplicate-bigram and duplicate-trigram fractions,
    and the fraction of tokens taken by the single most frequent token.
    High duplicate fractions flag boilerplate/spam for corpus filtering.

    All per-row array expressions (no shuffle). The top-token scan is
    O(distinct·tokens) per row — bounded by document length, which a
    real pipeline caps upstream; at 100 TB this stays embarrassingly
    parallel map work.
    """
    from hbase_increment_index_spark.pipeline.dedup import shingle_grams

    toks = tokens(text_col)

    def frac_dup(grams) -> Column:
        n = F.size(grams)
        return F.when(
            n > 0, F.round(1 - F.size(F.array_distinct(grams)) / n, 6)
        ).otherwise(F.lit(0.0))

    staged = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        shingle_grams(text_col, 2).alias("_bi"),
        shingle_grams(text_col, 3).alias("_tri"),
    )
    n_tok = F.size("_toks")
    distinct_toks = F.array_distinct("_toks")
    top_count = F.array_max(
        F.transform(
            distinct_toks,
            lambda t: F.size(F.filter(F.col("_toks"), lambda x: x == t)),
        )
    )
    return staged.select(
        id_col,
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.round(F.size(distinct_toks) / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("type_token_ratio"),
        frac_dup(F.col("_bi")).alias("dup_bigram_frac"),
        frac_dup(F.col("_tri")).alias("dup_trigram_frac"),
        F.when(n_tok > 0, F.round(top_count / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_frac"),
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus term frequencies (top-N vocabulary view): one explode
    feeding a two-phase aggregation — (term, doc) partial with map-side
    combine, then a term-keyed final where tf = sum of partial counts
    and df = row count. This avoids the Expand operator Spark plans for
    `count(DISTINCT doc)` (which duplicates every exploded token row
    before the shuffle); the (term, doc) partial collapses repeated
    tokens within a document on the map side, so the shuffle carries at
    most one row per (term, doc) pair instead of one per token."""
    partial = (
        posting_list(df, id_col, text_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("_tf_part"))
    )
    return partial.groupBy("term").agg(
        F.sum("_tf_part").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, decimals: int = 5
) -> DataFrame:
    """Self-trained unigram language-model quality score — the
    CCNet/C4-family perplexity filter with the corpus itself as the LM
    (no external model): per document, the mean negative log-likelihood
    of its tokens under corpus unigram frequencies. High = improbable
    token mix (gibberish, OCR noise, exotic boilerplate); filter on a
    threshold or take the tails.

    Plan: one explode feeds BOTH the vocabulary aggregate and the
    per-(doc,term) tf aggregate (map-side combined); the corpus total
    rides a 1-row broadcast cross join; vocabulary joins back on term
    (Zipf-bounded — at 100 TB this is a shuffle join on term whose
    build side is the vocabulary, never the corpus). Per-doc mean is
    rounded like the TF-IDF scores (search.ranking) so the value-hash
    is engine-portable.
    """
    toks = posting_list(df, id_col, text_col)
    doc_tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf_d"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    total = vocab.agg(F.sum("ctf").cast("double").alias("n_total"))
    return (
        doc_tf.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf_d").alias("n_tokens"),
            F.round(
                -F.sum(F.col("tf_d") * F.log(F.col("ctf") / F.col("n_total")))
                / F.sum("tf_d"),
                decimals,
            ).alias("nll"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    context-window preprocessing step between cleaning and packing in
    a training pipeline (stride < max_tokens gives the standard
    sliding-window overlap; stride == max_tokens is disjoint chunks).

    Chunk starts are token positions 1, 1+stride, 2·stride+1, … ≤ doc
    length, so every token lands in ≥1 chunk and the final chunk may
    run short. Emits (id, chunk_idx, n_chunk_tokens, chunk_text) —
    a pure array projection + explode. The HOF tokenize+slice work is
    CPU-heavy map-side work, so the input is fan_out-aligned to cores
    (no-op when the scan already has enough splits; measured 2.5 s →
    0.4 s on a single-row-group sf0.1 fixture).
    """
    from hbase_increment_index_spark.functions.layout import fan_out

    df = fan_out(df)
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(max_tokens), n - s + 1).alias("n_chunk_tokens"),
            F.array_join(F.slice(toks, s, max_tokens), " ").alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-rule gate (Rae et al. 2021 §A1.1, the standard
    pretraining heuristic filter): per-rule booleans + composite keep.

    Rules (defaults = the published thresholds, word-level):
      r_words:  min_words <= word count <= max_words
      r_len:    min_mean_len <= mean word length <= max_mean_len
      r_alpha:  >= min_alpha_ratio of words contain an alphabetic char
      r_stop:   >= min_stop_hits hits from the English function-word
                list (Gopher's "contains at least 2 stop words")

    One pure projection over the token array — zero shuffle; compose
    with `exact_dedup`/classifier stages without materialization
    barriers. Symbol/bullet-line ratio rules from the paper are
    line-oriented and fold into the same projection when the corpus
    carries raw (un-normalized) text.
    """
    c = F.col(text_col)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    staged = df.withColumns({"_toks": tokens(c)}).withColumns(
        {
            "_n": F.size("_toks"),
            "_n_alpha": F.size(F.filter("_toks", lambda t: t.rlike("[a-z]"))),
            "_n_stop": F.size(F.filter("_toks", lambda t: F.array_contains(en_stop, t))),
            "_sum_len": F.aggregate(
                F.transform("_toks", F.length),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
        }
    )
    n = F.col("_n")
    mean_len = F.when(n > 0, F.col("_sum_len") / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n > 0, F.col("_n_alpha") / n).otherwise(F.lit(0.0))
    r_words = (n >= min_words) & (n <= max_words)
    r_len = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    r_alpha = alpha_ratio >= min_alpha_ratio
    r_stop = F.col("_n_stop") >= min_stop_hits
    return staged.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.col("_n_stop").alias("n_stop_hits"),
        r_words.cast("int").alias("r_words"),
        r_len.cast("int").alias("r_len"),
        r_alpha.cast("int").alias("r_alpha"),
        r_stop.cast("int").alias("r_stop"),
        (r_words & r_len & r_alpha & r_stop).cast("int").alias("keep"),
    )


def gopher_rules_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_rules` over ``documents`` (kept
    adjacent so the two stay in lockstep)."""
    toks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    stop = "['" + "', '".join(STOPWORDS["en"]) + "']"
    return f"""
WITH staged AS (
  SELECT doc_id,
         len({toks}) AS n,
         len(list_filter({toks}, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
         len(list_filter({toks}, t -> list_contains({stop}, t))) AS n_stop,
         list_sum(list_transform({toks}, t -> CAST(length(t) AS BIGINT))) AS sum_len
  FROM documents
),
feat AS (
  SELECT doc_id, n,
         CASE WHEN n > 0 THEN CAST(sum_len AS DOUBLE) / n ELSE 0.0 END AS mean_len,
         CASE WHEN n > 0 THEN CAST(n_alpha AS DOUBLE) / n ELSE 0.0 END AS alpha_ratio,
         n_stop
  FROM staged
)
SELECT doc_id,
       n AS n_words,
       ROUND(mean_len, 6) AS mean_word_len,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       n_stop AS n_stop_hits,
       CAST(n >= {min_words} AND n <= {max_words} AS INT) AS r_words,
       CAST(mean_len >= {min_mean_len} AND mean_len <= {max_mean_len} AS INT) AS r_len,
       CAST(alpha_ratio >= {min_alpha_ratio} AS INT) AS r_alpha,
       CAST(n_stop >= {min_stop_hits} AS INT) AS r_stop,
       CAST(n >= {min_words} AND n <= {max_words}
            AND mean_len >= {min_mean_len} AND mean_len <= {max_mean_len}
            AND alpha_ratio >= {min_alpha_ratio}
            AND n_stop >= {min_stop_hits} AS INT) AS keep
FROM feat
ORDER BY doc_id ASC
"""


def bigram_logprob_backoff(
    score_df: DataFrame,
    lm_df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
    decimals: int = 5,
) -> DataFrame:
    """Bigram language-model quality score with stupid backoff (Brants
    et al. 2007, "Large Language Models in Machine Translation" — the
    unnormalized backoff used at corpus scale because it needs no
    discounting pass): score ``score_df`` documents under a bigram LM
    trained on ``lm_df`` (held-out split, so unseen bigrams actually
    occur, unlike the self-trained unigram form e12):

        lp(u,w) = ln( c2(u,w) / c1(u) )            if the bigram is seen
                = ln( α · (c1(w)+1) / (N+V) )      otherwise (backoff to
                                                   add-one unigram)

    Per-doc output: token count and mean negative log-likelihood over
    its bigram occurrences.

    Plan: corpus-side c2/c1 aggregates are Zipf-bounded build sides
    joined on the gram/term keys (never corpus-sized); N/V ride a
    1-row broadcast; the scored side contributes one (doc, gram) agg.
    Same shuffle class as E12 plus one more vocabulary join.
    """
    from hbase_increment_index_spark.pipeline.dedup import shingle_grams
    from hbase_increment_index_spark.search.tokenize import posting_list

    lm_toks = posting_list(lm_df, id_col, text_col)
    c1 = lm_toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    totals = c1.agg(
        F.sum("c1").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    lm_bi = (
        lm_df.select(F.explode(shingle_grams(text_col, 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )

    doc_bi = (
        score_df.select(F.col(id_col), F.explode(shingle_grams(text_col, 2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("tf_b"))
        .withColumn("u", F.split(F.col("g"), " ")[0])
        .withColumn("w", F.split(F.col("g"), " ")[1])
    )
    joined = (
        doc_bi.join(lm_bi, "g", "left")
        .join(c1.withColumnsRenamed({"term": "u", "c1": "c1u"}), "u", "left")
        .join(c1.withColumnsRenamed({"term": "w", "c1": "c1w"}), "w", "left")
        .crossJoin(F.broadcast(totals))
    )
    lp = F.when(
        F.col("c2").isNotNull() & F.col("c1u").isNotNull(),
        F.log(F.col("c2") / F.col("c1u")),
    ).otherwise(
        F.log(
            F.lit(float(alpha))
            * (F.coalesce(F.col("c1w"), F.lit(0)) + F.lit(1.0))
            / (F.col("n_total") + F.col("v_size"))
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("tf_b").alias("n_bigrams"),
            F.round(-F.sum(F.col("tf_b") * lp) / F.sum("tf_b"), decimals).alias("nll"),
        )
    )
