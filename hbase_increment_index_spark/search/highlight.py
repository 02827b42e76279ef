"""Suggester + highlighting — the remaining pieces of the Solr
`select`-handler surface the reference delegates queries to
(SURVEY.md §2.2; Solr suggest/spellcheck and highlighting components
a "搭建一套solr" deployment exposes alongside q/fq/facet).

Both are single-pass, shuffle-light plans:

- suggest: postings explode → prefix filter (pushed into the scan's
  projection) → groupBy(term) with map-side combine → top-k. The
  vocabulary aggregate is tiny; at 100 TB you'd serve it from the
  materialized inverted index (search.inverted) instead of re-scanning.
- snippets: a pure per-row projection (tokenize → first-match position
  → slice a window) — zero shuffle, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.tokenize import tokens


def suggest_terms(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """Top-k vocabulary completions for ``prefix`` ranked by corpus
    frequency (Solr suggester semantics: popular terms first, ties
    lexicographic). Returns (term, freq)."""
    return (
        corpus.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )


def suggest_terms_infix(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    fragment: str,
    k: int = 10,
) -> DataFrame:
    """Solr AnalyzingInfixSuggester semantics: completions whose match
    is ANYWHERE in the term, not just the prefix (the suggester Solr
    ships for mid-word lookahead). Same single-pass plan as
    suggest_terms — the contains filter can't use dictionary-page
    pruning like a prefix can, but it still lands pre-shuffle in the
    scan projection, and the aggregate output stays vocabulary-
    bounded. Returns (term, freq), freq desc then term asc."""
    return (
        corpus.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").contains(fragment))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )


def suggest_terms_from_index(postings: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Suggester served from the materialized (term, id, tf) postings:
    corpus frequency = SUM(tf) per term — no corpus scan, and with the
    index range-partitioned by term the prefix filter prunes to a few
    files. Identical output to ``suggest_terms``."""
    return (
        postings.filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )


def terms_component_from_index(
    postings: DataFrame,
    prefix: str | None = None,
    k: int = 20,
    regex: str | None = None,
) -> DataFrame:
    """Terms component served from the postings: docfreq = row count
    per term (rows are distinct (term, id)). Identical output to
    ``terms_component``; one vocabulary-bounded hash agg, zero corpus
    tokenization. ``regex`` = Solr ``terms.regex`` (full-match
    semantics, like Lucene's RegexpQuery); prefix stays sargable,
    regex filters the aggregated vocabulary."""
    p = postings
    if prefix is not None:
        p = p.filter(F.col("term").startswith(prefix))
    if regex is not None:
        p = p.filter(F.col("term").rlike(f"^(?:{regex})$"))
    return (
        p.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("docfreq"))
        .orderBy(F.col("docfreq").desc(), F.col("term").asc())
        .limit(k)
    )


def terms_component(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    prefix: str | None = None,
    k: int = 20,
) -> DataFrame:
    """Solr terms component (``terms.fl``/``terms.prefix``): vocabulary
    enumeration with DOCUMENT frequency — distinct docs containing the
    term, unlike the suggester's total-occurrence count. Returns
    (term, docfreq) ranked df-desc, term-asc. (Solr select-handler
    surface per reference README.md:5-10; SURVEY.md §2.2 Q-TRM.)

    Plan: explode → optional prefix filter → countDistinct(id) per
    term. Spark plans countDistinct as two-phase partial aggregation
    (map-side dedupe of (term, id) before the shuffle), so the exchange
    carries at most one row per distinct pair per task — vocabulary-
    bounded, not corpus-bounded, at 100 TB.
    """
    from hbase_increment_index_spark.search.tokenize import posting_list

    postings = posting_list(corpus, id_col, text_col)
    if prefix is not None:
        postings = postings.filter(F.col("term").startswith(prefix))
    return (
        postings.groupBy("term")
        .agg(F.countDistinct(F.col(id_col)).alias("docfreq"))
        .orderBy(F.col("docfreq").desc(), F.col("term").asc())
        .limit(k)
    )


def snippets_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    term: str,
    window: int = 3,
    max_snippets: int = 3,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Multi-fragment highlighting — Solr ``hl.snippets=N`` with
    ``hl.tag.pre``/``hl.tag.post``: for documents containing ``term``,
    one row per occurrence (up to ``max_snippets``, in document order),
    each a ``window``-token context with the hit token wrapped in the
    configured tags. The per-row shape every Solr search UI pages.

    Returns (id, snippet_no, pos, snippet): snippet_no is 1-based
    fragment order, pos the 1-based token position of that hit.

    Plan: a pure per-row projection — tokenize, collect hit positions
    with an indexed array transform, slice + tag each window — then one
    posexplode. Zero shuffle, embarrassingly parallel; fragment count
    per doc is bounded by max_snippets so the explode fan-out is
    capped."""
    toks = tokens(text_col)
    positions = F.slice(
        F.filter(
            F.transform(
                "_toks",
                lambda x, i: F.when(x == term.lower(), i + 1),
            ),
            lambda p: p.isNotNull(),
        ),
        1,
        max_snippets,
    )
    staged = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_hits", positions)
        .filter(F.size("_hits") > 0)
        .select(
            F.col(id_col),
            "_toks",
            F.posexplode("_hits").alias("_i", "pos"),
        )
    )
    start = F.greatest(F.col("pos") - window, F.lit(1))
    length = F.least(F.col("pos") + window, F.size("_toks")) - start + 1
    # tag the hit inside the sliced window: element j of the slice is
    # absolute position start + j, so exactly one element gets wrapped
    tagged = F.array_join(
        F.transform(
            F.slice("_toks", start, length),
            lambda x, j: F.when(
                start + j == F.col("pos"), F.concat(F.lit(pre), x, F.lit(post))
            ).otherwise(x),
        ),
        " ",
    )
    return staged.select(
        F.col(id_col),
        (F.col("_i") + 1).alias("snippet_no"),
        F.col("pos"),
        tagged.alias("snippet"),
    )


def unified_highlight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    passage_size: int = 10,
    k: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
    pre: str = "<em>",
    post: str = "</em>",
    score_decimals: int = 6,
) -> DataFrame:
    """Solr ``hl.method=unified`` — passage scoring: split each
    document into passages, BM25-score every passage against the query
    terms, and return the top-``k`` passages per document (Lucene's
    UnifiedHighlighter PassageScorer). The break iterator here is
    fixed ``passage_size``-token windows — the fragsize fallback the
    unified highlighter uses when the text has no sentence boundaries
    (this corpus has none); Lucene's per-passage score is

        sum over query terms t of idf(t) * tf*(k1+1)/(tf + k1*(1 - b + b*len/avgLen))

    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) from DOCUMENT-level
    stats (the highlighter reads index df, not passage df) and avgLen
    the corpus-wide mean passage length.

    Plan: corpus stats are two tiny aggregates (per-term document
    frequency — vocabulary-bounded, here |terms| rows — and the avgLen
    scalar) broadcast into a per-row projection; passages are a capped
    explode of token slices; top-k per doc is one window over the
    zero-score-filtered passage set. One corpus scan for stats + one
    for passages; no corpus shuffle — the only exchange carries
    scored matching passages.

    Returns (id, passage_no, score, snippet) — passage_no 1-based in
    document order, hit tokens wrapped in the tags; ties break toward
    the earlier passage (Lucene's behavior for equal scores)."""
    lterms = [t.lower() for t in terms]
    toks = tokens(text_col)

    # document-level df per term + total doc count, in ONE pass
    stats = df.select(toks.alias("_t")).agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        *[
            F.sum(F.array_contains("_t", t).cast("long")).cast("double").alias(f"_df_{i}")
            for i, t in enumerate(lterms)
        ],
    )

    passages = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            F.ceil(F.size("_toks") / passage_size).cast("int") - 1,
                            F.lit(0),
                        ),
                    ),
                    lambda i: F.slice("_toks", i * passage_size + 1, passage_size),
                )
            ).alias("_p", "_passage"),
        )
        .withColumn("_plen", F.size("_passage"))
    )
    # exact-integer mean (sum/count, one double division) so the scalar
    # is bit-identical across partition orders and engines
    avg_len = passages.agg(
        (F.sum("_plen").cast("double") / F.count(F.lit(1))).alias("_avg_plen")
    )

    scored = passages.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(avg_len))
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("_plen").cast("double") / F.col("_avg_plen")
    )
    score = F.lit(0.0)
    for i, t in enumerate(lterms):
        tf = F.size(F.filter("_passage", lambda x: x == t)).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5)
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)

    tagged = F.array_join(
        F.transform(
            "_passage",
            lambda x: F.when(
                x.isin(*lterms), F.concat(F.lit(pre), x, F.lit(post))
            ).otherwise(x),
        ),
        " ",
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("passage_no").asc()
    )
    return (
        scored.select(
            F.col(id_col),
            (F.col("_p") + 1).cast("long").alias("passage_no"),
            F.round(score, score_decimals).alias("score"),
            tagged.alias("snippet"),
        )
        .filter(F.col("score") > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def snippets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    term: str,
    window: int = 3,
) -> DataFrame:
    """Highlighting: for documents containing ``term``, a snippet of
    ``window`` tokens on each side of the FIRST occurrence (Solr
    hl.fragsize analogue, token-based and deterministic).

    Returns (id, pos, snippet) for matching docs only; pos is the
    1-based token position of the first hit."""
    toks = tokens(text_col)
    staged = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "pos", F.array_position("_toks", term)
    )
    start = F.greatest(F.col("pos") - window, F.lit(1))
    # slice length: window both sides + the hit, clipped at array end
    length = F.least(
        F.col("pos") + window, F.size("_toks")
    ) - start + 1
    return (
        staged.filter(F.col("pos") > 0)
        .select(
            F.col(id_col),
            F.col("pos"),
            F.array_join(F.slice("_toks", start, length), " ").alias("snippet"),
        )
    )
