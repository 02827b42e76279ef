"""Analyzer chain — the Solr field-analysis pipeline the reference's
deployment configures out-of-band ("提前定制好schemal", reference
README.md:33): tokenize → lowercase → stopword filter → stemming.

Solr's standard English text field stacks StopFilterFactory (the
Lucene classic English stop set) and a stemmer. Porter stemming is
not expressible portably, so the stemmer here is Harman's S-stemmer
(the `solr.EnglishMinimalStemFilterFactory` algorithm): only plural
suffixes, three rules, each a suffix test — fully expressible as a
CASE chain that Spark and DuckDB evaluate identically:

    ...ies (but not ...eies/...aies)  →  ...y
    ...es  (but not ...aes/...ees/...oes) → drop the s
    ...s   (but not ...us/...ss)      →  drop the s

Everything is a zero-shuffle projection over the token array (no
UDF); analyzed postings persist next to the raw ones, so query-time
analysis touches only the (tiny) query string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.tokenize import tokens

# Lucene's classic English stop set (ENGLISH_STOP_WORDS_SET, 33 terms)
STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on "
    "or such that the their then there these they this to was will with"
).split()


def _stem_one(t: Column) -> Column:
    # Rules fire first-match-wins and a guard STOPS stemming (Harman's
    # spec) — a guarded word like 'toes' keeps its s, it does not fall
    # through to the bare-s rule.
    return (
        F.when(t.like("%eies") | t.like("%aies"), t)
        .when(t.like("%ies"), F.concat(t.substr(F.lit(1), F.length(t) - 3), F.lit("y")))
        .when(t.like("%aes") | t.like("%ees") | t.like("%oes"), t)
        .when(t.like("%es"), t.substr(F.lit(1), F.length(t) - 1))
        .when(t.like("%us") | t.like("%ss"), t)
        .when(t.like("%s"), t.substr(F.lit(1), F.length(t) - 1))
        .otherwise(t)
    )


def stem(t: Column) -> Column:
    """Harman S-stemmer for a single (lowercased) token column."""
    return _stem_one(t)


def analyzed_tokens(col: Column | str) -> Column:
    """Full analysis chain over a text column: tokenize (lowercase,
    non-alnum split) → drop stopwords → S-stem. Pure projection."""
    toks = tokens(col)
    kept = F.filter(toks, lambda t: ~t.isin(*STOPWORDS))
    return F.transform(kept, _stem_one)


def stem_sql(expr: str) -> str:
    """DuckDB fragment mirroring `stem` over ``expr``."""
    return (
        f"CASE WHEN {expr} LIKE '%eies' OR {expr} LIKE '%aies' THEN {expr} "
        f"WHEN {expr} LIKE '%ies' THEN substr({expr}, 1, length({expr}) - 3) || 'y' "
        f"WHEN {expr} LIKE '%aes' OR {expr} LIKE '%ees' OR {expr} LIKE '%oes' THEN {expr} "
        f"WHEN {expr} LIKE '%es' THEN substr({expr}, 1, length({expr}) - 1) "
        f"WHEN {expr} LIKE '%us' OR {expr} LIKE '%ss' THEN {expr} "
        f"WHEN {expr} LIKE '%s' THEN substr({expr}, 1, length({expr}) - 1) "
        f"ELSE {expr} END"
    )


def stopword_sql_list() -> str:
    """The stop set as a SQL IN-list body."""
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def analyzed_vocabulary(
    df: DataFrame, id_col: str, text_col: str, k: int = 20
) -> DataFrame:
    """Top-k analyzed vocabulary by document frequency — the terms a
    Solr analyzed field actually indexes. One explode + hash agg; the
    analysis itself adds no shuffle."""
    return (
        df.select(F.col(id_col), F.explode(analyzed_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("docfreq"))
        .orderBy(F.col("docfreq").desc(), F.col("term").asc())
        .limit(k)
    )
