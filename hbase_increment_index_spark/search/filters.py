"""Filter/predicate surface — SURVEY.md §2.2 Q1–Q5, Q9, Q17.

These are deliberately thin: each returns a plain Column/DataFrame so
Catalyst sees an ordinary predicate and pushes it into the parquet
scan (check with ``.explain`` → ``PushedFilters``). The value of the
module is naming the Solr semantics, not inventing machinery.

Reference anchors: the Solr ``fq``/``q`` surface the coprocessor's
index feeds (reference README.md:5-10); retrieval-by-unique-key uses
the rowkey field (reference application.properties:4).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bind(value: Column, body) -> Column:
    """Evaluate ``body(var)`` with ``value`` computed ONCE per row.

    Catalyst has no let-expression and common-subexpression
    elimination does not reach inside higher-order-function lambdas,
    so a computed Column referenced from an ``exists``/``filter``/
    ``transform`` lambda is re-evaluated PER ARRAY ELEMENT — the
    tokenize regex here ran once per start position per leg
    (q90_complex_phrase spent 9.7s on a 0.6 MB corpus; guide §1/§4:
    per-task work). ``transform`` over a one-element array
    materializes ``value`` into a lambda variable; every reference
    inside ``body`` then reads the variable instead of recomputing
    the expression tree.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def eq(field: str, value) -> Column:
    """Q1 — Solr ``fq=field:value``."""
    return F.col(field) == F.lit(value)


def range_between(field: str, lo, hi) -> Column:
    """Q2 — Solr ``fq=field:[lo TO hi]`` (inclusive both ends)."""
    return F.col(field).between(lo, hi)


def prefix(field: str, pre: str) -> Column:
    """Q5 — Solr ``q=field:pre*``."""
    return F.col(field).startswith(pre)


def wildcard(field: str, pattern: str) -> Column:
    """Q5 — Solr wildcard ``?``/``*`` translated to SQL LIKE ``_``/``%``."""
    like = pattern.replace("%", r"\%").replace("_", r"\_")
    like = like.replace("*", "%").replace("?", "_")
    return F.col(field).like(like)


def phrase(text_field: str, words: list[str]) -> Column:
    """Q5 — phrase query: adjacent tokens in order.

    Matched on the raw lowercased text with a word-boundary regex —
    equivalent to a position-aware posting check for space-separated
    corpora, without materializing positions.

    Each word is regex-escaped, so quoted phrases containing
    metacharacters (``"3.5 (beta)"``, ``"c++"``) match literally instead
    of blowing up pattern compilation. ``\\b`` anchors are only applied
    where the phrase edge is a word character — after ``+`` or ``)``
    there is no word boundary to assert.
    """
    if not words:
        return F.lit(True)
    parts = [re.escape(w.lower()) for w in words]
    first, last = words[0].lower(), words[-1].lower()
    lead = r"\b" if (first[:1].isalnum() or first[:1] == "_") else ""
    trail = r"\b" if (last[-1:].isalnum() or last[-1:] == "_") else ""
    needle = lead + r"\s+".join(parts) + trail
    return F.lower(F.col(text_field)).rlike(needle)


def phrase_slop(text_field: str, words: list[str], slop: int) -> Column:
    """Q5 — sloppy phrase predicate ``"w1 w2"~N`` evaluated per row on
    the tokenized text: the words appear IN ORDER with total span ≤
    (k-1) + slop token positions (the same in-order semantics as the
    index-served ``inverted.sloppy_phrase_from_index``; slop=0 ≡
    adjacent phrase).

    Pure array HOFs — per-term position lists from one tokenize, then
    the greedy smallest-next-position chain fold; no shuffle, no
    positions materialized outside the row. The token array is
    let-bound (``_bind``) so the tokenize runs once per row, not once
    per token index inside the position-list lambdas."""
    from hbase_increment_index_spark.search.tokenize import tokens

    if not words:
        return F.lit(True)

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - 1)

        def pos(word: str) -> Column:
            w = word.lower()
            return F.filter(idx, lambda i: F.element_at(t, i + 1) == F.lit(w))

        # the per-word position arrays are let-bound as one struct so
        # the chain fold's filter lambda reads them as variables too
        # (unbound, each chain element re-derived the full O(|tokens|)
        # position list)
        pws = F.struct(*[pos(w).alias(f"p{j}") for j, w in enumerate(words)])

        def fold(ps: Column) -> Column:
            def step(pw: Column):
                # closure factory, NOT a default arg: PySpark HOF
                # lambda arity counts defaults, and a 2-arg lambda
                # means (element, index)
                def advance(ch: Column) -> Column:
                    return F.struct(
                        ch["s"].alias("s"),
                        F.array_min(F.filter(pw, lambda q: q > ch["c"])).alias("c"),
                    )

                return advance

            chains = F.transform(
                ps["p0"], lambda p: F.struct(p.alias("s"), p.alias("c"))
            )
            for j in range(1, len(words)):
                chains = F.filter(
                    F.transform(chains, step(ps[f"p{j}"])),
                    lambda ch: ch["c"].isNotNull(),
                )
            window = len(words) - 1 + slop
            return (F.size(t) > 0) & F.exists(
                chains, lambda ch: ch["c"] - ch["s"] <= F.lit(window)
            )

        return _bind(pws, fold)

    return _bind(tokens(text_field), body)


def by_id(df: DataFrame, key_field: str, key) -> DataFrame:
    """Q17 — unique-key retrieval (Solr ``q=rowkey:k``;
    reference application.properties:4)."""
    return df.filter(F.col(key_field) == F.lit(key))


def fuzzy_search(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    term: str,
    max_edits: int = 1,
) -> DataFrame:
    """Q5 family — Solr fuzzy term query ``q=field:term~N`` (edit
    distance ≤ N, Solr 5.x select handler; the query surface the
    reference's index exists to serve — reference README.md:5-10,
    solrj dep pom.xml:98-109; SURVEY.md §2.2).

    Returns one row per (id, matched vocabulary token). Implemented as
    a pure per-row projection — tokenize, keep tokens within
    ``max_edits`` of the query term, dedupe in-array, explode — so the
    plan has ZERO shuffles and parallelizes with the scan at any data
    size. The levenshtein call runs per token occurrence; if a profile
    ever shows that dominating, the same semantics can be served from
    the materialized vocabulary (search.inverted) with the distance
    computed once per distinct term, at the cost of a broadcast.
    """
    t = term.lower()
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    matched = F.array_distinct(
        F.filter(
            toks,
            lambda x: (x != "") & (F.levenshtein(x, F.lit(t)) <= F.lit(max_edits)),
        )
    )
    return corpus.select(F.col(id_col), F.explode(matched).alias("term"))


def complex_phrase(text_field: str, patterns: list[str]) -> Column:
    """Solr ``{!complexphrase}`` — a phrase whose legs may be WILDCARD
    patterns (``"tab* hash"``): exists a position i where token[i+j]
    matches pattern[j] for every leg j (adjacent, in order — slop 0,
    the parser's default). Pure per-row array HOFs over ONE tokenize —
    the token array is let-bound (``_bind``) so the existential's
    per-position lambda reads a variable instead of re-running the
    tokenize regex per start position per leg (that re-evaluation made
    q90 the single most expensive bench query, 9.7s at sf0.1; after
    the binding it is a sub-second scan). The predicate stays inside
    whole-stage codegen with no positions materialized outside the
    row (the phrase_slop discipline)."""
    from functools import reduce
    from operator import and_

    from hbase_increment_index_spark.search.tokenize import tokens

    if not patterns:
        return F.lit(True)
    k = len(patterns)

    def leg(tok: Column, pat: str) -> Column:
        p = pat.lower()
        if "*" in p or "?" in p:
            # backslash first, else a literal '\' in the pattern reads
            # as a LIKE escape char (same order as filter_list_sql)
            like = p.replace("\\", "\\\\")
            like = like.replace("%", r"\%").replace("_", r"\_")
            like = like.replace("*", "%").replace("?", "_")
            return tok.like(like)
        return tok == F.lit(p)

    def body(t: Column) -> Column:
        starts = F.sequence(F.lit(1), F.size(t) - (k - 1))
        hit = F.exists(
            starts,
            lambda i: reduce(
                and_,
                [leg(F.element_at(t, i + j), p) for j, p in enumerate(patterns)],
            ),
        )
        return F.when(F.size(t) >= k, hit).otherwise(F.lit(False))

    return _bind(tokens(text_field), body)
