"""Phonetic matching — Solr's PhoneticFilterFactory (Soundex) as a
pure expression chain.

Solr deployments of the reference's era commonly add a phonetic
analyzer (``<filter class="solr.PhoneticFilterFactory"
encoder="Soundex"/>``) so name-like fields match on pronunciation.
This module implements textbook American Soundex as a Column
expression — no UDF, fully codegen'd, and portable: every step
(translate, regexp_replace without backreferences, substr, rpad) has
an identical DuckDB counterpart, so phonetic queries oracle-check
bit-for-bit. RE2 (DuckDB) lacks backreferences, so run-collapsing is
seven per-digit ``regexp_replace(c, 'd{2,}', 'd')`` passes instead of
one ``(\\d)\\1+`` — same result, engine-portable.

Variant note: H and W are treated as vowels (separators), the common
simplified Soundex; classic NARA Soundex instead makes them
transparent between same-coded consonants. Documented so the oracle
and any external comparison use the same convention.

Zero-shuffle: soundex_code is a projection; a sounds-like search is
vocabulary-filter + the usual postings aggregation. At 100 TB the
phonetic code is indexed once next to the postings (a column in the
vocabulary table), making the query a point lookup on the code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# letter → digit map (A..Z order), vowels/H/W/Y → 0 (separator)
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"


def soundex_code(col: Column | str) -> Column:
    """Textbook Soundex code (e.g. 'spark' → 'S162') as an expression.

    first letter + (run-collapsed digit string of the rest, zeros
    dropped), right-padded with zeros to 4. Non-letters are stripped
    first, so input containing no letters at all yields ''.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    mapped = F.translate(u, _LETTERS, _CODES)
    collapsed = mapped
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, d + "{2,}", d)
    tail = F.regexp_replace(F.substring(collapsed, 2, 1000), "0", "")
    code = F.concat(F.substring(u, 1, 1), tail)
    return F.when(u == "", F.lit("")).otherwise(F.rpad(F.substring(code, 1, 4), 4, "0"))


def soundex_sql(expr: str) -> str:
    """The same chain as a DuckDB SQL fragment over column/expression
    ``expr`` — used by oracle queries to reproduce codes exactly."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    collapsed = f"translate({u}, '{_LETTERS}', '{_CODES}')"
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    tail = f"regexp_replace(substr({collapsed}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN {u} = '' THEN '' "
        f"ELSE rpad(substr(substr({u}, 1, 1) || {tail}, 1, 4), 4, '0') END"
    )


def sounds_like_terms(
    postings: DataFrame,
    query_word: str,
    term_col: str = "term",
    df_col: str = "df",
) -> DataFrame:
    """Vocabulary terms phonetically equal to ``query_word``: filter
    the (term, df) vocabulary by soundex equality. The code of the
    query is folded to a literal at plan time, so the filter is a
    simple string equality over the vocabulary — broadcastable and
    indexable (store the code as a vocabulary column at scale)."""
    return postings.filter(
        soundex_code(F.col(term_col)) == soundex_code(F.lit(query_word))
    ).select(term_col, df_col)


def phonetic_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_word: str,
) -> DataFrame:
    """Sounds-like full-text match: documents containing ANY token
    whose Soundex equals the query's — `q=f:word` with a phonetic
    analyzer. One projection filter (exists over the token array), no
    shuffle; the phonetic code evaluation inlines into codegen."""
    from hbase_increment_index_spark.search.tokenize import tokens

    q_code = soundex_code(F.lit(query_word))
    return df.filter(
        F.exists(tokens(text_col), lambda t: soundex_code(t) == q_code)
    ).select(id_col, text_col)
