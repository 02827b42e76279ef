"""Payload queries: Lucene/Solr per-position term payloads.

Solr's payload surface (solrj 9.8, reference pom.xml:22) has two
consumers a payload-annotated index serves:

- ``{!payload_check f=f payloads="p1 p2" v="t1 t2"}`` — match documents
  where the phrase occurs AND the payloads at the matched positions
  equal the given list (the classic use: part-of-speech or
  weight-tagged tokens).
- ``payload(field, term[, default][, func])`` function query — the
  per-document payload of a term (min/max/first over its occurrences),
  used as a scoring factor.

Solr's standard payload fieldtype is a WHITESPACE tokenizer + a
DelimitedPayloadTokenFilter (``token|payload``); the payload rides the
postings as a per-position attribute. The engine mirrors that exactly:
:func:`delimited_payload_postings` parses a payload-annotated text
column into the payload-augmented posting table (doc, pos, term,
payload) — whitespace split, NOT the a-z0-9 tokenizer, because the
delimiter must survive tokenization, just as Solr's payload fields use
the whitespace analyzer — and the two query forms compile to joins /
aggregates over that table:

- payload_check = the phrase self-join (search.filters.phrase's
  anchor-alignment idiom) with per-leg payload equality folded into the
  leg filters, so each leg scans only its term's (selective) postings
  and the alignment join carries |term postings| rows, never the
  corpus.
- payload_score = one term-filtered hash aggregate (min/max/first by
  lowest position) with Lucene's default-when-absent semantics.

At 100 TB the posting table is the same row count as the positional
index the phrase engine already maintains (one row per token
occurrence) plus one float — the payload adds a column, not a new
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delimited_payload_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = "|",
) -> DataFrame:
    """Parse ``token|payload`` annotated text into payload-augmented
    postings (doc, pos, term, payload). Tokens without the delimiter
    keep payload NULL — the payload() function substitutes its default
    for those, like Lucene. Whitespace tokenization (Solr's payload
    fieldtype contract); positions are 0-based token indexes."""
    toks = F.split(F.col(text_col), " ")
    out = df.select(
        F.col(id_col).alias("doc"), F.posexplode(toks).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    has_payload = F.instr(F.col("tok"), delimiter) > 0
    return out.select(
        "doc",
        "pos",
        F.substring_index("tok", delimiter, 1).alias("term"),
        F.when(
            has_payload,
            F.substring_index("tok", delimiter, -1).cast("double"),
        ).alias("payload"),
    )


def payload_check(
    postings: DataFrame, terms: list[str], payloads: list[float]
) -> DataFrame:
    """``{!payload_check}``: documents where the phrase ``terms``
    occurs at consecutive positions whose payloads equal ``payloads``
    element-wise. One leg per term — each scans only that term's
    postings with the payload equality folded in — aligned on
    (doc, pos - leg_index), the phrase anchor idiom; output is the
    distinct matching doc ids."""
    if not terms or len(terms) != len(payloads):
        raise ValueError("payload_check needs terms and payloads of equal length")
    legs = None
    for i, (t, p) in enumerate(zip(terms, payloads)):
        leg = postings.filter(
            (F.col("term") == t) & (F.col("payload") == F.lit(float(p)))
        ).select("doc", (F.col("pos") - F.lit(i)).alias("anchor"))
        legs = leg if legs is None else legs.join(leg, ["doc", "anchor"])
    return legs.select("doc").distinct()


def payload_score(
    postings: DataFrame,
    term: str,
    default: float = 1.0,
    func: str = "max",
) -> DataFrame:
    """``payload(field, term, default, func)`` function query: per
    document, the min/max/first payload of ``term`` (first = lowest
    position, Lucene's order), with ``default`` substituted where the
    occurrence carries no payload. One term-filtered hash aggregate —
    (doc, score), never a corpus shuffle."""
    if func not in ("min", "max", "first"):
        raise ValueError(f"payload func must be min/max/first, got {func!r}")
    hits = postings.filter(F.col("term") == term).select(
        "doc", "pos", F.coalesce("payload", F.lit(float(default))).alias("p")
    )
    if func == "first":
        agg: Column = F.min(F.struct("pos", "p")).getField("p")
    elif func == "min":
        agg = F.min("p")
    else:
        agg = F.max("p")
    return hits.groupBy("doc").agg(agg.alias("score"))
