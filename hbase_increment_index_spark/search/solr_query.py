"""Solr query-string parser: the ``q``/``fq`` syntax a user of the
reference system types today (reference README.md:5-10 — the Solr
select handler is the system's entire read API), compiled to Spark
Column predicates.

Supported grammar (the standard-query-parser subset that maps to a
deterministic relational predicate — no boost/proximity):

    query     := clause (("AND" | "OR") clause)*     # left-assoc
    clause    := ["NOT"] atom
    atom      := "(" query ")" | term
               | "{!terms" "f=" field ["separator=" '"' ch '"'] "}" v("sep" v)*
                                                 # id-list filter → In
    term      := field ":" value
    value     := "[" lit "TO" lit "]"                # inclusive range
               | quoted phrase "..." ["~" slop]      # phrase (± slop) match
               | bare* | bare?pattern                # wildcard/prefix
               | bare~N | bare~                      # fuzzy (edit dist ≤ N, default 2)
               | bare                                # exact or token match

Default operator is AND (Solr q.op=AND). A bare value on a text field
matches tokens (full-text); on any other field it is an equality.
Numeric-looking literals are compared numerically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.search import filters
from hbase_increment_index_spark.search.tokenize import has_token

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op>AND\b|OR\b|NOT\b) |
        (?P<terms>\{!terms\s+f=(?P<tfield>[A-Za-z_][\w.]*)
            (?:\s+separator="(?P<tsep>[^"])")?\}(?P<tvals>[^\s()]+)) |
        (?P<cpx>\{!complexphrase\}(?P<cpxf>[A-Za-z_][\w.]*):"(?P<cpxv>[^"]*)") |
        (?P<lp>\{!(?P<lpk>prefix|field|raw)\s+f=(?P<lpf>[A-Za-z_][\w.]*)\}
            (?:"(?P<lpq>[^"]*)"|(?P<lpb>[^\s()]+))) |
        (?P<term>[A-Za-z_][\w.]*):(?:
            (?P<range>\[[^\]]+\]) |
            "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))? |
            (?P<value>[^\s()]+)
        )
    )""",
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    payload: tuple


class SolrQueryError(ValueError):
    pass


def _lex(q: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            if q[pos:].strip() == "":
                break
            raise SolrQueryError(f"cannot parse query at: {q[pos:]!r}")
        pos = m.end()
        if m.group("lparen"):
            toks.append(_Tok("(", ()))
        elif m.group("rparen"):
            toks.append(_Tok(")", ()))
        elif m.group("op"):
            toks.append(_Tok(m.group("op"), ()))
        elif m.group("terms"):
            toks.append(
                _Tok(
                    "terms",
                    (m.group("tfield"), m.group("tsep") or ",", m.group("tvals")),
                )
            )
        elif m.group("cpx"):
            toks.append(_Tok("cpx", (m.group("cpxf"), m.group("cpxv"))))
        elif m.group("lp"):
            value = m.group("lpq") if m.group("lpq") is not None else m.group("lpb")
            toks.append(_Tok("lp", (m.group("lpk"), m.group("lpf"), value)))
        else:
            field = m.group("term")
            if m.group("range") is not None:
                body = m.group("range")[1:-1]
                parts = re.split(r"\s+TO\s+", body.strip())
                if len(parts) != 2:
                    raise SolrQueryError(f"bad range: {body!r}")
                toks.append(_Tok("range", (field, parts[0].strip(), parts[1].strip())))
            elif m.group("phrase") is not None:
                slop = int(m.group("slop")) if m.group("slop") else 0
                toks.append(_Tok("phrase", (field, m.group("phrase"), slop)))
            else:
                toks.append(_Tok("value", (field, m.group("value"))))
    return toks


def _lit(v: str):
    if v == "*":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


class _Parser:
    def __init__(self, toks: list[_Tok], text_fields: set[str]):
        self.toks = toks
        self.i = 0
        self.text_fields = text_fields

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise SolrQueryError("unexpected end of query")
        self.i += 1
        return t

    def parse(self) -> Column:
        col = self.query()
        if self.peek() is not None:
            raise SolrQueryError(f"trailing input after position {self.i}")
        return col

    def query(self) -> Column:
        left = self.clause()
        while True:
            t = self.peek()
            if t is None or t.kind == ")":
                return left
            if t.kind in ("AND", "OR"):
                self.next()
                right = self.clause()
                left = (left & right) if t.kind == "AND" else (left | right)
            else:  # implicit default operator: AND (Solr q.op=AND)
                right = self.clause()
                left = left & right

    def clause(self) -> Column:
        t = self.peek()
        if t is not None and t.kind == "NOT":
            self.next()
            return ~self.atom()
        return self.atom()

    def atom(self) -> Column:
        t = self.next()
        if t.kind == "(":
            inner = self.query()
            if self.next().kind != ")":
                raise SolrQueryError("expected )")
            return inner
        if t.kind == "terms":
            # Solr's {!terms f=field}v1,v2,... query parser — the
            # documented efficient form of a large id-list filter (vs
            # a boolean OR chain). Compiles to Column.isin → a single
            # Catalyst In predicate, which is sargable and reaches the
            # parquet scan's PushedFilters; an OR chain of equalities
            # would be folded too, but In stays O(1) predicate nodes
            # for a 10k-id list. Composes as an atom (Solr needs
            # _query_ nesting for that; the inline form is strictly
            # more permissive).
            field, sep, vals = t.payload
            # Trailing/doubled separators ('1,2,') would yield empty
            # strings and a mixed-type isin that silently never matches
            # — drop them; Solr's {!terms} also does NO wildcarding, so
            # '*' is just the literal one-char value.
            parts = [v for v in vals.split(sep) if v != ""]
            if not parts:
                raise SolrQueryError("{!terms} needs at least one value")
            # _lit maps '*' to None (open range bound); here it's data
            return F.col(field).isin(
                [v if v == "*" else _lit(v) for v in parts]
            )
        if t.kind == "cpx":
            # Solr's {!complexphrase} parser: phrase legs may be
            # wildcard patterns; compiles to the per-row positional
            # existential (filters.complex_phrase) — no index needed,
            # no shuffle
            field, phrase_text = t.payload
            return filters.complex_phrase(field, phrase_text.split())
        if t.kind == "lp":
            # the simple local-params parsers: {!prefix} (startswith),
            # {!raw} (verbatim equality — NO analysis, no numeric
            # coercion, Solr's contract), {!field} (fieldType-aware:
            # phrase on a text field when multi-word, else coerced
            # equality)
            kind, field, value = t.payload
            if kind == "prefix":
                return filters.prefix(field, value)
            if kind == "raw":
                return F.col(field) == F.lit(value)
            words = value.split()
            if field in self.text_fields and len(words) > 1:
                return filters.phrase(field, words)
            if field in self.text_fields:
                return has_token(field, value)
            return filters.eq(field, _lit(value))
        if t.kind == "range":
            field, lo, hi = t.payload
            lo_l, hi_l = _lit(lo), _lit(hi)
            if lo_l is None and hi_l is None:
                return F.col(field).isNotNull()
            if lo_l is None:
                return F.col(field) <= F.lit(hi_l)
            if hi_l is None:
                return F.col(field) >= F.lit(lo_l)
            return filters.range_between(field, lo_l, hi_l)
        if t.kind == "phrase":
            field, words, slop = t.payload
            if slop:
                return filters.phrase_slop(field, words.split(), slop)
            return filters.phrase(field, words.split())
        if t.kind == "value":
            field, value = t.payload
            if value == "*":
                return F.col(field).isNotNull()
            fz = re.fullmatch(r"(?P<w>[^~]+)~(?P<d>[0-2]?)", value)
            if fz:  # Solr fuzzy term: word~N (bare ~ = Lucene default 2)
                from hbase_increment_index_spark.search.tokenize import has_fuzzy_token

                return has_fuzzy_token(
                    field, fz.group("w"), int(fz.group("d") or 2)
                )
            if "*" in value or "?" in value:
                return filters.wildcard(field, value)
            if field in self.text_fields:
                return has_token(field, value)
            return filters.eq(field, _lit(value))
        raise SolrQueryError(f"unexpected token {t.kind}")


def parse_query(q: str, text_fields: set[str] | None = None) -> Column:
    """Compile a Solr query string to a Column predicate.

    ``text_fields`` — fields that get tokenized full-text matching for
    bare values (everything else is exact equality, like a Solr string
    field vs a text field).
    """
    toks = _lex(q)
    if not toks:
        raise SolrQueryError("empty query")
    return _Parser(toks, text_fields or set()).parse()


def solr_select(df: DataFrame, q: str, text_fields: set[str] | None = None) -> DataFrame:
    """``df`` filtered by a Solr query string — the ``/select?q=`` path."""
    return df.filter(parse_query(q, text_fields))
