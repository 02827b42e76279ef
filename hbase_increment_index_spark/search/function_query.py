"""Solr function-query parser: the ``func(...)`` expression language
used in ``sort=``, ``boost=``, ``fl=score:...`` and ``{!func}``
(Solr's FunctionQParser — part of the select-handler surface the
reference system's README delegates to Solr, reference README.md:5-10,
solrj dep pom.xml:98-109) compiled to Spark Column expressions.

Completes the engine's query-language trio — the standard-query
parser (`solr_query`), streaming expressions (`streaming_expr`), and
this — so every textual query surface a user of the reference's Solr
deployment types has a Catalyst-compiled equivalent.

Supported functions (the deterministic core of Solr's library):

    sum(a,b,...)  sub(a,b)  product(a,b,...)  div(a,b)
    min(a,b,...)  max(a,b,...)  abs(x)  log(x)   # log = base-10, as in Solr
    ln(x)  sqrt(x)  pow(x,y)  recip(x,m,a,b)     # a/(m*x+b)
    floor(x)  ceil(x)  rint(x)
    if(test,then,else)  map(x,min,max,target)    # range remap
    exists(f)  field(f)                          # bare names also work

Operands are function calls, field names, or numeric literals.
Everything compiles to one projection — function queries are by
construction zero-shuffle, codegen'd, and the same text works in a
sort, a filter ({!frange}, q42b) or a boost product. Parsing is the
same recursive-descent shape as streaming_expr.

Not covered (documented, deliberate): ``ord``/``rord`` (positional —
need a global sort), ``query(...)`` subquery scores (compose the
DataFrames instead), and ``scale`` (needs a corpus min/max pass —
express it with an explicit 1-row broadcast agg like q42's NOW).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FunctionQueryError(ValueError):
    pass


_TOKEN = re.compile(
    r"\s*(?:(?P<name>[A-Za-z_][\w.]*)\s*(?P<lparen>\()?|(?P<comma>,)|(?P<rparen>\))"
    r"|(?P<num>-?\d+(?:\.\d+)?))"
)


def _lex(text: str):
    text = text.strip()
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            raise FunctionQueryError(f"bad token at {text[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("name") is not None:
            out.append(("call" if m.group("lparen") else "field", m.group("name")))
        elif m.group("comma"):
            out.append(("comma", ","))
        elif m.group("rparen"):
            out.append(("rparen", ")"))
        else:
            out.append(("num", m.group("num")))
    return out


def _fold(args: list[Column], op) -> Column:
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _compile(name: str, args: list[Column]) -> Column:
    def need(n):
        if len(args) != n:
            raise FunctionQueryError(f"{name} takes {n} args, got {len(args)}")

    if not args:
        raise FunctionQueryError(f"{name} needs at least one argument")

    if name == "sum":
        return _fold(args, lambda a, b: a + b)
    if name == "sub":
        need(2)
        return args[0] - args[1]
    if name == "product":
        return _fold(args, lambda a, b: a * b)
    if name == "div":
        need(2)
        return args[0] / args[1]
    if name == "min":
        return F.least(*args)
    if name == "max":
        return F.greatest(*args)
    if name == "abs":
        need(1)
        return F.abs(args[0])
    if name == "log":  # Solr log() is base 10
        need(1)
        return F.log10(args[0])
    if name == "ln":
        need(1)
        return F.log(args[0])
    if name == "sqrt":
        need(1)
        return F.sqrt(args[0])
    if name == "floor":
        need(1)
        return F.floor(args[0])
    if name == "ceil":
        need(1)
        return F.ceil(args[0])
    if name == "rint":  # Math.rint = round-half-even, hence bround
        need(1)
        return F.bround(args[0], 0)
    if name == "pow":
        need(2)
        return F.pow(args[0], args[1])
    if name == "recip":  # recip(x,m,a,b) = a/(m*x+b)
        need(4)
        x, m, a, b = args
        return a / (m * x + b)
    if name == "if":
        need(3)
        return F.when(args[0].cast("boolean"), args[1]).otherwise(args[2])
    if name == "map":  # map(x,min,max,target): x in [min,max] -> target
        need(4)
        x, lo, hi, target = args
        return F.when((x >= lo) & (x <= hi), target).otherwise(x)
    if name == "exists":
        need(1)
        return args[0].isNotNull()
    if name == "field":
        need(1)
        return args[0]
    raise FunctionQueryError(f"unsupported function {name!r}")


def parse_function_query(text: str) -> Column:
    """Compile Solr function-query text to a Column expression."""
    toks = _lex(text)
    idx = 0

    def peek():
        return toks[idx] if idx < len(toks) else ("eof", "")

    def take(kind=None):
        nonlocal idx
        tok = peek()
        if kind and tok[0] != kind:
            raise FunctionQueryError(f"expected {kind}, got {tok}")
        idx += 1
        return tok

    def operand() -> Column:
        kind, val = take()
        if kind == "call":
            args = []
            if peek()[0] != "rparen":
                args.append(operand())
                while peek()[0] == "comma":
                    take()
                    args.append(operand())
            take("rparen")
            return _compile(val, args)
        if kind == "field":
            return F.col(val)
        if kind == "num":
            return F.lit(float(val) if "." in val else int(val))
        raise FunctionQueryError(f"unexpected {kind} {val!r}")

    col = operand()
    if idx != len(toks):
        raise FunctionQueryError("trailing input after expression")
    return col


def function_sort(df: DataFrame, text: str, k: int, alias: str = "score", decimals: int = 6):
    """``sort=<func> desc`` + ``rows=k``: score projection +
    TakeOrderedAndProject, deterministic tie-break on the first
    column."""
    first = df.columns[0]
    return (
        df.withColumn(alias, F.round(parse_function_query(text), decimals))
        .orderBy(F.col(alias).desc(), F.col(first).asc())
        .limit(k)
    )
