"""Solr JSON Request API — the JSON query DSL (``POST /select
{"query": {...}}``) compiled to Spark Column predicates. (The modern
form of the select-handler surface the reference delegates to Solr,
reference README.md:5-10; its pom tracks solrj 9.x, pom.xml:22, where
the JSON API is the documented default.)

The modern Solr client surface alongside the classic query string
(solr_query), streaming expressions (streaming_expr) and function
queries (function_query). Supported node types — the deterministic
relational core of the DSL:

    {"bool": {"must": [...], "should": [...], "must_not": [...]}}
    {"lucene": {"query": "<standard query string>"}}     # delegates
    {"field": {"f": <name>, "query": <value>}}           # term/equality
    {"range": {"f": <name>, "lower": a, "upper": b,
               "include_lower": true, "include_upper": true}}
    {"prefix": {"f": <name>, "query": "pre"}}
    "<bare query string>"                                # lucene shorthand

``should`` inside a ``bool`` with a ``must`` acts as Solr scores it
for FILTERING purposes: it does not restrict the match set (pure
boost); with no ``must``, at least one ``should`` clause must match.
Everything compiles to one Column predicate — same pushdown story as
the string parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JsonDslError(ValueError):
    pass


def _all(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _any(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def parse_json_query(node, text_fields: set[str] | None = None) -> Column:
    """Compile a JSON DSL query node to a Column predicate."""
    text_fields = text_fields or set()

    if isinstance(node, str):
        from hbase_increment_index_spark.search.solr_query import parse_query

        return parse_query(node, text_fields)
    if not isinstance(node, dict) or len(node) != 1:
        raise JsonDslError(f"query node must be a string or a 1-key object: {node!r}")
    (kind, body), = node.items()

    if kind == "bool":
        must = [parse_json_query(n, text_fields) for n in body.get("must", [])]
        should = [parse_json_query(n, text_fields) for n in body.get("should", [])]
        must_not = [parse_json_query(n, text_fields) for n in body.get("must_not", [])]
        if not (must or should or must_not):
            raise JsonDslError("bool query needs must/should/must_not")
        clauses: list[Column] = []
        if must:
            clauses.append(_all(must))
        elif should:
            # no must -> at least one should matches (Solr minimum-match)
            clauses.append(_any(should))
        if must_not:
            clauses.append(~_any(must_not))
        return _all(clauses)
    if kind == "lucene":
        from hbase_increment_index_spark.search.solr_query import parse_query

        return parse_query(body["query"], text_fields)
    if kind == "field":
        try:
            f, v = body["f"], body["query"]
        except KeyError as exc:
            raise JsonDslError(f"field query needs {exc.args[0]!r}") from None
        if f in text_fields:
            from hbase_increment_index_spark.search.tokenize import has_token

            return has_token(f, str(v))
        return F.col(f) == F.lit(v)
    if kind == "range":
        try:
            f = body["f"]
        except KeyError:
            raise JsonDslError("range query needs 'f'") from None
        conds = []
        if "lower" in body and body["lower"] is not None:
            op = "__ge__" if body.get("include_lower", True) else "__gt__"
            conds.append(getattr(F.col(f), op)(F.lit(body["lower"])))
        if "upper" in body and body["upper"] is not None:
            op = "__le__" if body.get("include_upper", True) else "__lt__"
            conds.append(getattr(F.col(f), op)(F.lit(body["upper"])))
        if not conds:
            raise JsonDslError("range query needs lower and/or upper")
        return _all(conds)
    if kind == "prefix":
        try:
            return F.col(body["f"]).startswith(str(body["query"]))
        except KeyError as exc:
            raise JsonDslError(f"prefix query needs {exc.args[0]!r}") from None
    raise JsonDslError(f"unsupported query type {kind!r}")


def json_domain(
    df: DataFrame, request: dict, text_fields: set[str] | None = None
) -> DataFrame:
    """The request's MATCH DOMAIN: query + filters applied, no
    sort/paging/projection. This is the frame facets compute over
    (Solr's default facet domain) and the first stage of
    ``json_select`` — one shared implementation so docs and facets can
    never drift apart."""
    out = df
    if "query" in request and request["query"] not in (None, "*:*"):
        out = out.filter(parse_json_query(request["query"], text_fields))
    for flt in request.get("filter", []):
        out = out.filter(parse_json_query(flt, text_fields))
    return out


def json_select(
    df: DataFrame, request: dict, text_fields: set[str] | None = None
) -> DataFrame:
    """The JSON Request API's relational core: ``query`` + ``filter``
    list + ``fields`` + ``sort`` + ``offset``/``limit`` applied to a
    DataFrame — each JSON key maps onto the same plan the classic
    params produce (filters AND-ed, sort multi-key, offset via the
    bucket-set row_number only when requested)."""
    out = json_domain(df, request, text_fields)
    sort_spec = request.get("sort")
    if sort_spec:
        cols = []
        for part in sort_spec.split(","):
            bits = part.split()
            c = F.col(bits[0])
            cols.append(c.desc() if len(bits) > 1 and bits[1].lower() == "desc" else c.asc())
        out = out.orderBy(*cols)
    offset = int(request.get("offset", 0))
    limit = request.get("limit")
    if offset:
        if not sort_spec:
            raise JsonDslError("offset requires sort for a deterministic page")
        # NOTE: determinism additionally requires the sort to be a
        # TOTAL order — append a unique key (q71 sorts on
        # "n_chars desc, doc_id asc") or tied rows may migrate
        # between pages across runs
        from pyspark.sql import Window

        rn = F.row_number().over(Window.orderBy(*cols))
        out = out.withColumn("_rn", rn).filter(F.col("_rn") > offset)
        if limit is not None:
            out = out.filter(F.col("_rn") <= offset + int(limit))
        out = out.drop("_rn")
    elif limit is not None:
        out = out.limit(int(limit))
    if "fields" in request:  # projection LAST so sort/offset keys stay available
        out = out.select(*[c.strip() for c in request["fields"].split(",")])
    return out
