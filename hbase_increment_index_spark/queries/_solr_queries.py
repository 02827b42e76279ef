"""Solr query surface, part 1: filters, full text, ranking, facets, stats."""
from __future__ import annotations
from hbase_increment_index_spark.cdc.cell_model import cell_log_from_events
from hbase_increment_index_spark.cdc.compaction import live_cells
from hbase_increment_index_spark.numeric import exact_sum
from hbase_increment_index_spark.pipeline.text import fingerprint
from hbase_increment_index_spark.search import facets, filters, paging, ranking, stats
from hbase_increment_index_spark.search.tokenize import has_all_tokens, has_any_token
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ._cdc import _SQL_CELL_LOG
from ._shared import _SAVED_QUERIES, _SQL_FP, _SQL_TOKS, _TFIDF_TERMS, _t



# --------------------------------------------------------------------------
# Q1–Q5, Q9, Q17 — filter surface
# --------------------------------------------------------------------------

def q01_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(filters.eq("o_orderstatus", "F")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


Q01_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'"


def q02_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        filters.range_between("l_quantity", 10.0, 20.0)
        & (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


Q02_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_quantity BETWEEN 10.0 AND 20.0
  AND l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
"""


def q03_boolean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pred = (filters.eq("o_orderstatus", "O") & (F.col("o_totalprice") > 150000.0)) | (
        filters.eq("o_orderpriority", "1-URGENT") & ~(F.col("o_custkey") % 2 == 0)
    )
    return orders.filter(pred).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


Q03_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice > 150000.0)
   OR (o_orderpriority = '1-URGENT' AND NOT (o_custkey % 2 = 0))
"""


def q04_fulltext_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(has_all_tokens("text", ["spark", "join"])).select("doc_id", "lang", "source")


Q04_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE list_contains({_SQL_TOKS.format(c='text')}, 'spark')
  AND list_contains({_SQL_TOKS.format(c='text')}, 'join')
"""


def q03b_solr_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference user's actual query language: a raw Solr query
    string parsed by search.solr_query into the same predicate Q3
    builds by hand. Oracle spells out the equivalent SQL."""
    from hbase_increment_index_spark.search.solr_query import solr_select

    orders = _t(spark, sf_dir, "orders")
    q = "(o_orderstatus:O AND o_totalprice:[150000 TO *]) OR NOT o_orderpriority:1-URGENT"
    return solr_select(orders, q).select("o_orderkey", "o_orderstatus", "o_totalprice")


Q03B_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice >= 150000)
   OR NOT (o_orderpriority = '1-URGENT')
"""


def q04c_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as q04_fulltext_and but answered through the
    materialized inverted index (build → posting join → semi-join back)
    — the Solr/Lucene build-once path. Oracle: identical to Q04."""
    from hbase_increment_index_spark.search.inverted import (
        build_inverted_index,
        search_with_index,
    )

    docs = _t(spark, sf_dir, "documents")
    postings = build_inverted_index(docs, "doc_id", "text")
    return search_with_index(docs, postings, "doc_id", ["spark", "join"], op="and").select(
        "doc_id", "lang", "source"
    )


def q05_prefix_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        filters.prefix("source", "src1") & filters.wildcard("lang", "e?")
    ).select("doc_id", "lang", "source")


Q05_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE source LIKE 'src1%' AND lang LIKE 'e_'
"""


def q05b_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(filters.phrase("text", ["group", "by"])).select("doc_id", "source")


Q05B_SQL = r"""
SELECT doc_id, source
FROM documents
WHERE regexp_matches(lower(text), '\bgroup\s+by\b')
"""


def q04b_fulltext_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(has_any_token("text", ["dup", "hash"])).select(
        "doc_id", "lang", "source"
    )


Q04B_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE list_contains({_SQL_TOKS.format(c='text')}, 'dup')
   OR list_contains({_SQL_TOKS.format(c='text')}, 'hash')
"""


def q08b_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor (keyset) pagination: page 2 fetched via the last key of
    page 1 — O(rows) at any depth, unlike offset paging. The 'after'
    cursor is fixed to page-1's true last row so the oracle can state
    the same predicate."""
    from hbase_increment_index_spark.search.paging import keyset_page, sorted_page

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    page1 = sorted_page(
        orders, order=[F.col("o_totalprice").desc()], tie_break="o_orderkey", rows=20
    )
    last = page1.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").desc()).head()
    return keyset_page(
        orders,
        "o_totalprice",
        "o_orderkey",
        after=(last["o_totalprice"], last["o_orderkey"]),
        rows=20,
    )


Q08B_SQL = """
WITH p1 AS (
  SELECT o_orderkey, o_totalprice FROM orders
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
),
last AS (
  SELECT o_totalprice AS sv, o_orderkey AS tv FROM p1
  ORDER BY o_totalprice ASC, o_orderkey DESC LIMIT 1
)
SELECT o_orderkey, o_totalprice
FROM orders, last
WHERE o_totalprice < last.sv
   OR (o_totalprice = last.sv AND o_orderkey > last.tv)
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q09_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name", "c_mktsegment")


Q09_SQL = "SELECT c_custkey, c_name, c_mktsegment FROM customer"


def q17_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return filters.by_id(docs, "doc_id", 42).select("doc_id", "lang", "source", "n_chars")


Q17_SQL = "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42"


def q05c_phrase_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-served phrase query over POSITIONAL postings (Lucene
    parity — the raw-text regex path is q05b): docs containing the
    exact consecutive sequence 'stream table hash', with occurrence
    counts, computed entirely from (term, id, positions) posting
    slices."""
    from hbase_increment_index_spark.search.inverted import (
        build_positional_index,
        phrase_match_from_index,
    )

    docs = _t(spark, sf_dir, "documents")
    pp = build_positional_index(docs, "doc_id", "text", terms=["stream", "table", "hash"])
    return phrase_match_from_index(pp, ["stream", "table", "hash"], "doc_id")


Q05C_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents
)
SELECT * FROM (
  SELECT doc_id,
         CAST(len(list_filter(generate_series(1, greatest(len(t) - 2, 0)),
                  i -> t[i] = 'stream' AND t[i+1] = 'table' AND t[i+2] = 'hash')) AS BIGINT)
           AS n_occurrences
  FROM toks
) WHERE n_occurrences > 0
"""


def q05d_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr sloppy phrase ``q=text:"stream table hash"~2`` served from
    positional postings: terms in order within (k-1)+slop positions —
    a strict superset of the exact-phrase matches (q05c). Greedy
    smallest-next-position chain fold; see
    search.inverted.sloppy_phrase_from_index."""
    from hbase_increment_index_spark.search.inverted import (
        build_positional_index,
        sloppy_phrase_from_index,
    )

    docs = _t(spark, sf_dir, "documents")
    pp = build_positional_index(docs, "doc_id", "text", terms=["stream", "table", "hash"])
    return sloppy_phrase_from_index(pp, ["stream", "table", "hash"], "doc_id", slop=2)


# Same greedy chain fold in DuckDB: per-term sorted position lists,
# struct chains {s: start, c: current end}, smallest-next step per
# term, final span check (k-1)+slop = 4.
Q05D_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents
),
pos AS (
  SELECT doc_id, t[i] AS term, i - 1 AS p
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
p1 AS (SELECT doc_id, list(p ORDER BY p) AS ps FROM pos WHERE term = 'stream' GROUP BY 1),
p2 AS (SELECT doc_id, list(p ORDER BY p) AS ps FROM pos WHERE term = 'table' GROUP BY 1),
p3 AS (SELECT doc_id, list(p ORDER BY p) AS ps FROM pos WHERE term = 'hash' GROUP BY 1),
c1 AS (
  SELECT doc_id, list_transform(ps, q -> {{'s': q, 'c': q}}) AS chains FROM p1
),
c2 AS (
  SELECT c1.doc_id,
         list_filter(
           list_transform(c1.chains,
             ch -> {{'s': ch.s, 'c': list_min(list_filter(p2.ps, q -> q > ch.c))}}),
           ch -> ch.c IS NOT NULL) AS chains
  FROM c1 JOIN p2 USING (doc_id)
),
c3 AS (
  SELECT c2.doc_id,
         list_filter(
           list_transform(c2.chains,
             ch -> {{'s': ch.s, 'c': list_min(list_filter(p3.ps, q -> q > ch.c))}}),
           ch -> ch.c IS NOT NULL) AS chains
  FROM c2 JOIN p3 USING (doc_id)
)
SELECT doc_id,
       CAST(len(list_filter(chains, ch -> ch.c - ch.s <= 4)) AS BIGINT) AS n_occurrences
FROM c3
WHERE len(list_filter(chains, ch -> ch.c - ch.s <= 4)) > 0
"""


def q06_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ranking.tfidf_topk(docs, "doc_id", "text", _TFIDF_TERMS, k=10)


Q06_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents
),
hits AS (SELECT * FROM toks WHERE term IN ('join', 'query', 'spark')),
tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM hits GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT tf.doc_id, ROUND(SUM(tf.tf * ln(n.n_docs / dft.df_t)), 6) AS score
FROM tf JOIN dft USING (term), n
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT 10
"""


def q06b_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ranking.bm25_topk(docs, "doc_id", "text", _TFIDF_TERMS, k=10)


Q06B_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS a FROM dl),
hits AS (SELECT * FROM toks WHERE term IN ('join', 'query', 'spark')),
tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM hits GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT tf.doc_id,
       ROUND(SUM(
         ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
         * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.a))
       ), 6) AS score
FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), n, avgdl
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q7/Q8/Q15 — sort, pagination, group-top-N
# --------------------------------------------------------------------------

def q06c_bm25_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranking as q06b but served purely from the materialized
    inverted index — the corpus is never re-read or re-tokenized at
    query time (the Solr serving path; doc lengths and corpus stats
    derive from the postings). n_docs counts indexed docs (≥1 token),
    which equals the corpus count on these fixtures."""
    from hbase_increment_index_spark.search.inverted import build_inverted_index

    docs = _t(spark, sf_dir, "documents")
    postings = build_inverted_index(docs, "doc_id", "text")
    return ranking.bm25_topk_from_index(postings, "doc_id", list(_TFIDF_TERMS), k=10)


Q06C_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents
),
p AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM p GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / count(*) AS avg_dl
  FROM dl
),
hits AS (SELECT * FROM p WHERE term IN ('join', 'query', 'spark')),
dft AS (SELECT term, count(*) AS df_t FROM hits GROUP BY 1)
SELECT h.doc_id,
       ROUND(SUM(
         ln(1.0 + (s.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
         * (h.tf * (1.2 + 1)) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avg_dl))
       ), 6) AS score
FROM hits h JOIN dft USING (term) JOIN dl USING (doc_id), stats s
GROUP BY h.doc_id
ORDER BY score DESC, h.doc_id ASC
LIMIT 10
"""


def q07_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return paging.sorted_page(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        order=[F.col("o_totalprice").desc()],
        tie_break="o_orderkey",
        start=0,
        rows=20,
    )


Q07_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q08_deep_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return paging.sorted_page(
        orders.select("o_orderkey", "o_totalprice"),
        order=[F.col("o_totalprice").desc()],
        tie_break="o_orderkey",
        start=100,
        rows=20,
    )


Q08_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20 OFFSET 100
"""


def q15_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return paging.group_top_n(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        group_field="o_custkey",
        order=[F.col("o_totalprice").desc()],
        tie_break="o_orderkey",
        n=2,
    )


Q15_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
) <= 2
"""


def q15b_group_ngroups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``group.ngroups=true`` — the response-header pair
    ``(matches, ngroups)`` Solr reports next to q15's grouped hits:
    total matching docs and distinct group count, over a filtered
    match set. Two-phase per-group partial counts (no Expand)."""
    orders = _t(spark, sf_dir, "orders")
    return paging.group_ngroups(
        orders.filter(F.col("o_totalprice") > 150000.0), "o_custkey"
    )


Q15B_SQL = """
SELECT CAST(count(*) AS BIGINT) AS matches,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS ngroups
FROM orders
WHERE o_totalprice > 150000.0
"""


def q15c_group_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``group.facet=true`` — facet counts BY GROUP over the
    grouped result set (the standard companion to ``group.field``):
    for each o_orderpriority value, the number of CUSTOMERS (groups)
    with at least one matching big-ticket order, not the number of
    orders (facets.facet_by_group: one count-distinct hash agg, no
    window, no join)."""
    orders = _t(spark, sf_dir, "orders")
    return facets.facet_by_group(
        orders.filter(F.col("o_totalprice") > 150000.0),
        group_field="o_custkey",
        facet_field="o_orderpriority",
    )


Q15C_SQL = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_groups
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
ORDER BY n_groups DESC, o_orderpriority ASC
"""


# --------------------------------------------------------------------------
# Q10–Q14, Q16 — facets, stats, distinct, pivot
# --------------------------------------------------------------------------

def q10_facet_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return facets.facet_field(docs, "lang", count_alias="n")


Q10_SQL = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def q11_facet_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = facets.facet_range(orders, "o_totalprice", 20000.0, bucket_alias="bucket_start", count_alias="n")
    return out.withColumn("bucket_start", F.col("bucket_start").cast("long"))


Q11_SQL = """
SELECT CAST(FLOOR(o_totalprice / 20000.0) * 20000.0 AS BIGINT) AS bucket_start,
       count(*) AS n
FROM orders
GROUP BY 1
"""


def q11c_facet_range_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``facet.range=o_totalprice&start=50000&end=250000&gap=50000
    &facet.range.other=all``: gap buckets plus before/after/between
    counts — one scan, one hash agg (see facets.facet_range_other)."""
    orders = _t(spark, sf_dir, "orders")
    return facets.facet_range_other(orders, "o_totalprice", 50000.0, 250000.0, 50000.0)


Q11C_SQL = """
WITH lab AS (
  SELECT CASE WHEN o_totalprice < 50000.0 THEN 'before'
              WHEN o_totalprice >= 250000.0 THEN 'after'
              ELSE CAST(CAST(FLOOR((o_totalprice - 50000.0) / 50000.0) * 50000.0 + 50000.0 AS BIGINT) AS VARCHAR)
         END AS bucket
  FROM orders
),
counts AS (SELECT bucket, count(*) AS n FROM lab GROUP BY 1)
SELECT bucket, n FROM counts
UNION ALL
SELECT 'between', CAST(COALESCE(SUM(n), 0) AS BIGINT)
FROM counts WHERE bucket NOT IN ('before', 'after')
"""


def q11e_facet_range_include(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``facet.range.include=upper,outer`` boundary semantics over
    l_quantity (integer-valued, so boundary hits are frequent): gap
    buckets become (lb, ub] instead of [lb, ub), and under ``outer``
    the end point 40 counts in BOTH the last bucket and ``after`` —
    the double-count case a single CASE label cannot express
    (facets.facet_range_include: per-row label array → explode → one
    hash agg, still a single corpus scan)."""
    li = _t(spark, sf_dir, "lineitem")
    out = facets.facet_range_include(
        li, "l_quantity", 10.0, 40.0, 10.0, include=("upper", "outer")
    )
    return out.orderBy(F.col("bucket").asc())


Q11E_SQL = """
WITH li AS (SELECT l_quantity AS v FROM lineitem)
SELECT * FROM (
  SELECT '10' AS bucket, count(*) AS n FROM li WHERE v > 10 AND v <= 20
  UNION ALL SELECT '20', count(*) FROM li WHERE v > 20 AND v <= 30
  UNION ALL SELECT '30', count(*) FROM li WHERE v > 30 AND v <= 40
  UNION ALL SELECT 'before', count(*) FROM li WHERE v <= 10
  UNION ALL SELECT 'after', count(*) FROM li WHERE v >= 40
  UNION ALL SELECT 'between', count(*) FROM li WHERE v > 10 AND v <= 40
)
ORDER BY bucket ASC
"""


def q11b_facet_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    out = facets.facet_time(events, "ts", unit="day", bucket_alias="bucket", count_alias="n")
    return out.select(F.date_format("bucket", "yyyy-MM-dd").alias("day"), "n")


Q11B_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS n
FROM events
GROUP BY 1
"""


def q77_collection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-alias search (a Solr alias over N same-schema
    collections): each shard-collection scores with its OWN corpus
    statistics — the classic distributed-IDF artifact (Solr's default
    before `statsCache`): the same document can rank differently than
    under global stats. Here the corpus splits into two 'collections'
    (even/odd ids), each runs BM25 with local stats, results fuse by
    score. Output keeps the collection tag so the artifact is visible;
    the global-stats cure is exactly q06b on the union."""
    docs = _t(spark, sf_dir, "documents")
    terms = list(_TFIDF_TERMS)
    legs = []
    for tag, pred in (("even", F.col("doc_id") % 2 == 0), ("odd", F.col("doc_id") % 2 == 1)):
        leg = ranking.bm25_topk(docs.filter(pred), "doc_id", "text", terms, k=10)
        legs.append(leg.withColumn("collection", F.lit(tag)))
    fused = legs[0].unionByName(legs[1])
    return fused.select("doc_id", "collection", "score").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(10)


def _q77_sql() -> str:
    toks = _SQL_TOKS.format(c="text")

    def leg(parity: int, tag: str) -> str:
        return f"""
{tag}_toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents WHERE doc_id % 2 = {parity}
),
{tag}_dl AS (SELECT doc_id, count(*) AS dl FROM {tag}_toks GROUP BY 1),
{tag}_avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS a FROM {tag}_dl),
{tag}_n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents WHERE doc_id % 2 = {parity}),
{tag}_hits AS (SELECT * FROM {tag}_toks WHERE term IN ('join', 'query', 'spark')),
{tag}_tf AS (SELECT doc_id, term, count(*) AS tf FROM {tag}_hits GROUP BY 1, 2),
{tag}_dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM {tag}_hits GROUP BY 1),
{tag}_scored AS (
  SELECT tf.doc_id, '{tag}' AS collection,
         ROUND(SUM(
           ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.a))
         ), 6) AS score
  FROM {tag}_tf tf JOIN {tag}_dft dft USING (term) JOIN {tag}_dl dl USING (doc_id),
       {tag}_n n, {tag}_avgdl avgdl
  GROUP BY tf.doc_id
),
{tag}_top AS (SELECT * FROM {tag}_scored ORDER BY score DESC, doc_id ASC LIMIT 10)"""

    return f"""
WITH {leg(0, 'even')},
{leg(1, 'odd')}
SELECT doc_id, collection, score
FROM (SELECT * FROM even_top UNION ALL SELECT * FROM odd_top)
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


def q76_index_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index profile (the /admin/segments-style capacity report): per
    vocabulary first-letter bucket — distinct terms, total postings
    rows, max document frequency. The planning numbers behind the
    range-partitioned postings layout (inverted.write_inverted_index
    partitions by term — this histogram sizes those ranges). One agg
    over the postings."""
    from hbase_increment_index_spark.search.tokenize import posting_list

    docs = _t(spark, sf_dir, "documents")
    post = posting_list(docs, "doc_id", "text")
    per_term = post.groupBy("term").agg(
        F.count(F.lit(1)).alias("postings"),
        F.countDistinct("doc_id").alias("df"),
    )
    return (
        per_term.groupBy(F.substring("term", 1, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("postings").cast("bigint").alias("postings_rows"),
            F.max("df").alias("max_df"),
        )
        .orderBy(F.col("bucket").asc())
    )


Q76_SQL = f"""
WITH post AS (
  SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents
),
per_term AS (
  SELECT term, count(*) AS postings, count(DISTINCT doc_id) AS df
  FROM post GROUP BY term
)
SELECT substr(term, 1, 1) AS bucket,
       count(*) AS n_terms,
       CAST(SUM(postings) AS BIGINT) AS postings_rows,
       MAX(df) AS max_df
FROM per_term
GROUP BY 1
ORDER BY bucket ASC
"""


def q75_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search / percolation — saved-search alerting over the
    reference's change stream: STORED queries (required-term
    conjunctions) are matched against the INCOMING document batch
    (doc_id % 50 == 0 as the delta), emitting (query, doc) alert
    pairs. The stored-query table is broadcast (saved searches are
    few); matching is one projection per doc over its token array —
    no index, no corpus scan, work ∝ batch × queries. The streaming
    form runs the same expression inside foreachBatch."""
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    saved = spark.createDataFrame(
        [(qid, terms) for qid, terms in _SAVED_QUERIES], ["query_id", "req_terms"]
    )
    j = docs.select("doc_id", tokens("text").alias("_toks")).crossJoin(
        F.broadcast(saved)
    )
    matched = j.filter(
        F.forall(F.col("req_terms"), lambda t: F.array_contains(F.col("_toks"), t))
    )
    return (
        matched.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.col("query_id").asc())
    )


def _q75_sql() -> str:
    vals = ", ".join(
        "(" + str(qid) + ", [" + ", ".join(f"'{t}'" for t in terms) + "])"
        for qid, terms in _SAVED_QUERIES
    )
    toks = _SQL_TOKS.format(c="text")
    return f"""
WITH saved(query_id, req_terms) AS (VALUES {vals}),
delta AS (SELECT doc_id, {toks} AS toks FROM documents WHERE doc_id % 50 = 0),
matched AS (
  SELECT s.query_id, d.doc_id
  FROM delta d CROSS JOIN saved s
  WHERE NOT EXISTS (
    SELECT 1 FROM unnest(s.req_terms) AS r(t) WHERE NOT list_contains(d.toks, t)
  )
)
SELECT query_id, count(*) AS n_alerts, MIN(doc_id) AS first_doc
FROM matched
GROUP BY query_id
ORDER BY query_id ASC
"""


def q39c_json_facet_range_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json.facet RANGE subfacet under a terms facet
    (``{type:terms, field:l_returnflag, facet:{prices:{type:range,
    field:l_extendedprice, gap:20000}}}``): per term bucket, fixed-
    width price bands with counts and exact-decimal revenue — one
    (term, band) hash agg on the same scan, flattened rows."""
    li = _t(spark, sf_dir, "lineitem")
    band = (F.floor(F.col("l_extendedprice") / 20000) * 20000).cast("bigint")
    return (
        li.groupBy(F.col("l_returnflag"), band.alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_sum("l_extendedprice", 6), 2).alias("revenue"),
        )
        .orderBy(F.col("l_returnflag").asc(), F.col("price_band").asc())
    )


Q39C_SQL = """
SELECT l_returnflag,
       CAST(FLOOR(l_extendedprice / 20000) * 20000 AS BIGINT) AS price_band,
       count(*) AS n,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
FROM lineitem
GROUP BY 1, 2
ORDER BY l_returnflag ASC, price_band ASC
"""


def q40b_collapse_by_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time result dedup — field collapsing on the CONTENT
    FINGERPRINT (Solr: collapse on a SignatureUpdateProcessor field):
    the BM25 head keeps one best-scoring representative per exact-
    duplicate group, so a result page never shows the same text
    twice. Collapse runs on the broadcast-small head, one window."""
    from pyspark.sql import Window

    from hbase_increment_index_spark.pipeline.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    head = ranking.bm25_topk(docs, "doc_id", "text", list(_TFIDF_TERMS), k=50)
    # fingerprint AFTER the join so the md5 runs on the 50 head rows,
    # not the whole corpus scan side
    sig = head.join(docs.select("doc_id", "text"), "doc_id").withColumn(
        "sig", fingerprint(F.col("text"))
    )
    w = Window.partitionBy("sig").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        sig.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "score", "sig")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _q40b_sql() -> str:
    fp = _SQL_FP.format(c="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS a FROM dl),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
hits AS (SELECT * FROM toks WHERE term IN ('join', 'query', 'spark')),
tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM hits GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.a))
         ), 6) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), n, avgdl
  GROUP BY tf.doc_id
),
head AS (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT 50),
sig AS (
  SELECT h.doc_id, h.score, {fp} AS sig
  FROM head h JOIN documents d USING (doc_id)
),
collapsed AS (
  SELECT doc_id, score, sig,
         ROW_NUMBER() OVER (PARTITION BY sig ORDER BY score DESC, doc_id ASC) AS rn
  FROM sig
)
SELECT doc_id, score, sig
FROM collapsed WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


def q74_pseudo_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr pseudo-fields (``fl=id,margin:sub(...),damped:recip(...)``):
    computed fields in the field list, each a function-query expression
    compiled into the projection — zero extra cost beyond the
    expression itself (search.function_query)."""
    from hbase_increment_index_spark.search.function_query import parse_function_query

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return (
        li.select(
            F.col("l_orderkey").alias("id"),
            F.round(
                parse_function_query("product(l_extendedprice, sub(1, l_discount))"), 6
            ).alias("margin"),
            F.round(
                parse_function_query("recip(l_quantity, 1, 50, 50)"), 6
            ).alias("damped"),
        )
        .orderBy(F.col("margin").desc(), F.col("id").asc())
        .limit(20)
    )


Q74_SQL = """
SELECT l_orderkey AS id,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS margin,
       ROUND(50 / (1 * l_quantity + 50), 6) AS damped
FROM lineitem
WHERE l_linenumber = 1
ORDER BY margin DESC, id ASC
LIMIT 20
"""


def q06d_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``debug=true`` scoring explanation: the per-term BM25
    contribution breakdown (idf, tf, weight) for the top-ranked
    document of the q06b query — the relevance-debugging surface.
    The winning doc id comes from the same TakeOrdered head (1-row
    broadcast), so the explanation adds one postings-slice lookup,
    never a rescore of the corpus."""
    from hbase_increment_index_spark.search.tokenize import posting_list, tokens

    docs = _t(spark, sf_dir, "documents")
    terms = list(_TFIDF_TERMS)
    top = ranking.bm25_topk(docs, "doc_id", "text", terms, k=1).select("doc_id")

    k1, b = 1.2, 0.75
    tdf = spark.createDataFrame([(t,) for t in sorted(set(terms))], ["term"])
    doc_len = docs.select(F.col("doc_id"), F.size(tokens("text")).alias("dl"))
    stats = doc_len.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    hits = posting_list(docs, "doc_id", "text").join(F.broadcast(tdf), "term")
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.col("avg_dl"))
    )
    return (
        tf.join(F.broadcast(top), "doc_id")
        .join(F.broadcast(df_t), "term")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            "df_t",
            F.round(idf, 6).alias("idf"),
            F.round(idf * tf_part, 6).alias("weight"),
        )
        .orderBy(F.col("term").asc())
    )


Q06D_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({{toks}}) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS a FROM dl),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
hits AS (SELECT * FROM toks WHERE term IN ('join', 'query', 'spark')),
tf AS (SELECT doc_id, term, count(*) AS tf FROM hits GROUP BY 1, 2),
dft AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM hits GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
           * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.a))
         ), 6) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), n, avgdl
  GROUP BY tf.doc_id
),
top AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT tf.doc_id, tf.term, tf.tf, dft.df_t,
       ROUND(ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5)), 6) AS idf,
       ROUND(ln(1.0 + (n.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
             * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.a)), 6) AS weight
FROM tf JOIN top USING (doc_id) JOIN dft USING (term) JOIN dl USING (doc_id), n, avgdl
ORDER BY tf.term ASC
""".replace("{toks}", _SQL_TOKS.format(c="text"))


def q29c_suggest_infix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr AnalyzingInfixSuggester — completions matching ANYWHERE in
    the term ('ar' hits 'spark' and 'large'), the mid-word-lookahead
    suggester Solr ships alongside the prefix one
    (search.highlight.suggest_terms_infix; one scan, one
    vocabulary-bounded hash agg, TakeOrdered head)."""
    from hbase_increment_index_spark.search.highlight import suggest_terms_infix

    docs = _t(spark, sf_dir, "documents")
    return suggest_terms_infix(docs, "doc_id", "text", fragment="a", k=10)


Q29C_SQL = f"""
SELECT term, count(*) AS freq
FROM (SELECT unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
WHERE term LIKE '%a%'
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 10
"""


def q29b_suggest_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr suggester CONTEXT FILTERING (``suggest.cfq``): completions
    restricted to a context subset — here prefix 's' over English
    documents only. The context predicate pushes into the scan before
    tokenization, so the suggestion build pays only for the context's
    slice (at scale: a context-partitioned suggestion index)."""
    from hbase_increment_index_spark.search.highlight import suggest_terms

    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return suggest_terms(docs, "doc_id", "text", prefix="s", k=10)


Q29B_SQL = f"""
SELECT term, count(*) AS freq
FROM (SELECT unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents WHERE lang = 'en')
WHERE term LIKE 's%'
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 10
"""


def q53b_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-schema discovery over the open cell model (the
    reference's qualifiers are schemaless strings,
    HbaseSolrIndexCoprocesser.java:46-48): per qualifier, how many
    live cells parse as numeric, the numeric share, and the value
    length range — the report that tells you which dynamic fields
    deserve a typed projection. try_cast in both engines (never
    throws under ANSI); one unpivot-free agg over live cells."""
    from hbase_increment_index_spark.cdc.cell_model import cell_log_from_events
    from hbase_increment_index_spark.cdc.compaction import live_cells

    events = _t(spark, sf_dir, "events")
    live = live_cells(cell_log_from_events(events, delete_event_type="error"))
    is_num = F.expr("try_cast(value AS DOUBLE)").isNotNull()
    return (
        live.groupBy("qualifier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_num.cast("long")).alias("n_numeric"),
            F.round(F.sum(is_num.cast("long")) / F.count(F.lit(1)), 6).alias("numeric_share"),
            F.min(F.length("value")).alias("min_len"),
            F.max(F.length("value")).alias("max_len"),
        )
        .orderBy(F.col("qualifier").asc())
    )


def _q53b_sql() -> str:
    return """
WITH log AS ({log}),
cell_latest AS (
  SELECT * FROM log
  QUALIFY row_number() OVER (
    PARTITION BY row_key, family, qualifier ORDER BY ts DESC, seq DESC) = 1
),
row_latest AS (
  SELECT row_key, op AS row_op FROM log
  QUALIFY row_number() OVER (PARTITION BY row_key ORDER BY ts DESC, seq DESC) = 1
),
live AS (
  SELECT c.qualifier, c.value
  FROM cell_latest c JOIN row_latest r USING (row_key)
  WHERE c.op = 'put' AND r.row_op = 'put'
)
SELECT qualifier, count(*) AS n,
       CAST(SUM(CASE WHEN TRY_CAST(value AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
       ROUND(SUM(CASE WHEN TRY_CAST(value AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) / count(*), 6) AS numeric_share,
       MIN(length(value)) AS min_len,
       MAX(length(value)) AS max_len
FROM live
GROUP BY qualifier
ORDER BY qualifier ASC
""".replace("{log}", _SQL_CELL_LOG.format(delete_type="error"))


def q72_text_tagger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SolrTextTagger (the /tag handler): dictionary-driven phrase
    tagging — every occurrence of a gazetteer phrase in the corpus is
    tagged and counted. The gazetteer here is corpus-derived (frequent
    bigrams of the eval slice, ≥3 occurrences — production supplies
    its entity list); tagging is doc bigrams ⋈ BROADCAST dictionary,
    the Spark-native stand-in for the tagger's in-memory FST: one
    corpus scan, no shuffle beyond the per-phrase count agg."""
    from hbase_increment_index_spark.pipeline.dedup import shingle_grams

    docs = _t(spark, sf_dir, "documents")
    gaz = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(shingle_grams("text", 2)).alias("phrase"))
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
        .select("phrase")
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    tags = corpus.select(
        "doc_id", F.explode(shingle_grams("text", 2)).alias("phrase")
    ).join(F.broadcast(gaz), "phrase")
    return (
        tags.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_tags"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_tags").desc(), F.col("phrase").asc())
        .limit(15)
    )


def _q72_sql() -> str:
    toks = _SQL_TOKS.format(c="text")
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks}) - 1, 0)), "
        f"i -> array_to_string(list_slice({toks}, i, i + 1), ' '))"
    )
    return f"""
WITH gaz AS (
  SELECT g AS phrase
  FROM (SELECT unnest({grams}) AS g FROM documents WHERE doc_id % 50 = 0)
  GROUP BY g HAVING count(*) >= 3
),
tags AS (
  SELECT doc_id, g AS phrase
  FROM (SELECT doc_id, unnest({grams}) AS g FROM documents WHERE doc_id % 50 <> 0)
  JOIN gaz ON g = phrase
)
SELECT phrase, count(*) AS n_tags, count(DISTINCT doc_id) AS n_docs
FROM tags
GROUP BY phrase
ORDER BY n_tags DESC, phrase ASC
LIMIT 15
"""


def q71_json_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr JSON Request API: the literal JSON body a modern client
    POSTs — bool must/should/must_not over field/range/prefix nodes,
    plus filter / fields / sort / offset / limit — compiled to one
    DataFrame plan (search.json_dsl)."""
    from hbase_increment_index_spark.search.json_dsl import json_select

    docs = _t(spark, sf_dir, "documents")
    request = {
        "query": {
            "bool": {
                "must": [
                    {"field": {"f": "text", "query": "data"}},
                    {"range": {"f": "n_chars", "lower": 200, "include_lower": True}},
                ],
                "must_not": [{"field": {"f": "lang", "query": "de"}}],
            }
        },
        "filter": [{"prefix": {"f": "source", "query": "src1"}}],
        "fields": "doc_id,lang,source,n_chars",
        "sort": "n_chars desc, doc_id asc",
        "offset": 5,
        "limit": 15,
    }
    return json_select(docs, request, text_fields={"text"})


Q71_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
  WHERE list_contains({_SQL_TOKS.format(c='text')}, 'data')
    AND n_chars >= 200
    AND NOT lang = 'de'
    AND source LIKE 'src1%'
)
WHERE rn > 5 AND rn <= 20
"""


def q70_group_func(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``group.func=floor(div(o_totalprice,50000))`` — result
    grouping keyed by a FUNCTION QUERY instead of a stored field: the
    compiled function expression becomes the groupBy key directly
    (search.function_query), one hash agg, nothing materialized."""
    from hbase_increment_index_spark.search.function_query import parse_function_query

    orders = _t(spark, sf_dir, "orders")
    key = parse_function_query("floor(div(o_totalprice, 50000))")
    return (
        orders.groupBy(key.cast("bigint").alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_sum("o_totalprice", 6), 2).alias("revenue"),
        )
        .orderBy(F.col("price_band").asc())
    )


Q70_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_band,
       count(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY price_band ASC
"""


def q69_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene SpanNearQuery with ``inOrder=false`` (Solr {!surround}
    ``3N`` / XML query parser spanNear): documents where 'data' and
    'spark' occur within 4 positions of each other IN EITHER ORDER —
    the unordered companion of the ordered sloppy phrase (q05d).
    Served from positional postings (same infra as q05c): the
    term-restricted index build keeps the groupBy shuffle ∝ the two
    terms' postings, the doc_id join intersects the containment sets,
    and the proximity HOF evaluates only on the (tiny) intersected
    position lists — never on the corpus scan."""
    from hbase_increment_index_spark.search.inverted import (
        build_positional_index,
        span_near_from_index,
    )

    docs = _t(spark, sf_dir, "documents")
    pp = build_positional_index(docs, "doc_id", "text", terms=["data", "spark"])
    return span_near_from_index(pp, "data", "spark", "doc_id", distance=4).orderBy(
        F.col("doc_id").asc()
    )


def _q69_sql() -> str:
    toks = _SQL_TOKS.format(c="text")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
pos AS (
  SELECT doc_id,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'data') AS p1,
         list_filter(generate_series(1, len(toks)), i -> toks[i] = 'spark') AS p2
  FROM t
)
SELECT doc_id FROM pos
WHERE len(p1) > 0 AND len(p2) > 0
  AND EXISTS (
    SELECT 1 FROM unnest(p1) AS a(a), unnest(p2) AS b(b) WHERE abs(a - b) <= 4
  )
ORDER BY doc_id ASC
"""


def q13b_stats_calcdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``stats.field={!calcdistinct=true}`` under ``stats.facet``:
    per-facet-bucket exact distinct-value count alongside the usual
    stats — two-phase: partial distinct on (bucket, value) then count,
    so the shuffle carries unique pairs, never raw rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.round(exact_sum("l_quantity", 2), 2).alias("sum_qty"),
        )
        .orderBy(F.col("l_returnflag").asc())
    )


Q13B_SQL = """
SELECT l_returnflag, count(*) AS n,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(DISTINCT l_suppkey) AS distinct_suppliers,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag ASC
"""


def q68_leading_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ReversedWildcardFilterFactory: a leading wildcard
    (``q=text:*tion``) is unsargable on a forward index — Solr indexes
    REVERSED tokens so it becomes a prefix query. Same trick here: the
    vocabulary is enumerated with reverse(term); the leading-wildcard
    literal reverses to a startswith, which on a persisted reversed
    vocabulary is a range-pruned prefix read. Output: matching terms +
    their document frequency, then the matching doc count."""
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("term")).distinct()
    suffix = "er"
    hits = toks.filter(F.reverse(F.col("term")).startswith(suffix[::-1]))
    return (
        hits.groupBy("term")
        .agg(F.count(F.lit(1)).alias("docfreq"))
        .orderBy(F.col("docfreq").desc(), F.col("term").asc())
    )


Q68_SQL = f"""
SELECT term, count(*) AS docfreq
FROM (SELECT DISTINCT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
WHERE reverse(term) LIKE 're%'
GROUP BY term
ORDER BY docfreq DESC, term ASC
"""


def q66_result_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr Clustering component (Carrot2): search results grouped
    into labeled clusters. Spark-first: the cluster structure is the
    deterministic embedding-LSH bucket (train-free, md5 planes — the
    same machinery as e3d, which makes the whole thing
    oracle-checkable, unlike Carrot2's iterative STC/Lingo), and each
    cluster is labeled with its two highest-document-frequency terms.
    Result set = docs matching the query token joined to their
    embeddings by id; clustering adds one (bucket, term) agg on top —
    no corpus scan beyond the filtered results."""
    from hbase_increment_index_spark.pipeline.similarity import build_lsh_buckets
    from hbase_increment_index_spark.search.tokenize import has_token, tokens

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    results = docs.filter(has_token("text", "data")).join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    bucketed = build_lsh_buckets(
        results, n_planes=3, dim=64, id_col="doc_id", plane_fn="md5"
    ).select("doc_id", "text", "bucket")
    term_df = (
        bucketed.select("bucket", "doc_id", F.explode(tokens("text")).alias("term"))
        .distinct()
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy(F.col("df").desc(), F.col("term").asc())
    labels = (
        term_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .groupBy("bucket")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "term"))),
                    lambda s: s["term"],
                ),
                ",",
            ).alias("label")
        )
    )
    sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sizes.join(labels, "bucket")
        .select("bucket", "label", "n_docs")
        .orderBy(F.col("bucket").asc())
    )


Q66_SQL = """
WITH planes AS (
  SELECT i, list_transform(
           generate_series(0, 63),
           j -> ((('0x' || substr(md5(CAST(i AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
                  % 2000001) - 1000000) / 1000000.0
         ) AS w
  FROM (SELECT unnest(generate_series(0, 2)) AS i)
),
results AS (
  SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS emb
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
  WHERE list_contains(list_filter(regexp_split_to_array(lower(d.text), '[^a-z0-9]+'), t -> t <> ''), 'data')
),
bits AS (
  SELECT r.doc_id, p.i,
         CASE WHEN list_reduce(
                list_prepend(0.0, list_transform(list_zip(r.emb, p.w), s -> s[1] * s[2])),
                (a, b) -> a + b) >= 0
              THEN CAST(1 AS BIGINT) << p.i ELSE CAST(0 AS BIGINT) END AS term
  FROM results r CROSS JOIN planes p
),
buckets AS (SELECT doc_id, CAST(SUM(term) AS BIGINT) AS bucket FROM bits GROUP BY doc_id),
toks AS (
  SELECT DISTINCT b.bucket, r.doc_id, t.term
  FROM results r JOIN buckets b USING (doc_id),
       LATERAL (SELECT unnest(list_filter(regexp_split_to_array(lower(r.text), '[^a-z0-9]+'), x -> x <> '')) AS term) t
),
tdf AS (SELECT bucket, term, count(*) AS df FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT bucket, term,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY df DESC, term ASC) AS rn
  FROM tdf
),
labels AS (
  SELECT bucket, string_agg(term, ',' ORDER BY rn) AS label
  FROM ranked WHERE rn <= 2 GROUP BY bucket
),
sizes AS (SELECT bucket, count(*) AS n_docs FROM buckets GROUP BY bucket)
SELECT s.bucket, l.label, s.n_docs
FROM sizes s JOIN labels l USING (bucket)
ORDER BY s.bucket ASC
"""


def q66b_phrase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carrot2 STC-style result clustering — the faithful form of the
    Clustering component (q66's LSH buckets are the train-free
    substitute; THIS is suffix-tree clustering's actual shape): base
    clusters are FREQUENT PHRASES of the result set (word bigrams with
    df >= 5, query word excluded from labels, as Carrot2 filters query
    terms), each result doc joins the cluster of its highest-df
    matching phrase (ties lexicographic — deterministic, unlike
    Lingo's SVD), unclustered docs land in the ``Other topics`` bucket
    Carrot2 emits. Output: top-10 clusters by size with their PHRASE
    labels + the Other row (rank 0).

    Plan: result-set-bounded throughout — distinct per-doc bigrams
    (one explode), a vocabulary-bounded df agg broadcast back onto the
    (doc, phrase) pairs, one per-doc argmax window, one size agg.
    The corpus is scanned once through the pushed token filter; at
    100 TB the result set is a query head, so every frame here is
    head-bounded."""
    from hbase_increment_index_spark.pipeline.dedup import shingle_grams
    from hbase_increment_index_spark.search.tokenize import has_token

    from hbase_increment_index_spark.functions.layout import fan_out

    min_df, k = 5, 10
    docs = _t(spark, sf_dir, "documents")
    # fan_out: the bigram shingling below is map-side CPU feeding TWO
    # consumers (df agg + the phrase join) — parallelize it when the
    # scan is under-partitioned (no-op at scale). The reused frames
    # (result head, its bigrams, the per-doc winners) each carry a
    # LAZY lineage cut: every one feeds two consumers, and without the
    # cut the corpus scan+tokenize, the shingling explode and the
    # argmax window all ran twice (r16; all three are head-bounded, so
    # the materialization is small at any corpus size).
    res = fan_out(
        docs.filter(has_token("text", "data")).select("doc_id", "text")
    ).localCheckpoint(eager=False)
    ph = res.select(
        "doc_id",
        F.explode(F.array_distinct(shingle_grams("text", 2))).alias("phrase"),
    ).filter(
        ~F.array_contains(F.split(F.col("phrase"), " "), "data")
    ).localCheckpoint(eager=False)
    dfq = (
        ph.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("df").desc(), F.col("phrase").asc()
    )
    best = (
        ph.join(F.broadcast(dfq), "phrase")
        .withColumn("_rn", F.row_number().over(w_doc))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "phrase")
        .localCheckpoint(eager=False)
    )
    clusters = best.groupBy(F.col("phrase").alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_rank = Window.orderBy(F.col("n_docs").desc(), F.col("label").asc())
    ranked = (
        clusters.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )
    other = (
        res.join(best.select("doc_id"), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("Other topics").alias("label"),
            "n_docs",
            F.lit(0).cast("long").alias("rank"),
        )
    )
    return ranked.select("label", "n_docs", "rank").unionByName(other).orderBy("rank")


Q66B_SQL = f"""
WITH res AS (
  SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents
  WHERE list_contains({_SQL_TOKS.format(c='text')}, 'data')
),
ph0 AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
  FROM res
),
ph1 AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS phrase
  FROM ph0
),
ph AS (
  SELECT * FROM ph1 WHERE NOT list_contains(string_split(phrase, ' '), 'data')
),
dfq AS (SELECT phrase, count(*) AS df FROM ph GROUP BY 1 HAVING count(*) >= 5),
best AS (
  SELECT doc_id, phrase,
         row_number() OVER (PARTITION BY doc_id ORDER BY df DESC, phrase ASC) AS rn
  FROM ph JOIN dfq USING (phrase)
),
clus AS (SELECT phrase AS label, count(*) AS n_docs FROM best WHERE rn = 1 GROUP BY 1),
ranked AS (
  SELECT label, n_docs,
         CAST(row_number() OVER (ORDER BY n_docs DESC, label ASC) AS BIGINT) AS rank
  FROM clus
)
SELECT label, n_docs, rank FROM ranked WHERE rank <= 10
UNION ALL
SELECT 'Other topics', count(*), CAST(0 AS BIGINT)
FROM res WHERE doc_id NOT IN (SELECT doc_id FROM best WHERE rn = 1)
ORDER BY rank
"""


def q67_function_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr FunctionQParser: the literal function-query text a Solr
    user puts in ``sort=``/``boost=`` — here
    ``product(l_extendedprice, sub(1, l_discount), recip(l_quantity,1,50,50))``
    (discounted price damped by quantity) — compiled to one projection
    + TakeOrderedAndProject (search.function_query)."""
    from hbase_increment_index_spark.search.function_query import function_sort

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"
    ).withColumn("_rk", F.col("l_orderkey") * 10 + F.col("l_linenumber")).select(
        "_rk", "l_extendedprice", "l_discount", "l_quantity"
    )
    out = function_sort(
        li,
        "product(l_extendedprice, sub(1, l_discount), recip(l_quantity, 1, 50, 50))",
        k=15,
    )
    return out.select(F.col("_rk").alias("rk"), "score")


Q67_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS rk,
       ROUND(l_extendedprice * (1 - l_discount) * (50 / (1 * l_quantity + 50)), 6) AS score
FROM lineitem
ORDER BY score DESC, rk ASC
LIMIT 15
"""


def q11d_facet_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr date-math range facet ``facet.range.gap=+1MONTH`` on the
    orders fact: calendar-month buckets are NOT fixed-width, so the
    bucket id is date_trunc (one projection + hash agg), exactly how
    Solr's date math rounds (`NOW/MONTH`). Exact-decimal revenue per
    bucket rides the same agg."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_sum("o_totalprice", 6), 2).alias("revenue"),
        )
        .orderBy(F.col("month").asc())
    )


Q11D_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       count(*) AS n,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY month ASC
"""


def q12_facet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return facets.facet_queries(
        li,
        {
            "n_cheap": F.col("l_extendedprice") < 10000.0,
            "n_discounted": F.col("l_discount") > 0.05,
            "n_returned": F.col("l_returnflag") == "R",
        },
    )


Q12_SQL = """
SELECT CAST(SUM(CASE WHEN l_extendedprice < 10000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cheap,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
FROM lineitem
"""


def q13_stats_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = stats.stats_field(li, "l_extendedprice", group_by=["l_returnflag"])
    return out.withColumn("stddev_v", F.round("stddev_v", 4)).withColumn(
        "mean_v", F.round("mean_v", 6)
    )


Q13_SQL = """
SELECT l_returnflag,
       min(l_extendedprice) AS min_v,
       max(l_extendedprice) AS max_v,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_v,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS mean_v,
       ROUND(SQRT((CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
             - CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
               * CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(l_extendedprice))
            / (COUNT(l_extendedprice) - 1)), 4) AS stddev_v,
       count(l_extendedprice) AS count_v,
       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_v
FROM lineitem
GROUP BY l_returnflag
"""


def q14_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


Q14_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
"""


def q14b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality with a MEASURED error-bound check —
    the 100 TB distinct path (Solr ``hll()`` / ``cardinality`` stats,
    SURVEY.md §2.2 Q14). The sketch value itself is implementation-
    specific (Spark HLL++ vs DuckDB's HLL differ bit-for-bit, so no
    cross-engine hash oracle exists for ``n_approx`` — the same reason
    q14c reports the percentile sketch via its error), so the query
    returns what IS cross-engine checkable: the exact per-group
    cardinality next to a boolean asserting the sketch landed within
    the documented 3-sigma bound (3 × rsd = 0.15 at the default
    rsd = 0.05; observed error on this data is ≤ 2.7%, a ~5× margin).
    Both engines compute ``n_exact`` independently; the oracle asserts
    ``within_bound`` is TRUE, so an out-of-tolerance sketch fails the
    driver hash check — the q14c_percentile_error move applied to HLL.

    Plan: one hash aggregate computing exact countDistinct (two-phase
    partial agg) and the HLL sketch side-by-side over the same scan;
    at 100 TB the exact leg is the expensive one and serves as the
    audit — production serves ``approx_count_distinct`` alone."""
    li = _t(spark, sf_dir, "lineitem")
    rsd = 0.05
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey", rsd).alias("_n_approx"),
    )
    within = (
        F.abs(F.col("_n_approx") - F.col("n_exact"))
        / F.col("n_exact")
        <= F.lit(3 * rsd)
    )
    return agg.select(
        "l_returnflag", "n_exact", within.alias("within_bound")
    ).orderBy("l_returnflag")


Q14B_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_exact,
       TRUE AS within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return facets.facet_pivot(joined, ["n_name", "c_mktsegment"], count_alias="n")


Q16_SQL = """
SELECT n_name, c_mktsegment, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
"""


def q16b_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return facets.facet_pivot_rollup(joined, ["n_name", "c_mktsegment"], count_alias="n")


Q16B_SQL = """
SELECT n_name, c_mktsegment, count(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
"""


def q16c_stats_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr stats-within-pivot (``facet.pivot=n_name,c_mktsegment`` +
    ``stats.field={!tag=..}c_acctbal`` hung off each pivot bucket):
    per-bucket min/max/sum/mean/count/missing of a numeric field — the
    q13 exact-decimal aggregation keyed by the pivot pair. One hash agg
    over the broadcast-joined dimension; stddev omitted because sparse
    pivot buckets can be singletons (sample stddev undefined)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    out = stats.stats_field(joined, "c_acctbal", group_by=["n_name", "c_mktsegment"])
    return out.select(
        "n_name", "c_mktsegment", "min_v", "max_v", "sum_v",
        F.round("mean_v", 6).alias("mean_v"), "count_v", "missing_v",
    )


Q16C_SQL = """
SELECT n_name, c_mktsegment,
       min(c_acctbal) AS min_v,
       max(c_acctbal) AS max_v,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_v,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(c_acctbal), 6) AS mean_v,
       count(c_acctbal) AS count_v,
       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_v
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
"""


def q16d_pivot_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``facet.pivot=n_name,c_mktsegment&facet.limit=3``: top-3
    nations by customer count, each with its top-3 segments — the
    per-level bucket cap Solr applies at every pivot level. One corpus
    agg; ranking windows touch only the bucket set."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return facets.facet_pivot_limited(joined, "n_name", "c_mktsegment", limit=3)


Q16D_SQL = """
WITH ab AS (
  SELECT n_name, c_mktsegment, count(*) AS n
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
tot AS (
  SELECT *, SUM(n) OVER (PARTITION BY n_name) AS atot FROM ab
)
SELECT n_name, c_mktsegment, n FROM tot
QUALIFY dense_rank() OVER (ORDER BY atot DESC, n_name ASC) <= 3
    AND row_number() OVER (PARTITION BY n_name ORDER BY n DESC, c_mktsegment ASC) <= 3
"""


def q18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over (returnflag, linestatus): all subtotal combinations in
    one pass (Spark expands to grouping sets — one shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("l_quantity", 2).alias("sum_qty"))
    )


Q18_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q19_facet_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet with a minimum bucket count (Solr facet.mincount)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )


Q19_SQL = """
SELECT user_id, count(*) AS n
FROM events
GROUP BY user_id
HAVING count(*) >= 50
"""


def q20_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event-value sum ordered by time — frame-spec
    window (rows unbounded preceding → current). One shuffle on
    user_id; each partition streams once."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(30,2)")).over(w).cast("double").alias("running_value"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("event_rank"),
    )


Q20_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS event_rank
FROM events
"""


def q21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity): lag + cumulative
    session-break sum — the standard two-window formulation; both
    windows share one shuffle on user_id."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # NTZ-safe exact gap: timestamp difference as an interval, compared
    # against a literal interval (µs-exact; unix_timestamp would
    # truncate to seconds and disagree with the oracle at the boundary)
    prev = F.lag("ts").over(w)
    gap_break = (F.col("ts") - prev) > F.expr("INTERVAL '1800' SECOND")
    is_break = F.when(prev.isNull() | gap_break, 1).otherwise(0)
    sess = (
        events.withColumn("brk", is_break)
        .withColumn("session_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


Q21_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM s
GROUP BY user_id, session_id
"""


def q22_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: one column per event_type with per-user counts
    (groupBy().pivot() — Spark compiles it to conditional aggregation,
    a single pass, which is exactly what the SQL oracle spells out)."""
    events = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


Q22_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
"""


def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Solr stats.percentiles): Spark ``percentile``
    and DuckDB ``quantile_cont`` both use linear interpolation on the
    sorted values. The approx path at scale is percentile_approx
    (rows-only twin not needed — same operator, sketch variant)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


Q23_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem
GROUP BY l_returnflag
"""


def q24_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for hot-key skew: the salt fans a
    hot group over 16 reducers, phase 2 combines partials. The oracle
    is the PLAIN aggregation — salting must be invisible in results
    (guaranteed because the aggregates are algebraic + decimal-exact)."""
    from hbase_increment_index_spark.functions.skew import two_phase_agg

    events = _t(spark, sf_dir, "events")
    return two_phase_agg(
        events,
        ["event_type"],
        "value",
        partials={
            "n": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(30,6)")),
        },
        finals={
            "n": F.sum("n").cast("long"),
            "sum_value": F.sum("sum_value").cast("double"),
        },
    )


Q24_SQL = """
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: for each event, the customer's most recent
    order at or before the event (ties: max orderkey). Union-window
    formulation — one shuffle, no range-join explosion; the oracle is
    the explicit rank-1 range join."""
    from hbase_increment_index_spark.functions.temporal import asof_join_backward

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join_backward(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        right_tie="o_orderkey",
    )
    return out.filter(F.col("o_orderkey").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


Q25_SQL = """
SELECT event_id, user_id, o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""


def q25b_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bin decomposition (temporal.interval_join):
    every event within one hour after the same user's signup — hash
    equi-join on (user, hour-bucket) + exact BETWEEN residue, instead
    of a quadratic range join."""
    from hbase_increment_index_spark.functions.temporal import interval_join

    us = F.expr(
        "timestampdiff(MICROSECOND, make_timestamp_ntz(1970, 1, 1, 0, 0, 0), ts)"
    )
    events = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", us.alias("ts_us")
    )
    anchors = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts_us").alias("lo_us"),
        (F.col("ts_us") + F.lit(3_600_000_000)).alias("hi_us"),
    )
    out = interval_join(
        events, anchors, key="user_id", event_ts_us="ts_us",
        lo_us="lo_us", hi_us="hi_us",
    )
    return out.select("anchor_id", "event_id", "user_id", "event_type")


Q25B_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
a AS (
  SELECT event_id AS anchor_id, user_id, ts_us AS lo_us, ts_us + 3600000000 AS hi_us
  FROM e WHERE event_type = 'signup'
)
SELECT a.anchor_id, e.event_id, e.user_id, e.event_type
FROM a JOIN e ON e.user_id = a.user_id AND e.ts_us BETWEEN a.lo_us AND a.hi_us
"""


def q26_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers appearing in urgent orders INTERSECT
    high-value orders, EXCEPT any appearing in 'F'-status orders —
    distinct-set semantics on both engines."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = orders.filter(F.col("o_totalprice") > 200000.0).select("o_custkey")
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.intersect(high).exceptAll(failed.distinct()).withColumnRenamed(
        "o_custkey", "custkey"
    )


Q26_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q27_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events.props JSON payload
    (the open/dynamic part of the cell model — qualifiers the schema
    didn't anticipate) and aggregate a field from it. JVM-side
    get_json_object — no Python in the path."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


Q27_SQL = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def q21b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's native ``session_window`` (dynamic-gap
    event-time sessions — the Structured-Streaming-compatible form of
    q21; in batch it computes the same islands). Oracle: gaps-and-
    islands with a >= gap break, which is exactly the semantics of
    session windows ([start, last+gap) intervals merged while they
    overlap)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


Q21B_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
FROM s
GROUP BY user_id, sid
"""


def q28_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE-frame window: per user, count and exact sum of
    event values in the trailing hour (inclusive) at each event — the
    rate/feature-engineering shape (q20 is the ROWS-frame twin). One
    shuffle on user_id; the frame slides over microsecond epochs, which
    both engines hold exactly (fixture timestamps are µs-aligned)."""
    events = _t(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, make_timestamp_ntz(1970, 1, 1, 0, 0, 0), ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.sum(F.col("value").cast("decimal(30,2)")).over(w).cast("double").alias("trailing_sum"),
    )


Q28_SQL = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS trailing_n,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE) AS trailing_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q29_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr suggester: top vocabulary completions for a prefix, ranked
    by corpus frequency (ties lexicographic)."""
    from hbase_increment_index_spark.search.highlight import suggest_terms

    docs = _t(spark, sf_dir, "documents")
    return suggest_terms(docs, "doc_id", "text", prefix="s", k=10)


Q29_SQL = f"""
SELECT term, count(*) AS freq
FROM (SELECT unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
WHERE term LIKE 's%'
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 10
"""


def q30_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr highlighting: token-window snippet around the first hit of
    a term, for matching docs only (search.highlight.snippets)."""
    from hbase_increment_index_spark.search.highlight import snippets

    docs = _t(spark, sf_dir, "documents")
    out = snippets(docs, "doc_id", "text", term="stream", window=3)
    return out.select("doc_id", F.col("pos").cast("long").alias("pos"), "snippet")


Q30_SQL = f"""
WITH p AS (
  SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents
),
hit AS (
  SELECT doc_id, t, list_position(t, 'stream') AS pos FROM p
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       array_to_string(list_slice(t, greatest(pos - 3, 1), least(pos + 3, len(t))), ' ') AS snippet
FROM hit
WHERE pos IS NOT NULL AND pos > 0
"""


def q30b_multi_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr multi-fragment highlighting — ``hl.snippets=3`` +
    ``hl.tag.pre/post``: one row per occurrence of the term (document
    order, capped at 3), hit token wrapped in <em> tags
    (search.highlight.snippets_multi). Pure per-row projection + a
    capped posexplode; zero shuffle."""
    from hbase_increment_index_spark.search.highlight import snippets_multi

    docs = _t(spark, sf_dir, "documents")
    out = snippets_multi(
        docs, "doc_id", "text", term="data", window=3, max_snippets=3
    )
    return out.select(
        "doc_id",
        F.col("snippet_no").cast("long").alias("snippet_no"),
        F.col("pos").cast("long").alias("pos"),
        "snippet",
    ).orderBy("doc_id", "snippet_no")


Q30B_SQL = f"""
WITH p AS (
  SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents
),
hits AS (
  SELECT doc_id, t,
         list_slice(
           list_filter(list_transform(t, (x, i) -> CASE WHEN x = 'data' THEN i END),
                       q -> q IS NOT NULL),
           1, 3) AS hs
  FROM p
),
fr AS (
  SELECT doc_id, t, unnest(hs) AS pos,
         unnest(generate_series(1, len(hs))) AS snippet_no
  FROM hits WHERE len(hs) > 0
)
SELECT doc_id, CAST(snippet_no AS BIGINT) AS snippet_no, CAST(pos AS BIGINT) AS pos,
       array_to_string(
         list_transform(
           list_slice(t, greatest(pos - 3, 1), least(pos + 3, len(t))),
           (x, j) -> CASE WHEN greatest(pos - 3, 1) + j - 1 = pos
                     THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS snippet
FROM fr
ORDER BY doc_id, snippet_no
"""


def q30c_unified_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``hl.method=unified`` — per-passage BM25-scored snippet
    selection (Lucene UnifiedHighlighter PassageScorer), not q30's
    token-window-around-first-hit: each doc splits into 10-token
    passages (the fragsize fallback — this corpus has no sentence
    boundaries), every passage BM25-scores against the query terms
    using document-level idf + passage-length norm, and the top-2
    passages per doc come back with hits tagged
    (search.highlight.unified_highlight; stats are two broadcast
    scalars, passages a capped explode, top-k one window over
    matching passages only)."""
    from hbase_increment_index_spark.search.highlight import unified_highlight

    docs = _t(spark, sf_dir, "documents")
    return unified_highlight(
        docs, "doc_id", "text", terms=["spark", "merge"], passage_size=10, k=2
    ).orderBy("doc_id", "passage_no")


_Q30C_TERMS = ("spark", "merge")


def _q30c_sql() -> str:
    toks = _SQL_TOKS.format(c="text")
    t0, t1 = _Q30C_TERMS
    norm = "1.2 * (0.25 + 0.75 * len(passage) / a.avg_plen)"
    leg = (
        "ln(1 + (s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5))"
        " * tf{i} * 2.2 / (tf{i} + " + norm + ")"
    )
    return f"""
WITH p AS (SELECT doc_id, {toks} AS t FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(SUM(CASE WHEN list_contains(t, '{t0}') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         CAST(SUM(CASE WHEN list_contains(t, '{t1}') THEN 1 ELSE 0 END) AS DOUBLE) AS df1
  FROM p
),
pass AS (
  SELECT doc_id, g.i AS pno,
         list_slice(t, (g.i - 1) * 10 + 1, (g.i - 1) * 10 + 10) AS passage
  FROM p, unnest(generate_series(1,
         greatest(CAST(ceil(len(t) / 10.0) AS INT), 1))) AS g(i)
),
a AS (SELECT CAST(SUM(len(passage)) AS DOUBLE) / count(*) AS avg_plen FROM pass),
tfs AS (
  SELECT doc_id, pno, passage,
         len(list_filter(passage, x -> x = '{t0}')) AS tf0,
         len(list_filter(passage, x -> x = '{t1}')) AS tf1
  FROM pass
),
sc AS (
  SELECT doc_id, pno, passage,
         ROUND({leg.format(i=0)} + {leg.format(i=1)}, 6) AS score
  FROM tfs, stats s, a
)
SELECT doc_id, CAST(pno AS BIGINT) AS passage_no, score,
       array_to_string(
         list_transform(passage,
           x -> CASE WHEN x IN ('{t0}', '{t1}')
                THEN '<em>' || x || '</em>' ELSE x END), ' ') AS snippet
FROM sc
WHERE score > 0
QUALIFY row_number() OVER (
  PARTITION BY doc_id ORDER BY score DESC, pno ASC) <= 2
ORDER BY doc_id, passage_no
"""


def q31_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr MoreLikeThis against doc 7 (search.ranking.more_like_this)."""
    from hbase_increment_index_spark.search.ranking import more_like_this

    docs = _t(spark, sf_dir, "documents")
    return more_like_this(docs, "doc_id", "text", doc_id=7, k=10, max_query_terms=20)


Q31_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
),
dft AS (SELECT term, count(*) AS df_t FROM toks GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
src AS (
  SELECT term, ln(n.n_docs / dft.df_t) AS idf
  FROM toks JOIN dft USING (term), n
  WHERE doc_id = 7
  ORDER BY dft.df_t ASC, term ASC
  LIMIT 20
)
SELECT t.doc_id, ROUND(SUM(src.idf), 6) AS score
FROM toks t JOIN src USING (term)
WHERE t.doc_id <> 7
GROUP BY t.doc_id
ORDER BY score DESC, t.doc_id ASC
LIMIT 10
"""


def q32_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind Q16's rollup/
    cube): per-returnflag, per-linestatus, and grand-total aggregates in
    one pass, with GROUPING() markers disambiguating real NULL keys from
    subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_q32_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
        FROM _q32_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


Q32_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q33_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr fuzzy term query ``q=text:stream~1`` — docs holding any
    token within edit distance 1 of the term, one row per matched
    (doc, vocabulary token) (search.filters.fuzzy_search; zero-shuffle
    projection plan)."""
    from hbase_increment_index_spark.search.filters import fuzzy_search

    docs = _t(spark, sf_dir, "documents")
    return fuzzy_search(docs, "doc_id", "text", term="stream", max_edits=1)


Q33_SQL = f"""
SELECT doc_id, unnest(list_distinct(list_filter(
         {_SQL_TOKS.format(c='text')},
         t -> levenshtein(t, 'stream') <= 1))) AS term
FROM documents
"""


def q34_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr terms component ``terms.fl=text&terms.prefix=s`` — vocab
    enumeration by DOCUMENT frequency (distinct docs per term), df desc
    / term asc (search.highlight.terms_component)."""
    from hbase_increment_index_spark.search.highlight import terms_component

    docs = _t(spark, sf_dir, "documents")
    return terms_component(docs, "doc_id", "text", prefix="s", k=20)


Q34_SQL = f"""
SELECT term, count(DISTINCT doc_id) AS docfreq
FROM (SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
WHERE term LIKE 's%'
GROUP BY term
ORDER BY docfreq DESC, term ASC
LIMIT 20
"""


def q31b_interesting_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``mlt.interestingTerms=details``: the terms MoreLikeThis
    actually built its query from, with their scores — the explain
    surface for q31's ranking (a user debugging "why did MLT return
    these docs" reads this list first). Same selection as q31's query
    construction: the source doc's distinct terms ranked by rarity
    (df asc, term asc), top-20, scored by idf. One vocabulary-bounded
    df agg + a broadcast scalar N; the top-20 head is TakeOrdered."""
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    dft = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        toks.filter(F.col("doc_id") == 7)
        .join(dft, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("score"),
        )
        .orderBy(F.col("df").asc(), F.col("term").asc())
        .limit(20)
    )


Q31B_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({_SQL_TOKS.format(c='text')}) AS term FROM documents)
),
dft AS (SELECT term, count(*) AS df FROM toks GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT term, CAST(df AS BIGINT) AS df, ROUND(ln(n.n_docs / df), 6) AS score
FROM toks JOIN dft USING (term), n
WHERE doc_id = 7
ORDER BY df ASC, term ASC
LIMIT 20
"""


def q86_terms_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``{!terms f=field}id1,id2,...`` query parser — the
    documented EFFICIENT large-id-list filter (the alternative Solr
    recommends over a boolean OR chain; solrj 9.8, reference
    pom.xml:22). Everyday operation against an index keyed like the
    reference's (rowkey unique key, application.properties:4): fetch /
    screen a client-supplied id list. The parser compiles the list to
    ``Column.isin`` → ONE Catalyst ``In`` predicate that reaches the
    parquet scan's PushedFilters (PLANS.md shows ``In(o_custkey, …)``),
    so a 10k-id list at 100 TB is a single sargable scan predicate —
    row-group statistics prune files before any row is read — not 10k
    OR legs. Composes with the rest of the query grammar (the status
    leg here) like any atom."""
    from hbase_increment_index_spark.search.solr_query import solr_select

    orders = _t(spark, sf_dir, "orders")
    ids = ",".join(str(i) for i in range(1, 400, 7))
    return (
        solr_select(orders, "{!terms f=o_custkey}" + ids + " AND o_orderstatus:O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


_Q86_IDS = ", ".join(str(i) for i in range(1, 400, 7))
Q86_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN ({_Q86_IDS}) AND o_orderstatus = 'O'
ORDER BY o_orderkey
"""


def q90_complex_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr ``{!complexphrase}text:"tab* hash"`` (solrj 9.8, reference
    pom.xml:22): a phrase whose legs may be WILDCARD patterns — the
    documented parser for "phrase with prefix/wildcard terms", which
    the standard phrase grammar cannot express. Compiles to the
    per-row positional existential (filters.complex_phrase): one
    tokenize, equality-or-LIKE per leg, exists over start positions —
    all inside whole-stage codegen, zero shuffle, no positions
    materialized outside the row."""
    from hbase_increment_index_spark.search.solr_query import solr_select

    docs = _t(spark, sf_dir, "documents")
    return (
        solr_select(docs, '{!complexphrase}text:"tab* hash"')
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


Q90_SQL = f"""
WITH d AS (
  SELECT doc_id, source, {_SQL_TOKS.format(c='text')} AS t FROM documents
)
SELECT doc_id, source FROM d
WHERE len(t) >= 2 AND len(list_filter(generate_series(1, len(t) - 1),
      i -> t[i] LIKE 'tab%' AND t[i+1] = 'hash')) > 0
ORDER BY doc_id
"""


def q91_localparams_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simple local-params parsers composed in one query —
    ``{!prefix}`` (startswith, no analysis), ``{!raw}`` (verbatim
    equality — NO analysis or numeric coercion, Solr's contract), and
    ``{!field}`` (fieldType-aware: a multi-word value on a text field
    is a PHRASE) — each a documented Solr qparser (solrj 9.8,
    reference pom.xml:22) and each compiling to a plain sargable /
    codegen predicate; the whole boolean composition stays one
    filter."""
    from hbase_increment_index_spark.search.solr_query import solr_select

    docs = _t(spark, sf_dir, "documents")
    q = '({!prefix f=source}src1 OR {!raw f=lang}de) AND {!field f=text}"table hash"'
    return (
        solr_select(docs, q, text_fields={"text"})
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


Q91_SQL = r"""
SELECT doc_id, lang, source
FROM documents
WHERE (source LIKE 'src1%' OR lang = 'de')
  AND regexp_matches(lower(text), '\btable\s+hash\b')
ORDER BY doc_id
"""
