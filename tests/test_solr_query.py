"""Solr query-string parser → Column predicate compilation."""

from __future__ import annotations

import pytest

from hbase_increment_index_spark.search.solr_query import SolrQueryError, solr_select


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_eq_and_range(orders):
    got = solr_select(orders, "o_orderstatus:F AND o_totalprice:[100000 TO 200000]")
    from pyspark.sql import functions as F

    want = orders.filter(
        (F.col("o_orderstatus") == "F") & F.col("o_totalprice").between(100000, 200000)
    )
    assert got.count() == want.count() > 0


def test_boolean_not_parens(orders):
    got = solr_select(
        orders, "(o_orderstatus:F OR o_orderstatus:O) AND NOT o_orderpriority:1-URGENT"
    )
    from pyspark.sql import functions as F

    want = orders.filter(
        F.col("o_orderstatus").isin("F", "O") & (F.col("o_orderpriority") != "1-URGENT")
    )
    assert got.count() == want.count() > 0


def test_default_op_is_and(orders):
    a = solr_select(orders, "o_orderstatus:F o_orderpriority:5-LOW").count()
    b = solr_select(orders, "o_orderstatus:F AND o_orderpriority:5-LOW").count()
    assert a == b


def test_fulltext_field(docs):
    got = solr_select(docs, "text:spark AND text:join", text_fields={"text"})
    from hbase_increment_index_spark.search.tokenize import has_all_tokens

    want = docs.filter(has_all_tokens("text", ["spark", "join"]))
    assert got.count() == want.count() > 0


def test_wildcard_and_open_range(docs):
    assert solr_select(docs, "source:src1*").count() > 0
    assert solr_select(docs, "n_chars:[400 TO *]").count() > 0
    assert solr_select(docs, "lang:*").count() == docs.count()


def test_phrase(docs):
    n = solr_select(docs, 'text:"row scan"').count()
    from hbase_increment_index_spark.search import filters

    assert n == docs.filter(filters.phrase("text", ["row", "scan"])).count()


def test_phrase_slop_parser_and_semantics(spark):
    """'"w1 w2"~N' parses to the sloppy-phrase predicate: in-order
    within (k-1)+N positions; slop=0 form equals the exact phrase; and
    the row-level predicate agrees with the index-served operator."""
    from hbase_increment_index_spark.search import filters
    from hbase_increment_index_spark.search.inverted import (
        build_positional_index,
        sloppy_phrase_from_index,
    )

    df = spark.createDataFrame(
        [
            (1, "quick brown fox"),
            (2, "quick red brown fox"),
            (3, "quick very very red brown"),
            (4, "brown quick"),
        ],
        "id long, text string",
    )
    assert {r["id"] for r in solr_select(df, 'text:"quick brown"').collect()} == {1}
    assert {r["id"] for r in solr_select(df, 'text:"quick brown"~1').collect()} == {1, 2}
    assert {r["id"] for r in solr_select(df, 'text:"quick brown"~3').collect()} == {1, 2, 3}
    # row-level predicate ≡ index-served operator on every slop
    pp = build_positional_index(df, "id", "text")
    for slop in (0, 1, 3):
        via_pred = {
            r["id"]
            for r in df.filter(filters.phrase_slop("text", ["quick", "brown"], slop)).collect()
        }
        via_index = {
            r["id"]
            for r in sloppy_phrase_from_index(pp, ["quick", "brown"], "id", slop=slop).collect()
        }
        assert via_pred == via_index


def test_phrase_with_regex_metacharacters(spark):
    # quoted phrases with regex metachars must match literally, not blow
    # up rlike pattern compilation (ADVICE r1)
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.search import filters

    df = spark.createDataFrame(
        [
            (1, "released 3.5 (beta) today"),
            (2, "released 3x5 Xbeta) today"),  # same text modulo metachars
            (3, "we use c++ daily"),
            (4, "we use cxx daily"),
        ],
        "id long, title string",
    )
    got35 = {r["id"] for r in df.filter(filters.phrase("title", ["3.5", "(beta)"])).collect()}
    assert got35 == {1}
    gotcpp = {r["id"] for r in df.filter(filters.phrase("title", ["c++"])).collect()}
    assert gotcpp == {3}
    # solr_select end-to-end with a quoted metachar phrase
    n = solr_select(df, 'title:"3.5 (beta)"').count()
    assert n == 1


def test_fuzzy_term(spark):
    df = spark.createDataFrame(
        [(1, "stream processing"), (2, "steam engine"), (3, "strange things"), (4, "dog")],
        "id long, text string",
    )
    # streams~1: 'stream' (1 edit) and 'steam'? ('steam'->'streams' = 2) -> only 1
    got1 = {r["id"] for r in solr_select(df, "text:streams~1").collect()}
    assert got1 == {1}
    # stream~2 widens to 'steam' (1 edit) but not 'strange' (4 edits)
    got2 = {r["id"] for r in solr_select(df, "text:stream~2").collect()}
    assert got2 == {1, 2}
    # bare ~ uses the Lucene default distance of 2
    assert {r["id"] for r in solr_select(df, "text:stream~").collect()} == got2
    # composes with boolean grammar (text declared as a full-text field
    # so the NOT clause is a token match, not whole-string equality)
    both = solr_select(df, "text:stream~2 AND NOT text:engine", text_fields={"text"})
    assert {r["id"] for r in both.collect()} == {1}


def test_parse_errors():
    from hbase_increment_index_spark.search.solr_query import parse_query

    for bad in ["", "field:", "(a:b", "a:[1 TO", "::", "a:b extra:("]:
        with pytest.raises(SolrQueryError):
            parse_query(bad)
