"""Round-16 additions: the r15 ADVICE fixes (daemon background-loop
error handling, {!terms} empty-value hygiene, complex_phrase backslash
escaping) plus the round's new evaluators (tested in their own
sections below as they land)."""

from __future__ import annotations

import time

import pytest

from hbase_increment_index_spark.search.streaming_expr import (
    StreamCompiler,
    StreamExprError,
)


def test_daemon_background_error_stops_cleanly(spark):
    """A failing iteration (here: the maxRows guard) must not kill the
    thread while state still reads 'running' — the handle flips to
    'stopped' and records last_error."""
    t = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    compiler = StreamCompiler({"t": t})
    compiler.compile(
        'daemon(id="derr", runInterval=10, maxRows=3, '
        'search(t, q="*:*", fl="id"))'
    )
    d = compiler.daemons["derr"]
    d.start()
    deadline = time.time() + 30
    while d.state == "running" and time.time() < deadline:
        time.sleep(0.05)
    assert d.state == "stopped"
    assert isinstance(d.last_error, StreamExprError)
    assert "maxRows" in str(d.last_error)
    d.stop()  # idempotent on an already-stopped handle


def test_daemon_background_success_keeps_running(spark):
    """The error path must not regress the healthy loop: iterations
    advance and state stays 'running' until stop()."""
    t = spark.createDataFrame([(1,)], ["id"])
    compiler = StreamCompiler({"t": t})
    compiler.compile(
        'daemon(id="dok", runInterval=10, search(t, q="*:*", fl="id"))'
    )
    d = compiler.daemons["dok"]
    d.start()
    deadline = time.time() + 30
    while d.iterations < 2 and time.time() < deadline:
        time.sleep(0.05)
    assert d.iterations >= 2
    assert d.state == "running"
    assert d.last_error is None
    d.stop()
    assert d.state == "stopped"


def test_terms_parser_trailing_separator(spark):
    """'{!terms f=id}1,2,' drops the empty trailing element instead of
    producing a mixed-type isin([1, 2, ''])."""
    from hbase_increment_index_spark.search.solr_query import (
        SolrQueryError,
        solr_select,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "s"])
    got = solr_select(df, "{!terms f=id}1,2,")
    assert sorted(r["id"] for r in got.collect()) == [1, 2]
    doubled = solr_select(df, "{!terms f=id}1,,3")
    assert sorted(r["id"] for r in doubled.collect()) == [1, 3]
    with pytest.raises(SolrQueryError, match="at least one value"):
        solr_select(df, "{!terms f=id},,")


def test_terms_parser_star_is_literal(spark):
    """Solr's {!terms} does no wildcarding: '*' matches only a literal
    '*' value, never acts as match-all."""
    from hbase_increment_index_spark.search.solr_query import solr_select

    df = spark.createDataFrame([(1, "*"), (2, "x"), (3, "y")], ["id", "k"])
    got = solr_select(df, "{!terms f=k}*")
    assert [r["id"] for r in got.collect()] == [1]


def test_complex_phrase_backslash_literal(spark):
    """A backslash inside a wildcard leg is a literal character, not a
    LIKE escape (matches the cdc filter_list_sql backslash-first fix).
    The tokenizer strips backslashes, so such a leg can match NOTHING —
    pre-fix, 'a\\b*' compiled to LIKE 'a\\b%' whose '\\b' meant an
    escaped literal 'b' and wrongly matched the token 'ab'."""
    from hbase_increment_index_spark.search.filters import complex_phrase

    df = spark.createDataFrame(
        [(1, r"a\b c"), (2, "ab c"), (3, r"a\bx c")], ["id", "text"]
    )
    got = df.filter(complex_phrase("text", ["a\\b*", "c"]))
    assert got.count() == 0
    # sanity: the plain wildcard leg still works — only row 2 ('ab c')
    # has tokens ('ab','c') adjacent with 'ab' LIKE 'a%'
    ok = df.filter(complex_phrase("text", ["a*", "c"]))
    assert [r["id"] for r in ok.collect()] == [2]
