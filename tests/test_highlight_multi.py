"""Multi-fragment highlighting (search.highlight.snippets_multi) —
Solr hl.snippets=N + hl.tag.pre/post semantics on a hand-checked doc."""

from __future__ import annotations


def _rows(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from hbase_increment_index_spark.search.highlight import snippets_multi

    return snippets_multi(
        df, "doc_id", "text", term="x", window=2, max_snippets=3
    ).orderBy("snippet_no").collect()


def test_fragments_in_document_order_with_tags(spark):
    out = _rows(spark, "a b x c d e f x g h i j k l x m n x o")
    # 4 occurrences, capped at 3, document order
    assert [r["snippet_no"] for r in out] == [1, 2, 3]
    assert [r["pos"] for r in out] == [3, 8, 15]
    assert out[0]["snippet"] == "a b <em>x</em> c d"
    assert out[1]["snippet"] == "e f <em>x</em> g h"
    assert out[2]["snippet"] == "k l <em>x</em> m n"


def test_window_clips_at_document_edges(spark):
    out = _rows(spark, "x a b")
    assert len(out) == 1
    assert out[0]["pos"] == 1
    assert out[0]["snippet"] == "<em>x</em> a b"
    out = _rows(spark, "a b c x")
    assert out[0]["snippet"] == "b c <em>x</em>"


def test_non_matching_docs_emit_nothing(spark):
    assert _rows(spark, "nothing here") == []


def test_custom_tags(spark):
    from hbase_increment_index_spark.search.highlight import snippets_multi

    df = spark.createDataFrame([(1, "a x b")], "doc_id long, text string")
    out = snippets_multi(
        df, "doc_id", "text", term="x", window=1, pre="[", post="]"
    ).collect()
    assert out[0]["snippet"] == "a [x] b"
