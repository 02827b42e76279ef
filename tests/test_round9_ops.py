"""Round-9 operators: multi-fragment highlighting
(search.highlight.snippets_multi — Solr hl.snippets=N +
hl.tag.pre/post on hand-checked docs) and the Solr 9.x {!knn}
dense-vector query parser (pipeline.similarity.knn_query)."""

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


# ---------------------------------------------------------------- {!knn}


def test_knn_parser_prefilter_and_errors(spark, sf_dir):
    """{!knn f=.. topK=..}[vector] parsing + fq-as-PRE-filter: the
    filter restricts candidates before ranking (ids >= 500 can never
    appear), and it is not a post-filter (the unfiltered top-k differs,
    proving the filter changed the candidate set, not trimmed the
    result)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.pipeline.similarity import knn_query

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vec = [((i * 37) % 21 - 10) / 10.0 for i in range(64)]
    qtext = "{!knn f=embedding topK=5}[" + ", ".join(map(repr, vec)) + "]"
    pre = knn_query(emb, qtext, pre_filter=F.col("vec_id") < 50).collect()
    assert len(pre) == 5 and all(r["vec_id"] < 50 for r in pre)
    unfiltered = knn_query(emb, qtext).collect()
    assert {r["vec_id"] for r in unfiltered} != {r["vec_id"] for r in pre}
    # topK falls back to k_default when absent
    no_k = "{!knn f=embedding}[" + ", ".join(map(repr, vec)) + "]"
    assert knn_query(emb, no_k, k_default=3).count() == 3
    with _pytest.raises(ValueError):
        knn_query(emb, "{!knn f=embedding topK=5}not-a-vector")
    with _pytest.raises(ValueError):
        knn_query(emb, "{!knn f=embedding}[]")
