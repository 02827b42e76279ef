"""Unit tests for spellcheck (index-vocabulary correction), RRF
fusion, and facet.prefix on hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_increment_index_spark.search.facets import facet_field
from hbase_increment_index_spark.search.ranking import rrf_fuse, with_rank
from hbase_increment_index_spark.search.spell import spellcheck


def test_spellcheck_prefers_distance_then_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark shark"),
            (3, "stark"),
        ],
        "doc_id long, text string",
    )
    out = {r["input"]: r for r in spellcheck(docs, "doc_id", "text", ["sprak"]).collect()}
    # spark/shark/stark are all within 2 edits; spark wins on df (2 docs)
    assert out["sprak"]["suggestion"] == "spark"
    assert out["sprak"]["dist"] == 2 and out["sprak"]["df"] == 2


def test_spellcheck_no_candidate_within_distance(spark):
    docs = spark.createDataFrame([(1, "completely unrelated")], "doc_id long, text string")
    assert spellcheck(docs, "doc_id", "text", ["zzzzzz"]).count() == 0


def test_spellcheck_collate_corrects_and_verifies(spark):
    from hbase_increment_index_spark.search.spell import spellcheck_collate

    docs = spark.createDataFrame(
        [
            (1, "spark query engine"),
            (2, "spark query planner"),
            (3, "unrelated words here"),
        ],
        "doc_id long, text string",
    )
    row = spellcheck_collate(docs, "doc_id", "text", ["sprak", "qeury"]).collect()[0]
    # both terms correct into the vocabulary; docs 1 and 2 match BOTH
    assert row["collated_query"] == "spark query"
    assert row["hits"] == 2


def test_spellcheck_collate_keeps_uncorrectable_terms(spark):
    from hbase_increment_index_spark.search.spell import spellcheck_collate

    docs = spark.createDataFrame([(1, "spark engine")], "doc_id long, text string")
    row = spellcheck_collate(docs, "doc_id", "text", ["sprak", "zzzzzz"]).collect()[0]
    # no vocabulary term within 2 edits of zzzzzz: it stays as typed,
    # original order preserved, and the collation finds no doc with both
    assert row["collated_query"] == "spark zzzzzz"
    assert row["hits"] == 0


def test_spellcheck_index_path_equals_corpus_path(spark):
    """The postings-served spellcheck/collate twins must return exactly
    what the corpus-scan path returns — only the serving substrate
    differs."""
    from hbase_increment_index_spark.search.inverted import build_inverted_index
    from hbase_increment_index_spark.search.spell import (
        spellcheck,
        spellcheck_collate,
        spellcheck_collate_from_index,
        spellcheck_from_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark query engine"),
            (2, "spark query planner"),
            (3, "unrelated words here"),
        ],
        "doc_id long, text string",
    )
    postings = build_inverted_index(docs, "doc_id", "text")
    inputs = ["sprak", "qeury", "zzzz"]

    scan = {tuple(r) for r in spellcheck(docs, "doc_id", "text", inputs).collect()}
    idx = {tuple(r) for r in spellcheck_from_index(postings, "doc_id", inputs).collect()}
    assert scan == idx and scan  # non-vacuous

    scan_c = spellcheck_collate(docs, "doc_id", "text", inputs).collect()[0]
    idx_c = spellcheck_collate_from_index(postings, "doc_id", inputs).collect()[0]
    assert tuple(scan_c) == tuple(idx_c)
    assert scan_c["collated_query"] == "spark query zzzz" and scan_c["hits"] == 0


def test_group_ngroups_counts(spark):
    from hbase_increment_index_spark.search.paging import group_ngroups

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id long, g string"
    )
    row = group_ngroups(df, "g").collect()[0]
    assert row["matches"] == 4 and row["ngroups"] == 3
    # empty match set: Solr reports (0, 0), never NULL
    empty = group_ngroups(df.filter(F.col("g") == "zz"), "g").collect()[0]
    assert (empty["matches"], empty["ngroups"]) == (0, 0)


def test_rrf_fusion_combines_and_defaults_missing(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "id long, rank int")
    rows = {r["id"]: r["rrf"] for r in rrf_fuse({"a": a, "b": b}, "id", k0=60, k=10).collect()}
    assert rows[2] == round(1 / 62 + 1 / 61, 6)  # in both lists
    assert rows[1] == round(1 / 61, 6)  # only list a
    assert rows[3] == round(1 / 62, 6)  # only list b
    # doc in both lists outranks single-list docs here
    assert rows[2] > rows[1] > rows[3]


def test_with_rank_is_one_based_and_ordered(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 0.9)], "id long, score double")
    got = {
        r["id"]: r["rank"]
        for r in with_rank(df, [F.col("score").desc(), F.col("id").asc()]).collect()
    }
    assert got == {2: 1, 1: 2}


def test_facet_prefix_filters_buckets(spark):
    df = spark.createDataFrame(
        [("Brand#11",), ("Brand#11",), ("Brand#23",), ("Other",)], "b string"
    )
    got = {r["b"]: r["n"] for r in facet_field(df, "b", prefix="Brand#1").collect()}
    assert got == {"Brand#11": 2}
