"""Round-14 operator tests: the commit capstone's pair-once fold,
FilterList composition, /stream reduce()/group(), eval()/plist()
decorators, json.facet join/graph domains, and the math-expression
statistical tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _labels(df):
    return {(r["doc"], r["component"]) for r in df.collect()}


def test_delete_from_clusters_pairs_path_equals_store_and_direct(spark):
    """The r14 commit-capstone optimization: delete_from_clusters'
    ``pairs=`` form (restrict a PRE-delete pair list to surviving
    endpoints — valid because a pair's jaccard is a function of its
    two docs alone, and deletion never creates pairs) must equal both
    the store-served re-pairing form and the direct-corpus form, on a
    fixture whose deletion SPLITS a component (the hard case: the
    bridge doc leaves, survivors must re-cluster into two)."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        connected_components,
        delete_from_clusters,
        ngram_jaccard_pairs,
        shingle_doc_sizes,
    )

    t_a, t_p, t_x = "a b c d e", "p q r s t", "x y z w v"
    v1 = spark.createDataFrame(
        [
            (1, t_a),
            (2, f"{t_a} {t_p}"),  # bridge between the a-group and p-group
            (3, t_p),
            (4, t_a),
            (5, t_p),
            (6, t_x),
            (7, t_x),
        ],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(v1, "doc_id", "text", n=3, threshold=0.30)
    stored = connected_components(pairs)
    deleted = spark.createDataFrame([(2,)], ["doc_id"])
    store = build_shingle_postings(v1, "doc_id", "text", n=3)
    sizes = shingle_doc_sizes(store)

    via_pairs = delete_from_clusters(
        stored, deleted, None, "doc_id", "text", n=3, threshold=0.30,
        pairs=pairs.select("id_a", "id_b"),
    )
    via_store = delete_from_clusters(
        stored, deleted, None, "doc_id", "text", n=3, threshold=0.30,
        postings=store, sizes=sizes,
    )
    final = v1.filter(F.col("doc_id") != 2)
    via_direct = delete_from_clusters(
        stored, deleted, final, "doc_id", "text", n=3, threshold=0.30,
    )
    rebuilt = connected_components(
        ngram_jaccard_pairs(final, "doc_id", "text", n=3, threshold=0.30)
    )
    expect = _labels(rebuilt)
    # the bridge deletion really splits: {1,4} and {3,5} now separate
    assert expect == {(1, 1), (4, 1), (3, 3), (5, 3), (6, 6), (7, 6)}
    assert _labels(via_pairs) == expect
    assert _labels(via_store) == expect
    assert _labels(via_direct) == expect


def test_commit_cluster_labels_store_pairs_equals_default(spark):
    """commit_cluster_labels(store_pairs=...) — the bootstrap-priced
    commit's pair-once path — must produce the same labels as the
    default (store-served re-pairing) fold on a mixed batch with a
    component split, an update that moves a doc across components,
    and an insert pairing with a previously unlabeled doc."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        commit_cluster_labels,
        connected_components,
        ngram_jaccard_pairs,
        shingle_doc_sizes,
    )

    t_a, t_p, t_x = "a b c d e", "p q r s t", "x y z w v"
    v1 = spark.createDataFrame(
        [
            (1, t_a),
            (2, f"{t_a} {t_p}"),
            (3, t_p),
            (4, t_a),
            (5, t_p),
            (6, t_a),
            (8, t_x),
        ],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(v1, "doc_id", "text", n=3, threshold=0.30)
    stored = connected_components(pairs)
    changed = spark.createDataFrame([(6, t_p), (7, t_x)], ["doc_id", "text"])
    deleted = spark.createDataFrame([(2,)], ["doc_id"])
    store = build_shingle_postings(v1, "doc_id", "text", n=3)
    sizes = shingle_doc_sizes(store)

    common = dict(n=3, threshold=0.30)
    via_default = commit_cluster_labels(
        stored, store, sizes, changed, deleted, "doc_id", "text", **common
    )
    via_pairs = commit_cluster_labels(
        stored, store, sizes, changed, deleted, "doc_id", "text",
        store_pairs=pairs.select("id_a", "id_b"), **common
    )
    final = v1.filter(~F.col("doc_id").isin(2, 6)).unionByName(changed)
    rebuilt = connected_components(
        ngram_jaccard_pairs(final, "doc_id", "text", n=3, threshold=0.30)
    )
    assert _labels(via_pairs) == _labels(rebuilt)
    assert _labels(via_default) == _labels(rebuilt)
