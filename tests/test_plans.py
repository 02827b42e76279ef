"""Physical-plan shape regression tests.

The scale story (SCALE.md) rests on specific plan properties — filters
pushed into scans, dimension joins broadcast, top-k via per-partition
heaps, projections shuffle-free. These assertions pin them so a future
refactor that silently trades one away fails CI instead of only
showing up as a 100 TB regression.
"""

from __future__ import annotations

import pytest

from hbase_increment_index_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_filter_eq")
    assert "EqualTo(o_orderstatus,F)" in plan  # in PushedFilters
    assert "Exchange" not in plan  # pure scan+filter, no shuffle


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "olap_revenue_by_region")
    # four dimension joins (orders side joins lineitem by key)
    assert plan.count("BroadcastHashJoin") >= 4
    # the fact table is never sort-merged against a dimension
    assert plan.count("SortMergeJoin") <= 1


def test_topk_uses_partial_heaps(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q07_sort_topk")
    assert "TakeOrderedAndProject" in plan
    # no global Sort materialization for a limit query
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


@pytest.mark.parametrize("name", ["q33_fuzzy", "e8_zorder", "e3f_quantize"])
def test_projection_ops_are_shuffle_free(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan, f"{name} grew a shuffle"
    assert "SortMergeJoin" not in plan


def test_ranking_filters_before_aggregation(spark, sf_dir):
    # the broadcast of the tiny query-term set must sit BELOW the first
    # aggregate: postings are filtered before any groupBy
    plan = _plan(spark, sf_dir, "q06_tfidf_topk")
    first_agg = plan.find("HashAggregate")
    first_bjoin = plan.find("BroadcastHashJoin")
    assert first_bjoin != -1 and first_agg != -1
    assert "SortMergeJoin" not in plan


def test_interval_join_is_hash_not_nested_loop(spark, sf_dir):
    # the bin decomposition must keep the range join an equi hash join;
    # a BroadcastNestedLoopJoin here means the quadratic plan came back
    plan = _plan(spark, sf_dir, "q25b_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_cdc_compaction_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cdc_latest_per_key")
    # one exchange on row_key feeds the window; AQE may add a read stage
    assert plan.count("Exchange") <= 2
    assert "WindowGroupLimit" in plan or "Window" in plan
