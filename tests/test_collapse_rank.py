"""Unit tests for field collapsing (search.collapse), multi-select
faceting (facets.facet_field_excluding), function-query recency boost
and significant terms (search.ranking) on hand-built fixtures."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.collapse import collapse
from hbase_increment_index_spark.search.facets import facet_field_excluding
from hbase_increment_index_spark.search.ranking import recency_boost, significant_terms


@pytest.fixture(scope="module")
def orders(spark):
    rows = [
        (1, 10, 100.0),
        (2, 10, 300.0),
        (3, 10, 200.0),
        (4, 20, 50.0),
        (5, 30, 70.0),
        (6, 30, 70.0),  # tie on price -> tie_break on id
    ]
    return spark.createDataFrame(rows, "oid long, cust long, price double")


def test_collapse_picks_best_and_annotates(orders):
    out = collapse(
        orders, "cust", [F.col("price").desc()], tie_break="oid"
    ).collect()
    by_cust = {r["cust"]: r for r in out}
    assert set(by_cust) == {10, 20, 30}
    # best by price desc
    assert by_cust[10]["oid"] == 2 and by_cust[10]["n_in_group"] == 3
    # runner-up id = next under the same ordering
    assert by_cust[10]["expand_head"] == 3
    # singleton group: no expand head
    assert by_cust[20]["oid"] == 4 and by_cust[20]["expand_head"] is None
    assert by_cust[20]["n_in_group"] == 1
    # price tie broken by ascending oid
    assert by_cust[30]["oid"] == 5 and by_cust[30]["expand_head"] == 6


def test_facet_field_excluding_drops_only_tagged_filter(spark):
    rows = [("click", 60.0), ("click", 10.0), ("view", 80.0), ("buy", 90.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    applied = {
        "type_sel": F.col("event_type") == "click",
        "val_min": F.col("value") > 50.0,
    }
    # excluding the type selection: all types with value>50 remain
    got = {
        r["event_type"]: r["n"]
        for r in facet_field_excluding(ev, "event_type", applied, ["type_sel"]).collect()
    }
    assert got == {"click": 1, "view": 1, "buy": 1}
    # excluding nothing: only the selected type survives
    got_all = {
        r["event_type"]: r["n"]
        for r in facet_field_excluding(ev, "event_type", applied, []).collect()
    }
    assert got_all == {"click": 1}


def test_recency_boost_decay(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 1, 1),), (d(2023, 1, 1),), (d(2022, 1, 1),)], "ts date"
    )
    now = F.lit(d(2024, 1, 1))
    out = [
        r["w"]
        for r in df.select(F.round(recency_boost("ts", now, 365.0), 6).alias("w"))
        .orderBy(F.col("w").desc())
        .collect()
    ]
    assert out[0] == 1.0  # zero age
    assert out[1] == 0.5  # exactly one half-life (365 days)
    assert 0.33 < out[2] < 0.34  # two half-lives -> 1/3
    assert out == sorted(out, reverse=True)


def test_significant_terms_lift(spark):
    rows = [
        (1, 1, "apfel brot"),
        (2, 1, "apfel wein"),
        (3, 0, "bread tea"),
        (4, 0, "bread apfel"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, is_fg int, text string")
    out = significant_terms(
        docs, F.col("is_fg") == 1, "doc_id", "text", min_fg_df=1, k=10
    ).collect()
    lifts = {r["term"]: (r["fg_df"], r["df"], r["lift"]) for r in out}
    # "apfel": fg 2/2 vs 3/4 overall -> lift 4/3
    assert lifts["apfel"] == (2, 3, round(4 / 3, 6))
    # fg-only terms get max lift 2.0 (1/2 fg rate / 1/4 corpus rate)
    assert lifts["brot"] == (1, 1, 2.0) and lifts["wein"] == (1, 1, 2.0)
    # background-only terms are filtered by min_fg_df
    assert "bread" not in lifts and "tea" not in lifts
    # sorted by lift desc then term asc
    assert [r["term"] for r in out] == ["brot", "wein", "apfel"]


def test_assign_cells_deterministic_and_probe_path(spark):
    from hbase_increment_index_spark.pipeline.similarity import (
        assign_cells,
        label_cell_centroids,
    )

    rows = [
        (0, 0, [0.0, 0.0]),
        (1, 0, [1.0, 1.0]),
        (2, 1, [10.0, 10.0]),
        (3, 1, [11.0, 11.0]),
        (4, 0, [9.0, 9.5]),  # labeled 0 but nearest to label-1 centroid
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    cents = label_cell_centroids(emb)
    got = {r["cid"]: r["centroid"] for r in cents.collect()}
    assert got[0] == [pytest.approx(10 / 3), pytest.approx(3.5)]
    assert got[1] == [10.5, 10.5]
    assign = {r["vec_id"]: r["cid"] for r in assign_cells(emb, cents).collect()}
    # assignment is by distance, not by original label
    assert assign == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1}
