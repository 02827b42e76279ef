"""Unit tests for facet.interval and group.query (search.facets) on
hand-built fixtures with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.search.facets import facet_intervals, group_query


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 50.0, "a"),
        (3, 100.0, "b"),
        (4, 150.0, "b"),
        (5, 500.0, "c"),
    ]
    return spark.createDataFrame(rows, "id long, price double, cat string")


def test_facet_intervals_counts_and_order(sales):
    out = facet_intervals(
        sales,
        "price",
        [
            ("small", None, 100.0),
            ("mid", 100.0, 200.0),
            ("big", 200.0, None),
            ("over_50_overlap", 50.0, None),  # overlaps mid+big
        ],
    ).collect()
    got = {r["interval"]: r["n"] for r in out}
    assert got == {"small": 2, "mid": 2, "big": 1, "over_50_overlap": 4}
    # requested order preserved
    assert [r["interval"] for r in out] == ["small", "mid", "big", "over_50_overlap"]


def test_facet_intervals_open_bounds(sales):
    out = facet_intervals(sales, "price", [("all", None, None)]).collect()
    assert out[0]["n"] == 5


def test_group_query_topk_and_overlap(sales):
    out = group_query(
        sales,
        {
            "cheap": F.col("price") < 120.0,
            "cat_b": F.col("cat") == "b",
        },
        order=[F.col("price").desc()],
        tie_break="id",
        limit=2,
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_name"], []).append((r["rank_in_group"], r["id"]))
    # cheap: prices 100, 50 (desc) -> ids 3, 2
    assert sorted(by_group["cheap"]) == [(1, 3), (2, 2)]
    # cat_b: prices 150, 100 -> ids 4, 3; id 3 appears in BOTH groups
    assert sorted(by_group["cat_b"]) == [(1, 4), (2, 3)]


def test_group_query_drops_nonmatching_rows(sales):
    out = group_query(
        sales,
        {"expensive": F.col("price") > 400.0},
        order=[F.col("price").desc()],
        tie_break="id",
        limit=5,
    ).collect()
    assert [r["id"] for r in out] == [5]


def test_facet_field_paging_partitions_ordered_buckets(spark):
    """Solr facet paging laws (post-ADVICE fix): sort ALWAYS applies —
    limit=None comes back ordered, offset without limit skips buckets,
    and consecutive pages concatenate to the full ordered bucket list
    for both sort modes; unknown sort raises."""
    import pytest as _pytest

    from hbase_increment_index_spark.search.facets import facet_field

    df = spark.createDataFrame(
        [(v,) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1 + ["e"] * 2],
        "cat string",
    )
    for sort in ("count", "index"):
        full = [tuple(r) for r in facet_field(df, "cat", sort=sort).collect()]
        assert len(full) == 5
        if sort == "count":
            assert full[0] == ("a", 5) and full[1] == ("b", 3)  # count desc, value asc ties
        else:
            assert [v for v, _ in full] == sorted(v for v, _ in full)
        pages = []
        for off in (0, 2, 4):
            pages += [
                tuple(r)
                for r in facet_field(df, "cat", sort=sort, limit=2, offset=off).collect()
            ]
        assert pages == full
        tail = [tuple(r) for r in facet_field(df, "cat", sort=sort, offset=3).collect()]
        assert tail == full[3:]  # offset without limit
    with _pytest.raises(ValueError):
        facet_field(df, "cat", sort="popularity")


def test_facet_range_other_fractional_gap_and_empty_between(spark):
    """Fractional gaps must keep distinct bucket labels (no long-cast
    collapse), and an empty [start, end) window reports between=0, not
    NULL — Solr's facet.range.other semantics."""
    from hbase_increment_index_spark.search.facets import facet_range_other

    df = spark.createDataFrame([(0.2,), (0.7,), (1.2,), (2.5,)], "price double")
    got = {r["bucket"]: r["n"] for r in
           facet_range_other(df, "price", 0.0, 2.0, 0.5).collect()}
    # 0.2 -> bucket 0.0; 0.7 -> 0.5; 1.2 -> 1.0; 2.5 -> after
    assert got["0.0"] == 1 and got["0.5"] == 1 and got["1.0"] == 1
    assert got["after"] == 1 and got["between"] == 3 and "before" not in got

    empty = {r["bucket"]: r["n"] for r in
             facet_range_other(df, "price", 100.0, 200.0, 50.0).collect()}
    assert empty == {"before": 4, "between": 0}


def test_merge_facet_counts_moves_and_dropout(spark):
    from hbase_increment_index_spark.search.facets import facet_field, merge_facet_counts

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id long, cat string"
    )
    counts_v1 = facet_field(v1, "cat")
    # batch: id 3 moves b -> a, id 4 (only c) deleted, id 5 inserted as b
    old_rows = spark.createDataFrame([(3, "b"), (4, "c")], "id long, cat string")
    new_rows = spark.createDataFrame([(3, "a"), (5, "b")], "id long, cat string")
    merged = {
        r["cat"]: r["n"]
        for r in merge_facet_counts(
            counts_v1, old_rows, new_rows, F.col("cat"), "cat"
        ).collect()
    }
    # final corpus: 1a 2a 3a 5b -> a=3, b=1, c gone entirely
    assert merged == {"a": 3, "b": 1}


def test_facet_range_missing(spark):
    from hbase_increment_index_spark.search.facets import facet_range_missing

    df = spark.createDataFrame(
        [(1, "5"), (2, "15"), (3, "25"), (4, None), (5, None)],
        "id long, amount string",
    )
    got = {r["bucket"]: r["n"] for r in facet_range_missing(df, "amount", 10.0).collect()}
    assert got == {"0": 1, "10": 1, "20": 1, "(missing)": 2}


def test_merge_rollup_sums_multi_batch_equals_rebuild(spark):
    """Two successive micro-batches folded into a (n, Σ) rollup view
    equal the from-scratch rollup over the final corpus, decimal-exact."""
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.search.facets import merge_rollup_sums

    rows = [(i, f"s{i % 3}", float(i)) for i in range(30)]
    docs = spark.createDataFrame(rows, ["id", "k", "v"])
    view = docs.groupBy(F.col("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(30,6)")).alias("sum_value"),
    )
    # batch 1: update ids % 4 == 0 (v += 100), delete ids % 9 == 0 (others)
    up_old = docs.filter(F.col("id") % 4 == 0)
    up_new = up_old.withColumn("v", F.col("v") + 100)
    dele = docs.filter((F.col("id") % 9 == 0) & (F.col("id") % 4 != 0))
    view = merge_rollup_sums(view, up_old.unionByName(dele), up_new, F.col("k"), "k", "v")
    state1 = docs.filter(~((F.col("id") % 9 == 0) & (F.col("id") % 4 != 0))).withColumn(
        "v", F.when(F.col("id") % 4 == 0, F.col("v") + 100).otherwise(F.col("v"))
    )
    # batch 2: insert 5 new docs in a brand-new key
    ins = spark.createDataFrame([(100 + i, "s9", 1.5) for i in range(5)], ["id", "k", "v"])
    view = merge_rollup_sums(view, state1.limit(0), ins, F.col("k"), "k", "v")
    final = state1.unionByName(ins)

    want = {
        (r.k, r.n, float(r.s))
        for r in final.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(30,6)")).alias("s"))
        .collect()
    }
    got = {(r.k, r.n, float(r.sum_value)) for r in view.collect()}
    assert got == want


def test_merge_rollup_sums_zero_count_drops_key(spark):
    from pyspark.sql import functions as F

    from hbase_increment_index_spark.search.facets import merge_rollup_sums

    docs = spark.createDataFrame([(1, "only", 2.0)], ["id", "k", "v"])
    view = docs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(30,6)")).alias("sum_value"),
    )
    merged = merge_rollup_sums(view, docs, docs.limit(0), F.col("k"), "k", "v")
    assert merged.count() == 0


def test_facet_range_include_combos_match_brute_force(spark):
    """facet.range.include boundary semantics (lower/upper/edge/outer/
    all) against a literal per-value reimplementation, on a fixture
    dense in boundary hits."""
    import itertools

    from hbase_increment_index_spark.search.facets import facet_range_include

    vals = [float(v) for v in range(0, 51)] + [10.0, 20.0, 40.0, 40.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    start, end, gap, nb = 10.0, 40.0, 10.0, 3

    def brute(inc):
        inc = set(inc)
        if "all" in inc:
            inc = {"lower", "upper", "edge", "outer"}
        out: dict[str, int] = {}

        def add(k):
            out[k] = out.get(k, 0) + 1

        s_in = "lower" in inc or "edge" in inc
        e_in = "upper" in inc or "edge" in inc
        for v in vals:
            for k in range(nb):
                lb, ub = start + k * gap, start + (k + 1) * gap
                lo = "lower" in inc or ("edge" in inc and k == 0)
                up = "upper" in inc or ("edge" in inc and k == nb - 1)
                if (v >= lb if lo else v > lb) and (v <= ub if up else v < ub):
                    add(str(int(lb)))
            if v < start or (v == start and ("outer" in inc or not s_in)):
                add("before")
            if v > end or (v == end and ("outer" in inc or not e_in)):
                add("after")
            if (v >= start if s_in else v > start) and (v <= end if e_in else v < end):
                add("between")
        return out

    combos = [("lower",), ("upper",), ("edge",), ("lower", "upper"),
              ("upper", "outer"), ("edge", "outer"), ("all",)]
    for inc in combos:
        got = {
            r["bucket"]: r["n"]
            for r in facet_range_include(df, "v", start, end, gap, include=inc).collect()
        }
        assert got == brute(inc), f"include={inc}"
    # lower+upper double-counts interior boundaries: 20.0 appears in
    # both the 10 and 20 buckets (Solr-documented behavior)
    lu = {
        r["bucket"]: r["n"]
        for r in facet_range_include(df, "v", start, end, gap,
                                     include=("lower", "upper")).collect()
    }
    only_lower = {
        r["bucket"]: r["n"]
        for r in facet_range_include(df, "v", start, end, gap,
                                     include=("lower",)).collect()
    }
    assert lu["10"] == only_lower["10"] + 2  # the two extra 20.0s


def test_facet_range_include_rejects_bad_values(spark):
    import pytest as _pytest

    from hbase_increment_index_spark.search.facets import facet_range_include

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError):
        facet_range_include(df, "v", 0.0, 10.0, 1.0, include=("sideways",))
    with _pytest.raises(ValueError):
        facet_range_include(df, "v", 0.0, 0.0, 1.0)
