"""SecondaryIndex facade: maintain-then-search round trips."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.api import SecondaryIndex

SCHEMA = (
    "op string, row_key string, family string, qualifier string, "
    "value string, ts timestamp, seq long"
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def index(spark):
    idx = SecondaryIndex(spark, families=["cf"], qualifiers=["name", "price"])
    cells = [
        ("put", "r1", "cf", "name", "apple pie recipe", _ts(1), 1),
        ("put", "r1", "cf", "price", "10", _ts(1), 2),
        ("put", "r2", "cf", "name", "banana bread recipe", _ts(2), 3),
        ("put", "r2", "cf", "price", "20", _ts(2), 4),
        ("put", "r3", "cf", "name", "apple cider", _ts(3), 5),
        ("put", "r3", "cf", "price", "30", _ts(3), 6),
        ("put", "r3", "other", "ignored", "x", _ts(3), 7),  # non-indexed family
    ]
    idx.apply_mutations(spark.createDataFrame(cells, SCHEMA))
    return idx


def test_maintain_then_delete(spark, index):
    assert {r["rowkey"] for r in index.documents.collect()} == {"r1", "r2", "r3"}
    inc = [
        ("delete", "r2", "cf", None, None, _ts(9), 10),
        ("put", "r4", "cf", "name", "cherry tart", _ts(9), 11),
        ("put", "r4", "cf", "price", "40", _ts(9), 12),
    ]
    index.apply_mutations(spark.createDataFrame(inc, SCHEMA))
    got = {r["rowkey"]: r["name"] for r in index.documents.collect()}
    assert got == {"r1": "apple pie recipe", "r3": "apple cider", "r4": "cherry tart"}


def test_search_fq_and_fulltext(index):
    resp = index.search(
        q_text=("name", ["apple"], "and"),
        fq=[F.col("price").cast("int") >= 20],
        fl=["rowkey", "name"],
        sort=[F.col("rowkey").asc()],
        rows=10,
        tie_break="rowkey",
    )
    rows = resp.docs.collect()
    assert [r["rowkey"] for r in rows] == ["r3"]


def test_search_facets_and_stats(index):
    resp = index.search(
        rows=None,
        facet_fields=["name"],
        facet_queries={"n_cheap": F.col("price").cast("int") < 25},
        stats_fields=[],
    )
    assert resp.facets["name"].count() == 3
    assert resp.facets["queries"].collect()[0]["n_cheap"] == 2


def test_search_facet_ranges(index):
    # prices 10, 20, 30: buckets 10 and 20, after=1 (30 >= end), between=2
    index.attach(index.documents.withColumn("price_num", F.col("price").cast("double")))
    resp = index.search(
        rows=None,
        facet_ranges={"price_num": {"start": 10.0, "end": 30.0, "gap": 10.0}},
    )
    got = {r["bucket"]: r["n"] for r in resp.facets["range:price_num"].collect()}
    assert got == {"10": 1, "20": 1, "after": 1, "between": 2}


def test_search_group_top_n(index):
    resp = index.search(
        group_field="name",
        group_limit=1,
        sort=[F.col("price").cast("int").desc()],
        tie_break="rowkey",
        fl=["rowkey", "price"],
    )
    rows = resp.docs.collect()
    assert len(rows) == 3  # one per distinct name
    assert set(rows[0].asDict()) == {"name", "rowkey", "price"}


def test_search_solr_query_string(index):
    resp = index.search(q="name:apple AND price:[20 TO *]", text_fields={"name"}, rows=10,
                        fl=["rowkey"], tie_break="rowkey")
    assert [r["rowkey"] for r in resp.docs.collect()] == ["r3"]


def test_rank(index):
    top = index.rank("name", ["apple", "recipe"], k=2, id_col="rowkey").collect()
    assert top[0]["rowkey"] == "r1"  # matches both terms


def test_search_fl_omits_sort_column(index):
    # fl projects AWAY the sort column and the tie-break (rowkey); the
    # sort must still work because pagination runs pre-projection and
    # tie-break defaults to key_field (ADVICE r1).
    resp = index.search(
        sort=[F.col("price").cast("int").desc()],
        fl=["name"],
        start=1,
        rows=2,
    )
    assert [r["name"] for r in resp.docs.collect()] == [
        "banana bread recipe",
        "apple pie recipe",
    ]
    assert resp.docs.columns == ["name"]


def test_suggest_highlight_mlt_facade(index):
    sug = index.suggest("name", "app", k=5).collect()
    assert [r["term"] for r in sug][:1] == ["apple"]  # 2 docs contain it
    hl = {r["rowkey"]: r["snippet"] for r in index.highlight("name", "recipe").collect()}
    assert set(hl) == {"r1", "r2"} and "recipe" in hl["r1"]
    mlt = index.more_like_this("name", "r1", k=3).collect()
    assert mlt[0]["rowkey"] in {"r2", "r3"}  # shares terms with r1


def test_spellcheck_ngroups_facade(index):
    # spellcheck: 'recip' corrects to the index's own 'recipe'
    sc = {r["input"]: r["suggestion"] for r in index.spellcheck("name", ["recip"]).collect()}
    assert sc == {"recip": "recipe"}
    # only r1 ("apple pie recipe") holds BOTH collated terms
    col = index.spellcheck_collate("name", ["aplpe", "recip"]).collect()[0]
    assert col["collated_query"] == "apple recipe" and col["hits"] == 1
    ng = index.ngroups("name").collect()[0]
    assert ng["matches"] == 3 and ng["ngroups"] == 3  # all names distinct


def test_fuzzy_terms_boost_facade(index):
    # fuzzy: 'recipes'~1 matches the 'recipe' token in r1/r2
    fz = index.fuzzy("name", "recipes", max_edits=1).collect()
    assert {(r["rowkey"], r["term"]) for r in fz} == {("r1", "recipe"), ("r2", "recipe")}
    # terms component: docfreq, not occurrence count
    tc = {r["term"]: r["docfreq"] for r in index.terms("name").collect()}
    assert tc["apple"] == 2 and tc["recipe"] == 2 and tc["cider"] == 1
    # boost query: r3 ties with r2 on 'apple' relevance, boost on price=30 lifts it
    ranked = index.rank(
        "name", ["apple"], k=3, boost=F.col("price") == "30", boost_weight=5.0
    ).collect()
    assert ranked[0]["rowkey"] == "r3"


def test_postings_maintained_through_mutations(spark, index):
    """build_postings, then mutate: the facade keeps the full-text
    index in sync incrementally; index-served queries see the new
    state and rank identically to a from-scratch rebuild."""
    from hbase_increment_index_spark.search.inverted import build_inverted_index

    index.build_postings("name")
    inc = [
        ("put", "r1", "cf", "name", "apple tart recipe", _ts(9), 10),  # update
        ("delete", "r3", "cf", None, None, _ts(9), 11),                # delete
        ("put", "r4", "cf", "name", "damson jam", _ts(9), 12),         # insert
    ]
    index.apply_mutations(spark.createDataFrame(inc, SCHEMA))

    key = lambda df: {tuple(r) for r in df.select("term", "rowkey", "tf").collect()}
    rebuilt = build_inverted_index(index.documents, "rowkey", "name")
    assert key(index._postings["name"]) == key(rebuilt)

    hits = {r["rowkey"] for r in index.search_index("name", ["tart"]).collect()}
    assert hits == {"r1"}
    assert index.search_index("name", ["cider"]).count() == 0  # r3 deleted

    from hbase_increment_index_spark.search.ranking import bm25_topk

    via_index = [tuple(r) for r in index.rank("name", ["recipe"], scorer="bm25_index").collect()]
    via_scan = [tuple(r) for r in bm25_topk(index.documents, "rowkey", "name", ["recipe"]).collect()]
    assert via_index == via_scan


def test_search_interval_facets_and_group_queries(index):
    resp = index.search(
        rows=None,
        facet_intervals={
            "price": [
                ("cheap", None, 15.0),
                ("mid", 15.0, 25.0),
                ("buyable", 15.0, None),  # overlaps mid
            ]
        },
        group_queries={
            "apple_docs": F.col("name").contains("apple"),
            "pricey": F.col("price").cast("int") >= 20,
        },
        sort=[F.col("price").cast("int").desc()],
        tie_break="rowkey",
        group_limit=2,
    )
    ivals = {r["interval"]: r["n"] for r in resp.facets["intervals:price"].collect()}
    assert ivals == {"cheap": 1, "mid": 1, "buyable": 2}
    groups = {}
    for r in resp.groups["queries"].collect():
        groups.setdefault(r["group_name"], []).append((r["rank_in_group"], r["rowkey"]))
    # apple docs by price desc: r3 (30) then r1 (10); pricey: r3 (30), r2 (20)
    assert sorted(groups["apple_docs"]) == [(1, "r3"), (2, "r1")]
    assert sorted(groups["pricey"]) == [(1, "r3"), (2, "r2")]


def test_delete_by_query(spark, index):
    index.build_postings("name")
    index.delete_by_query(F.col("price").cast("int") >= 20)
    assert {r["rowkey"] for r in index.documents.collect()} == {"r1"}
    # postings pruned too: only r1's name terms remain
    ids = {r["rowkey"] for r in index._postings["name"].collect()}
    assert ids == {"r1"}
    # deleted rowkeys can be re-inserted afterwards (tombstone ordering)
    late = dt.datetime(2024, 1, 1, 0, 5, 0)
    inc = [("put", "r2", "cf", "name", "banana muffin", late, 99),
           ("put", "r2", "cf", "price", "5", late, 100)]
    index.apply_mutations(spark.createDataFrame(inc, SCHEMA))
    got = {r["rowkey"]: r["name"] for r in index.documents.collect()}
    assert got == {"r1": "apple pie recipe", "r2": "banana muffin"}


def test_phrase_from_index_maintained_through_mutations(spark, index):
    got = {r["rowkey"]: r["n_occurrences"] for r in index.phrase("name", ["apple", "pie"]).collect()}
    assert got == {"r1": 1}
    # update r1's name away from the phrase; insert r5 containing it twice
    late = dt.datetime(2024, 1, 1, 0, 6, 0)
    inc = [
        ("put", "r1", "cf", "name", "plum tart", late, 50),
        ("put", "r5", "cf", "name", "apple pie and apple pie again", late, 51),
    ]
    index.apply_mutations(spark.createDataFrame(inc, SCHEMA))
    got = {r["rowkey"]: r["n_occurrences"] for r in index.phrase("name", ["apple", "pie"]).collect()}
    assert got == {"r5": 2}


def test_join_parsers_on_facade(spark, index):
    reviews = spark.createDataFrame(
        [("r1", 5, "great"), ("r1", 4, "good"), ("r2", 1, "bad"), ("r3", 3, "ok")],
        "doc_key string, stars int, body string",
    )
    # {!parent}: docs with at least one 4+ star review, never duplicated
    parents = index.parent_query(reviews, "doc_key", F.col("stars") >= 4)
    assert [r["rowkey"] for r in parents.collect()] == ["r1"]
    # {!child}: reviews of docs priced >= 20
    kids = index.child_query(reviews, "doc_key", F.col("price").cast("int") >= 20)
    assert {r["doc_key"] for r in kids.collect()} == {"r2", "r3"}
    # {!join}: docs whose key is among low-star review keys
    joined = index.join_query(reviews, "doc_key", F.col("stars") <= 3)
    assert {r["rowkey"] for r in joined.collect()} == {"r2", "r3"}


def test_realtime_get(spark, index):
    got = index.realtime_get(["r1", "r3", "missing"])
    rows = {r["rowkey"]: r["name"] for r in got.collect()}
    assert rows == {"r1": "apple pie recipe", "r3": "apple cider"}


def test_search_facet_params(index):
    resp = index.search(
        rows=None,
        facet_fields={"name": {"mincount": 1, "sort": "index", "limit": 2}},
    )
    rows = resp.facets["name"].collect()
    assert [r["name"] for r in rows] == sorted(r["name"] for r in rows)
    assert len(rows) == 2


def test_edismax_on_facade(index):
    # 'apple' appears in name for r1/r3; mm=1
    out = index.edismax({"name": 2.0}, ["apple", "recipe"], mm=1, k=10)
    got = {r["rowkey"]: r["matched"] for r in out.collect()}
    assert got == {"r1": 2, "r3": 1, "r2": 1}


def test_synonym_search_on_facade(index):
    out = index.synonym_search("name", {"pie": ["tart", "bread"]})
    assert {r["rowkey"] for r in out.collect()} == {"r1", "r2"}


def test_graph_query_on_facade(index):
    # price chain: traverse from r1 following name→name is meaningless
    # on this fixture; use rowkey self-edges to smoke the plumbing:
    # from=rowkey to=rowkey means each root only reaches itself.
    out = index.graph_query("rowkey", "rowkey", F.col("rowkey") == "r1", max_depth=2)
    rows = out.collect()
    assert {(r["rowkey"], r["depth"]) for r in rows} == {("r1", 0)}


def test_rerank_on_facade(index):
    out = index.rerank(
        "name", main_terms=["apple"], rerank_terms=["cider"], rerank_docs=5, k=5
    ).collect()
    got = {r["rowkey"]: (r["main_score"], r["score"]) for r in out}
    assert set(got) == {"r1", "r3"}
    # r3 ("apple cider") gains the rerank bump; r1 keeps main only
    assert got["r3"][1] > got["r3"][0]
    assert got["r1"][1] == got["r1"][0]
    assert out[0]["rowkey"] == "r3"


def test_elevate_on_facade(index):
    out = index.elevate("name", ["apple"], elevated_ids=["r2", "r3"], k=5).collect()
    rows = [(r["rowkey"], r["elevated"]) for r in out]
    # pinned first in configured order (r2 then r3), organic tail
    # excludes them: r1 is the only remaining apple match
    assert rows[0] == ("r2", 1) and rows[1] == ("r3", 1)
    assert ("r1", 0) in rows[2:]


def test_elevate_caps_total_rows_and_handles_empty(index):
    # rows=k caps pinned + organic together (Solr rows semantics)
    out = index.elevate("name", ["apple"], elevated_ids=["r2", "r3"], k=2).collect()
    assert [(r["rowkey"], r["elevated"]) for r in out] == [("r2", 1), ("r3", 1)]
    # empty elevation list degrades to the plain organic ranking
    out = index.elevate("name", ["apple"], elevated_ids=[], k=10).collect()
    assert {r["rowkey"] for r in out} == {"r1", "r3"}
    assert all(r["elevated"] == 0 for r in out)


def test_sounds_like_scan_and_index_paths(index):
    # 'aple' sounds like 'apple' (A140): r1 and r3 match
    scan = {r["rowkey"] for r in index.sounds_like("name", "aple").collect()}
    assert scan == {"r1", "r3"}
    index.build_postings("name")
    via_index = {r["rowkey"] for r in index.sounds_like("name", "aple").collect()}
    assert via_index == scan


def test_ltr_facade(index):
    out = index.ltr(
        "name", ["apple"], weights={"original_score": 1.0}, rerank_docs=5, k=5
    ).collect()
    assert out and all(r.ltr_score == r.original_score for r in out)


def test_stream_expr_facade(index):
    got = index.stream_expr(
        'rollup(search(documents, fl="rowkey,name"), over="name", count(*))'
    )
    assert {r.name for r in got.collect()} == {
        "apple pie recipe", "banana bread recipe", "apple cider"
    }


def test_analyze_facade(index):
    assert index.analyze("The apples of the queries") == ["apple", "query"]


def test_sql_facade(index):
    got = index.sql(
        "SELECT count(*) AS n FROM documents WHERE name LIKE '%apple%'"
    ).first()
    assert got.n == 2


def test_function_query_facade(index):
    # price is a string qualifier -> wrap docs via sql cast first
    out = index.function_query("sum(product(2, 3), 4)", k=2).collect()
    assert len(out) == 2 and all(r.score == 10.0 for r in out)


def test_save_load_roundtrip(index, spark, tmp_path):
    index.build_postings("name")
    path = str(tmp_path / "idx")
    index.save(path)
    loaded = type(index).load(
        spark, path, families=["cf"], qualifiers=["name", "price"]
    )
    # same documents, same postings-served search, and still mutable
    assert {r.rowkey for r in loaded.documents.collect()} == {
        r.rowkey for r in index.documents.collect()
    }
    assert "name" in loaded._postings
    got = {r["rowkey"] for r in loaded.search_index("name", ["apple"]).collect()}
    want = {r["rowkey"] for r in index.search_index("name", ["apple"]).collect()}
    assert got == want
    import datetime as dt

    loaded.apply_mutations(
        spark.createDataFrame(
            [("put", "r9", "cf", "name", "apple tart", dt.datetime(2024, 1, 2), 99)],
            SCHEMA,
        )
    )
    assert {r.rowkey for r in loaded.documents.collect()} >= {"r1", "r2", "r3", "r9"}


def test_stream_expr_text_semantics(index):
    # bare q on a qualifier is a token match through the facade (the
    # review's name:apple case) — not full-string equality
    got = index.stream_expr('search(documents, q="name:apple", fl="rowkey,name")')
    assert {r.rowkey for r in got.collect()} == {"r1", "r3"}


def test_json_query_facade(index):
    got = index.json_query(
        {"query": {"field": {"f": "name", "query": "apple"}},
         "sort": "rowkey asc", "fields": "rowkey"}
    ).collect()
    assert [r.rowkey for r in got] == ["r1", "r3"]


def test_json_request_with_facets(index):
    resp = index.json_request(
        {
            "query": {"field": {"f": "name", "query": "recipe"}},
            "sort": "rowkey asc",
            "limit": 1,
            "facet": {
                "by_name": {"type": "terms", "field": "name"},
                "expensive": {"type": "query", "q": {"range": {"f": "price", "lower": "20"}}},
                "price_stats": {"type": "stats", "field": "price"},
            },
        }
    )
    # paging applies to docs, NOT the facet domain
    assert [r.rowkey for r in resp.docs.collect()] == ["r1"]
    facet = {r["name"]: r.n for r in resp.facets["by_name"].collect()}
    assert facet == {"apple pie recipe": 1, "banana bread recipe": 1}
    assert resp.facets["expensive"].first().n == 1  # only r2 (price 20) matches
    assert "price_stats" in resp.stats


def test_span_near_on_facade(index):
    # 'apple ... recipe' within 2 positions (either order): r1 only
    # ("apple pie recipe" — distance 2); r3 has apple but no recipe
    got = {r["rowkey"] for r in index.span_near("name", "recipe", "apple", distance=2).collect()}
    assert got == {"r1"}
    # distance 1 excludes r1 (terms are 2 apart)
    assert index.span_near("name", "recipe", "apple", distance=1).count() == 0
    # the ad-hoc path is term-restricted, NOT a cached full-corpus
    # build: no positional index may appear as a side effect
    assert index._positional == {}
    # ... and once the index IS materialized, span_near serves from it
    # with identical results
    index.build_positional_postings("name")
    served = {r["rowkey"] for r in index.span_near("name", "recipe", "apple", distance=2).collect()}
    assert served == {"r1"}
