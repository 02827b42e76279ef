"""Round-12 operators: the persisted shingle-postings store and its
store-served incremental near-dup pairing (r11 verdict #1 — the last
corpus-linear serving path closed), including the merge ≡ rebuild
proof and the no-corpus-scan / directory-prune plan contract."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )


def _pairs_set(df):
    return {
        (r["id_new"], r["id_old"], r["jaccard"]) for r in df.collect()
    }


# ------------------------------------- store-served ≡ direct pairing


def test_from_index_equals_direct_pairing(spark):
    """incremental_near_dups_from_index over a store built from the
    corpus must produce EXACTLY the direct (re-shingle everything)
    form's pairs — same ids, same jaccard values."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        incremental_near_dups,
        incremental_near_dups_from_index,
        shingle_doc_sizes,
    )

    docs = _docs(spark)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    direct = incremental_near_dups(
        existing, incoming, "doc_id", "text", n=3, threshold=0.30
    )
    store = build_shingle_postings(existing, "doc_id", "text", n=3)
    sizes = shingle_doc_sizes(store)
    served = incremental_near_dups_from_index(
        store, sizes, incoming, "doc_id", "text", n=3, threshold=0.30
    )
    d, s = _pairs_set(direct), _pairs_set(served)
    assert d == s
    assert len(d) > 0  # the fixture must actually exercise the pairing


def test_from_index_skew_guard_prunes_join_only(spark):
    """With a ceiling, the store-served form drops high-combined-df
    shingles from the JOIN (pairs become a subset / jaccard can only
    drop) while denominators keep the store's full counts."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        incremental_near_dups_from_index,
        shingle_doc_sizes,
    )

    docs = _docs(spark)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    store = build_shingle_postings(existing, "doc_id", "text", n=3)
    sizes = shingle_doc_sizes(store)
    free = incremental_near_dups_from_index(
        store, sizes, incoming, "doc_id", "text", n=3, threshold=0.0
    )
    guarded = incremental_near_dups_from_index(
        store, sizes, incoming, "doc_id", "text", n=3, threshold=0.0,
        max_join_shingle_df=5,
    )
    f = {(r["id_new"], r["id_old"]): r["jaccard"] for r in free.collect()}
    g = {(r["id_new"], r["id_old"]): r["jaccard"] for r in guarded.collect()}
    assert set(g) <= set(f)
    assert all(g[k] <= f[k] for k in g)


# --------------------------------------------- store merge ≡ rebuild


def test_merge_shingle_store_equals_rebuild(spark):
    """One CDC batch (inserts + text updates + deletes) folded into the
    v1 store must equal the store rebuilt from the final corpus —
    postings AND the sizes side table."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        merge_shingle_postings,
        merge_shingle_sizes,
        shingle_doc_sizes,
    )

    docs = _docs(spark)
    m = F.col("doc_id") % 10
    v1 = docs.filter(m != 0).withColumn(
        "text", F.when(m == 1, F.substring("text", 1, 20)).otherwise(F.col("text"))
    )
    store_v1 = build_shingle_postings(v1, "doc_id", "text", n=3)
    sizes_v1 = shingle_doc_sizes(store_v1)
    changed = docs.filter(m.isin(0, 1)).select("doc_id", "text")  # inserts + updates
    deleted = docs.filter(m == 2).select("doc_id")
    merged = merge_shingle_postings(
        store_v1, changed, deleted, "doc_id", "text", n=3
    )
    merged_sizes = merge_shingle_sizes(
        sizes_v1, changed, deleted, "doc_id", "text", n=3
    )
    final = docs.filter(m != 2)
    rebuilt = build_shingle_postings(final, "doc_id", "text", n=3)
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0
    rebuilt_sizes = shingle_doc_sizes(rebuilt)
    assert merged_sizes.exceptAll(rebuilt_sizes).count() == 0
    assert rebuilt_sizes.exceptAll(merged_sizes).count() == 0


def test_merge_shingle_store_idempotent(spark):
    """Re-delivering the same batch leaves the store unchanged (the
    at-least-once delivery contract every CDC merge in the engine
    honors)."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        merge_shingle_postings,
    )

    docs = _docs(spark)
    m = F.col("doc_id") % 10
    v1 = docs.filter(m != 0)
    store_v1 = build_shingle_postings(v1, "doc_id", "text", n=3)
    changed = docs.filter(m == 1).select("doc_id", "text")
    deleted = docs.filter(m == 2).select("doc_id")
    once = merge_shingle_postings(store_v1, changed, deleted, "doc_id", "text", n=3)
    twice = merge_shingle_postings(once, changed, deleted, "doc_id", "text", n=3)
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


# ------------------------------------------------- the plan contract


def test_served_plan_prunes_store_and_never_scans_corpus(spark, tmp_path):
    """The serve plan over the PERSISTED store must (a) push the
    delta's bucket IN-list down to a partition (directory) prune on
    the store scan, and (b) contain no scan of the documents parquet —
    corpus text is never touched at serve time."""
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        incremental_near_dups_from_index,
        shingle_doc_sizes,
        write_shingle_store,
    )

    docs = _docs(spark)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    # the delta arrives as an in-memory batch (the CDC shape) — the
    # serve plan must then contain NO parquet scan of any corpus text
    incoming = spark.createDataFrame(
        [(900_001, "stream data engine joins the hash table build"),
         (900_002, "query planner pushes the filter into the scan")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "shingle_store")
    write_shingle_store(
        build_shingle_postings(existing, "doc_id", "text", n=3), path
    )
    shingle_doc_sizes(spark.read.parquet(path)).write.mode("overwrite").parquet(
        str(tmp_path / "sizes")
    )
    store = spark.read.parquet(path)
    sizes = spark.read.parquet(str(tmp_path / "sizes"))
    served = incremental_near_dups_from_index(
        store, sizes, incoming, "doc_id", "text", n=3, threshold=0.10
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    import re

    # (a) the delta's bucket IN-list reached the store scan as a
    # partition (directory) filter — "INSET" / "IN" depending on size
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(re.search(r"PartitionFilters: \[shb#\d+ IN", ln) for ln in pf), pf
    # (b) no corpus scan anywhere in the serve plan's file sources
    scans = [ln for ln in plan.splitlines() if "documents.parquet" in ln]
    assert scans == [], scans
    assert served.count() >= 0  # the plan executes


def test_shingle_bucket_is_pure_function_of_shingle(spark):
    """Every posting row of a given shingle lands in one bucket — the
    prune can never split a shingle's postings across directories."""
    from hbase_increment_index_spark.pipeline.dedup import build_shingle_postings

    docs = _docs(spark).limit(200)
    store = build_shingle_postings(docs, "doc_id", "text", n=3)
    bad = (
        store.groupBy("sh")
        .agg(F.countDistinct("shb").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert bad == 0


# -------------------------------------- the composed derived-index commit


def test_commit_all_stores_equals_rebuild(spark):
    """One CDC batch folded into EVERY derived store must leave each
    store row-identical to its from-scratch rebuild over the final
    corpus — the composed merge ≡ rebuild contract behind
    cdc_commit_all_stores (the registry oracle checks cardinalities;
    this is the row-level proof)."""
    from hbase_increment_index_spark.queries._cdc import _commit_all_stores

    merged = _commit_all_stores(spark, SF_DIR, rebuilt=False)
    rebuilt = _commit_all_stores(spark, SF_DIR, rebuilt=True)
    assert sorted(merged) == sorted(rebuilt)
    for name in sorted(merged):
        a, b = merged[name], rebuilt[name]
        extra = a.exceptAll(b).count()
        missing = b.exceptAll(a).count()
        assert (extra, missing) == (0, 0), (
            f"store {name}: {extra} rows only in merged, {missing} only in rebuild"
        )


# --------------------------------------------- shortestPath() stream op


def _graph(spark, edges):
    return spark.createDataFrame(edges, ["src", "dst"])


def _sp(spark, df, frm, to, max_depth=4):
    from hbase_increment_index_spark.search.streaming_expr import StreamCompiler

    comp = StreamCompiler({"g": df})
    return comp.compile(
        f'shortestPath(g, from="{frm}", to="{to}", '
        f'edge="src=dst", maxDepth="{max_depth}")'
    ).collect()


def test_shortest_path_finds_bfs_path(spark):
    """a→b→d beats a→c→e→d; steps come back 0..len ordered."""
    g = _graph(spark, [("a", "b"), ("b", "d"), ("a", "c"), ("c", "e"), ("e", "d")])
    rows = _sp(spark, g, "a", "d")
    assert [(r["step"], r["node"]) for r in rows] == [(0, "a"), (1, "b"), (2, "d")]


def test_shortest_path_min_parent_tie_break(spark):
    """Two equal-length paths a→b→z / a→c→z: the canonical path takes
    the MIN parent (b), deterministically."""
    g = _graph(spark, [("a", "c"), ("a", "b"), ("b", "z"), ("c", "z")])
    rows = _sp(spark, g, "a", "z")
    assert [(r["step"], r["node"]) for r in rows] == [(0, "a"), (1, "b"), (2, "z")]


def test_shortest_path_unreachable_and_depth_cap(spark):
    g = _graph(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert _sp(spark, g, "a", "zzz") == []          # no such node
    assert _sp(spark, g, "a", "d", max_depth=2) == []  # beyond the cap
    assert [r["node"] for r in _sp(spark, g, "a", "d", max_depth=3)] == [
        "a", "b", "c", "d"
    ]


def test_shortest_path_ignores_duplicate_edges_and_cycles(spark):
    g = _graph(
        spark,
        [("a", "b"), ("a", "b"), ("b", "a"), ("b", "b"), ("b", "c")],
    )
    rows = _sp(spark, g, "a", "c")
    assert [(r["step"], r["node"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_shortest_path_param_validation(spark):
    from hbase_increment_index_spark.search.streaming_expr import (
        StreamCompiler,
        StreamExprError,
    )

    g = _graph(spark, [("a", "b")])
    comp = StreamCompiler({"g": g})
    for expr in [
        'shortestPath(g, from="a", to="b", edge="src->dst")',     # bad edge sep
        'shortestPath(g, from="a", to="b", edge="nope=dst")',     # unknown field
        'shortestPath(g, from="a", to="b", edge="src=dst", maxDepth="99")',
        'shortestPath(g, from="a", to="b", edge="src=dst", maxDepth="x")',
    ]:
        with pytest.raises(StreamExprError):
            comp.compile(expr)


# -------------------------------------------------------- BPE training


def test_bpe_merges_hand_verified(spark):
    """low×2 + lower×1: merge order is (l,o) [tie with (o,w), lex
    break], (lo,w), then (e,r) [count-1 tie, lex], (low,er), then the
    vocabulary is fully merged and training stops early."""
    from hbase_increment_index_spark.queries._pipeline_curation import _bpe_merges

    words = spark.createDataFrame([("low", 2), ("lower", 1)], ["word", "wc"])
    got = [
        (r["iteration"], r["lhs"], r["rhs"], r["pair_count"])
        for r in _bpe_merges(spark, words, k=6).collect()
    ]
    assert got == [
        (1, "l", "o", 3),
        (2, "lo", "w", 3),
        (3, "e", "r", 1),
        (4, "low", "er", 1),
    ]


def test_bpe_counts_weighted_and_greedy_left(spark):
    """'aaa'×1: pair (a,a) counts both adjacencies (standard counting),
    then greedy-left merge leaves (aa, a)."""
    from hbase_increment_index_spark.queries._pipeline_curation import _bpe_merges

    words = spark.createDataFrame([("aaa", 1)], ["word", "wc"])
    got = [
        (r["iteration"], r["lhs"], r["rhs"], r["pair_count"])
        for r in _bpe_merges(spark, words, k=2).collect()
    ]
    assert got == [(1, "a", "a", 2), (2, "aa", "a", 1)]


# -------------------------------------------------- ANN operating curve


def test_probe_sweep_monotone_and_consistent_with_ivf_recall(spark):
    """The operating curve must be monotone (recall and probed
    fraction non-decreasing in n_probe), end at full recall / full
    read at n_probe = n_cells, and its mean at any depth must equal
    ivf_recall's panel mean at that depth (the single-point evaluator
    it generalizes)."""
    from pyspark.sql import functions as F
    from hbase_increment_index_spark.pipeline.similarity import (
        ivf_probe_sweep,
        ivf_recall,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pred = F.col("vec_id") % 50 == 0
    curve = ivf_probe_sweep(emb, pred, k=10).collect()
    assert [r["n_probe"] for r in curve] == list(range(1, len(curve) + 1))
    mr = [r["mean_recall_at_k"] for r in curve]
    pf = [r["probed_code_frac"] for r in curve]
    assert all(a <= b + 1e-9 for a, b in zip(mr, mr[1:]))
    assert all(a <= b + 1e-9 for a, b in zip(pf, pf[1:]))
    last = curve[-1]
    assert last["mean_recall_at_k"] == 1.0
    assert last["min_recall_at_k"] == 1.0
    assert last["full_recall_frac"] == 1.0
    assert abs(last["probed_code_frac"] - 1.0) < 1e-6
    # consistency with the single-point evaluator at a mid depth
    mid = min(3, len(curve))
    point = ivf_recall(emb, pred, k=10, n_probe=mid).collect()
    mean_point = round(sum(r["recall_at_k"] for r in point) / len(point), 6)
    assert abs(curve[mid - 1]["mean_recall_at_k"] - mean_point) < 1e-6


# --------------------------------------------------- cov() + BPE yield


def test_stream_cov_matches_numpy_and_rejects_cross_stream(spark):
    import numpy as np

    from hbase_increment_index_spark.search.streaming_expr import (
        StreamCompiler,
        StreamExprError,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.5), (3.0, 5.5), (4.0, 9.0)], ["x", "y"]
    )
    comp = StreamCompiler({"t": df})
    row = comp.compile(
        'let(a=search(t, fl="x,y"), cov(col(a, x), col(a, y)))'
    ).collect()[0]
    want = float(np.cov([1, 2, 3, 4], [2.0, 4.5, 5.5, 9.0], ddof=1)[0][1])
    assert row["n"] == 4 and abs(row["cov"] - round(want, 6)) < 1e-9
    with pytest.raises(StreamExprError):
        comp.compile(
            'let(a=search(t, fl="x,y"), b=search(t, fl="x,y"), '
            'cov(col(a, x), col(b, y)))'
        )


def test_bpe_yield_curve_shape(spark):
    """Curve starts at the raw character count, is non-increasing, and
    each applied merge can only shrink the corpus symbol count."""
    from hbase_increment_index_spark.queries._pipeline_curation import e4p_bpe_yield

    rows = e4p_bpe_yield(spark, SF_DIR).collect()
    assert [r["n_merges"] for r in rows] == list(range(len(rows)))
    syms = [r["corpus_symbols"] for r in rows]
    assert all(a >= b for a, b in zip(syms, syms[1:]))
    assert rows[0]["compression_vs_chars"] == 1.0
    assert rows[-1]["compression_vs_chars"] < 1.0
    assert all(r["symbols_per_token"] > 0 for r in rows)


def test_moving_avg_values_and_validation(spark):
    from hbase_increment_index_spark.search.streaming_expr import (
        StreamCompiler,
        StreamExprError,
    )

    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(1, 6)], ["k", "v"]
    )
    comp = StreamCompiler({"t": df})
    rows = comp.compile(
        'let(a=search(t, fl="k,v"), '
        'movingAvg(col(a, v), over="k", window="3"))'
    ).collect()
    # full windows only: rows 3..5; avg of trailing 3
    assert [(r["k"], r["moving_avg"]) for r in rows] == [
        (3, 20.0), (4, 30.0), (5, 40.0)
    ]
    for bad in [
        'let(a=search(t, fl="k,v"), movingAvg(col(a, v), over="nope", window="3"))',
        'let(a=search(t, fl="k,v"), movingAvg(col(a, v), over="k", window="0"))',
        'let(a=search(t, fl="k,v"), movingAvg(col(a, v), over="k", window="x"))',
    ]:
        with pytest.raises(StreamExprError):
            comp.compile(bad)


def test_bench_headline_and_stdout_names_resolve():
    """Every bench HEADLINE name must be a registry entry — a typo here
    silently drops a row from BENCH_r{N}.json."""
    import bench
    from hbase_increment_index_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing == []


# ------------------------------------------------ CC-label delete path


def test_delete_from_clusters_split_and_min_removal(spark):
    """Deleting a bridge doc SPLITS its component (survivors with no
    remaining pairs drop out); deleting a component's min-id
    representative relabels the rest to the new min; untouched
    components pass through."""
    from pyspark.sql import functions as F
    from hbase_increment_index_spark.pipeline.dedup import (
        connected_components,
        delete_from_clusters,
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "a1 a2 a3 a4"),                    # ~ 2 only (via bridge)
        (2, "a1 a2 a3 a4 c1 c2 c3 c4"),        # bridge between 1 and 3
        (3, "c1 c2 c3 c4"),
        (20, "t1 t2 t3 t4 t5"),                # identical triple
        (21, "t1 t2 t3 t4 t5"),
        (22, "t1 t2 t3 t4 t5"),
        (30, "u1 u2 u3 u4"),                   # untouched pair
        (31, "u1 u2 u3 u4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stored = connected_components(
        ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.4)
    )
    assert {(r["doc"], r["component"]) for r in stored.collect()} == {
        (1, 1), (2, 1), (3, 1), (20, 20), (21, 20), (22, 20), (30, 30), (31, 30),
    }
    deleted = spark.createDataFrame([(2,), (20,)], "doc_id long")
    final = docs.filter(~F.col("doc_id").isin(2, 20))
    got = {
        (r["doc"], r["component"])
        for r in delete_from_clusters(
            stored, deleted, final, "doc_id", "text", n=2, threshold=0.4
        ).collect()
    }
    # bridge gone: 1 and 3 no longer pair -> drop out; min 20 gone:
    # {21, 22} relabel to 21; {30, 31} untouched
    assert got == {(21, 21), (22, 21), (30, 30), (31, 30)}


def test_delete_from_clusters_equals_rebuild_on_fixture(spark):
    from pyspark.sql import functions as F
    from hbase_increment_index_spark.pipeline.dedup import (
        connected_components,
        delete_from_clusters,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark)
    stored = connected_components(
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.30)
    )
    deleted = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    final = docs.filter(F.col("doc_id") % 17 != 0)
    scoped = delete_from_clusters(
        stored, deleted, final, "doc_id", "text", n=3, threshold=0.30
    )
    rebuilt = connected_components(
        ngram_jaccard_pairs(final, "doc_id", "text", n=3, threshold=0.30)
    )
    assert scoped.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(scoped).count() == 0


def test_pairs_from_index_and_store_served_delete_equal_text_forms(spark):
    """(a) ngram_jaccard_pairs_from_index over the store equals the
    direct text form — full corpus AND restricted to a doc subset;
    (b) the store-served delete path equals the text delete path."""
    from pyspark.sql import functions as F
    from hbase_increment_index_spark.pipeline.dedup import (
        build_shingle_postings,
        connected_components,
        delete_from_clusters,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_from_index,
        shingle_doc_sizes,
    )

    docs = _docs(spark)
    store = build_shingle_postings(docs, "doc_id", "text", n=3)
    sizes = shingle_doc_sizes(store)

    def pset(df):
        return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}

    direct = pset(ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.30))
    served = pset(ngram_jaccard_pairs_from_index(store, sizes, threshold=0.30))
    assert direct == served and len(direct) > 0

    subset = docs.filter(F.col("doc_id") % 3 == 0)
    d_sub = pset(ngram_jaccard_pairs(subset, "doc_id", "text", n=3, threshold=0.30))
    s_sub = pset(
        ngram_jaccard_pairs_from_index(
            store, sizes, threshold=0.30,
            doc_set=subset.select(F.col("doc_id").alias("doc")),
        )
    )
    assert d_sub == s_sub

    stored = connected_components(
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.30)
    )
    deleted = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    final = docs.filter(F.col("doc_id") % 17 != 0)
    via_text = delete_from_clusters(
        stored, deleted, final, "doc_id", "text", n=3, threshold=0.30
    )
    via_store = delete_from_clusters(
        stored, deleted, None, "doc_id", "text", n=3, threshold=0.30,
        postings=store, sizes=sizes,
    )
    assert via_text.exceptAll(via_store).count() == 0
    assert via_store.exceptAll(via_text).count() == 0


# --------------------------------------------- fingerprint (exact) store


def test_fingerprint_store_merge_and_probe_semantics(spark):
    """The exact-dedup screen depends on the store MERGE: a copy of an
    updated doc matches only post-update content; a copy of a deleted
    doc finds nothing; near-copies never flag; canonical is the min
    surviving member."""
    from pyspark.sql import functions as F
    from hbase_increment_index_spark.pipeline.dedup import (
        build_fingerprint_store,
        exact_dups_from_index,
        merge_fingerprint_store,
    )

    v1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "old stale text"), (3, "doomed doc"),
         (4, "alpha beta")],
        "doc_id long, text string",
    )
    store = merge_fingerprint_store(
        build_fingerprint_store(v1, "doc_id", "text"),
        spark.createDataFrame([(2, "fresh new text")], "doc_id long, text string"),
        spark.createDataFrame([(3,)], "doc_id long"),
        "doc_id",
        "text",
    )
    incoming = spark.createDataFrame(
        [(100, "fresh new text"),   # matches 2 only AFTER the update
         (101, "old stale text"),   # pre-update content: must NOT flag
         (102, "doomed doc"),       # deleted: must NOT flag
         (103, "alpha beta"),       # dup group {1,4}: canonical = 1
         (104, "alpha beta gamma")],  # near-copy: must NOT flag
        "doc_id long, text string",
    )
    got = {
        (r["id_new"], r["canonical_id"])
        for r in exact_dups_from_index(store, incoming, "doc_id", "text").collect()
    }
    assert got == {(100, 2), (103, 1)}


def test_exp_moving_avg_recurrence_and_validation(spark):
    from hbase_increment_index_spark.search.streaming_expr import (
        StreamCompiler,
        StreamExprError,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"]
    )
    comp = StreamCompiler({"t": df})
    rows = comp.compile(
        'let(a=search(t, fl="k,v"), '
        'expMovingAvg(col(a, v), over="k", window="3"))'
    ).collect()
    # alpha = 0.5: y = [10, 15, 22.5]
    assert [(r["k"], r["ema"]) for r in rows] == [(1, 10.0), (2, 15.0), (3, 22.5)]
    with pytest.raises(StreamExprError):
        comp.compile(
            'let(a=search(t, fl="k,v"), '
            'expMovingAvg(col(a, v), over="k", window="0"))'
        )
