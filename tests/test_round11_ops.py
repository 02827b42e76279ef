"""Round-11 operators: the served approximate {!knn} (IVF probe → PQ
ADC → exact refine) and its recall evaluator, plus the r10 ADVICE
fixes (removeregex full-match lives in test_round10_ops/test_properties;
here: {!min_hash} empty-query rejection and the knnSearch/parallel
stream-op error contract)."""
from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ------------------------------------------------------ served {!knn} (IVF+PQ)


def _toy_embeddings(spark, n=60, dim=8, n_labels=3):
    """Deterministic clustered corpus: label l's vectors sit near the
    l-th axis corner, so IVF cells are geometrically meaningful."""
    rows = []
    for i in range(n):
        lab = i % n_labels
        base = [1.0 if (d % n_labels) == lab else 0.1 for d in range(dim)]
        # deterministic per-vector jitter, small enough to keep clusters apart
        vec = [round(b + ((i * 31 + d * 7) % 11 - 5) / 100.0, 6) for d, b in enumerate(base)]
        rows.append(Row(vec_id=i, embedding=vec, label=lab))
    return spark.createDataFrame(rows)


def test_served_knn_with_all_cells_probed_equals_exact(spark):
    """With every cell probed and a corpus-wide shortlist, the served
    path degenerates to the exact ranking — refine uses true cosines,
    so the approximation lives ONLY in the prune/shortlist dials."""
    from hbase_increment_index_spark.pipeline.similarity import (
        build_ivf_pq,
        knn_brute_force,
        knn_ivf_pq_serve,
    )

    emb = _toy_embeddings(spark)
    q = [1.0, 0.1, 0.1, 1.0, 0.1, 0.1, 1.0, 0.1]  # near label-0 corner
    cen, cb, cells, codes = build_ivf_pq(
        emb, dim=8, m=4, seed_ids=list(range(6))
    )
    served = knn_ivf_pq_serve(
        cen, cb, cells, codes, q, k=5, n_probe=3, shortlist=60, m=4
    ).collect()
    exact = knn_brute_force(emb, q, k=5).collect()
    assert [(r["vec_id"], r["score"]) for r in served] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_served_knn_probes_right_cluster(spark):
    """A query at a cluster corner must retrieve that cluster's
    members even with a single probed cell (1/3 of the corpus read)."""
    from hbase_increment_index_spark.pipeline.similarity import (
        build_ivf_pq,
        knn_ivf_pq_serve,
    )

    emb = _toy_embeddings(spark)
    q = [1.0, 0.1, 0.1, 1.0, 0.1, 0.1, 1.0, 0.1]
    cen, cb, cells, codes = build_ivf_pq(emb, dim=8, m=4, seed_ids=list(range(6)))
    out = knn_ivf_pq_serve(
        cen, cb, cells, codes, q, k=5, n_probe=1, shortlist=20, m=4
    ).collect()
    assert len(out) == 5
    assert all(r["vec_id"] % 3 == 0 for r in out)  # label-0 members


def test_served_knn_store_partition_prunes(spark, tmp_path):
    """Serving from the cid-partitioned store must read only the
    probed directories — PartitionFilters carries the cid IN list."""
    from hbase_increment_index_spark.pipeline.similarity import (
        build_ivf_pq,
        knn_ivf_pq_serve,
    )

    emb = _toy_embeddings(spark)
    cen, cb, cells, codes = build_ivf_pq(emb, dim=8, m=4, seed_ids=list(range(6)))
    d = str(tmp_path)
    cells.write.partitionBy("cid").parquet(f"{d}/cells")
    codes.write.partitionBy("cid").parquet(f"{d}/codes")
    q = [1.0, 0.1, 0.1, 1.0, 0.1, 0.1, 1.0, 0.1]
    out = knn_ivf_pq_serve(
        cen, cb,
        spark.read.parquet(f"{d}/cells"),
        spark.read.parquet(f"{d}/codes"),
        q, k=5, n_probe=2, shortlist=20, m=4,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln and "cid" in ln]
    assert len(pf) == 2 and all(" IN " in ln for ln in pf)
    assert "SortMergeJoin" not in plan
    assert out.count() == 5


def test_ivf_recall_bounds_and_full_probe_is_perfect(spark):
    from hbase_increment_index_spark.pipeline.similarity import ivf_recall

    emb = _toy_embeddings(spark)
    partial = ivf_recall(
        emb, F.col("vec_id") % 10 == 0, k=5, n_probe=1
    ).collect()
    assert partial and all(0.0 <= r["recall_at_k"] <= 1.0 for r in partial)
    full = ivf_recall(emb, F.col("vec_id") % 10 == 0, k=5, n_probe=3).collect()
    assert all(r["recall_at_k"] == 1.0 for r in full)  # every cell probed


def test_ivf_recall_query_panel_is_denominator(spark):
    """A query is counted even when its probed cells are sparse —
    the panel, not the candidate set, is the denominator."""
    from hbase_increment_index_spark.pipeline.similarity import ivf_recall

    emb = _toy_embeddings(spark, n=12)
    out = ivf_recall(emb, F.col("vec_id") < 4, k=5, n_probe=1).collect()
    assert sorted(r["q_id"] for r in out) == [0, 1, 2, 3]


# --------------------------------------------- {!min_hash} empty-query guard


def test_minhash_query_rejects_shingleless_text(spark):
    """ADVICE r10: a query shorter than the gram width must raise, not
    score sim_est=1.0 against every token-sparse document."""
    from hbase_increment_index_spark.pipeline.dedup import minhash_text_query

    docs = spark.createDataFrame(
        [(0, "spark joins hash tables fast"), (1, "xy")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="no 3-gram shingles"):
        minhash_text_query(docs, "doc_id", "text", "too short")


# ------------------------------------------- stream-op error contract (r10)


def _compiler(tables):
    from hbase_increment_index_spark.search.streaming_expr import StreamCompiler

    return StreamCompiler(tables)


def test_knnsearch_bad_topk_raises_stream_error(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    emb = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0])])
    comp = _compiler({"e": emb})
    with pytest.raises(StreamExprError, match="topK"):
        comp.compile('knnSearch(e, f="embedding", vec="[1.0, 0.0]", topK=ten)')


def test_knnsearch_bad_field_raises_stream_error(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    emb = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0])])
    comp = _compiler({"e": emb})
    with pytest.raises(StreamExprError, match="field name"):
        comp.compile('knnSearch(e, f="embedding x", vec="[1.0, 0.0]")')


def test_parallel_bad_workers_raises_stream_error(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    t = spark.createDataFrame([Row(a=1)])
    comp = _compiler({"t": t})
    with pytest.raises(StreamExprError, match="workers"):
        comp.compile('parallel(t, search(t, fl="a"), workers=two)')


# ----------------------------------------------------- LTR tree ensembles


def test_tree_score_expr_walks_like_python(spark):
    from hbase_increment_index_spark.search.ranking import (
        tree_score_expr,
        tree_score_sql,
    )

    tree = {
        "feature": "a", "threshold": 2.0,
        "left": {"feature": "b", "threshold": 0.5,
                 "left": {"value": 10.0}, "right": {"value": 20.0}},
        "right": {"value": 30.0},
    }

    def walk(a, b):
        if a <= 2.0:
            return 10.0 if b <= 0.5 else 20.0
        return 30.0

    rows = [(1.0, 0.0), (1.0, 1.0), (2.0, 0.5), (3.0, 9.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = [r["s"] for r in df.select(tree_score_expr(tree).alias("s")).collect()]
    assert got == [walk(a, b) for a, b in rows]
    # the SQL twin walks identically (threshold boundary included)
    import duckdb

    sql = tree_score_sql(tree)
    want = [
        duckdb.sql(f"SELECT {sql} AS s FROM (SELECT {a} AS a, {b} AS b)").fetchone()[0]
        for a, b in rows
    ]
    assert got == want


# ------------------------------------------------- [child] doc transformer


def test_child_transformer_keeps_childless_parents(spark):
    from hbase_increment_index_spark.search.join_parsers import child_doc_transformer

    parents = spark.createDataFrame(
        [(1, "m"), (2, "m"), (3, "x")], "pk long, tag string"
    )
    children = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 7.0), (1, 13, 1.0)],
        "fk long, cid long, v double",
    )
    out = child_doc_transformer(
        parents, children, "pk", "fk",
        F.col("tag") == "m",
        [F.col("v").desc(), F.col("cid").asc()],
        limit=2,
    ).collect()
    by_parent = {}
    for r in out:
        by_parent.setdefault(r["pk"], []).append(r)
    # parent 1: top-2 children by v desc; parent 2: kept, NULL child cols
    assert [r["cid"] for r in sorted(by_parent[1], key=lambda r: r["child_rank"])] == [11, 12]
    assert len(by_parent[2]) == 1 and by_parent[2][0]["cid"] is None
    assert 3 not in by_parent  # non-matching parent excluded


def test_child_transformer_child_filter(spark):
    from hbase_increment_index_spark.search.join_parsers import child_doc_transformer

    parents = spark.createDataFrame([(1, "m")], "pk long, tag string")
    children = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 50.0)], "fk long, cid long, v double"
    )
    out = child_doc_transformer(
        parents, children, "pk", "fk", F.col("tag") == "m",
        [F.col("v").desc()], child_filter=F.col("v") >= 40.0, limit=3,
    ).collect()
    assert [r["cid"] for r in out] == [11]


# ----------------------------------------------------- math-stream layer


def test_describe_matches_numpy(spark):
    import math

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    comp = _compiler({"t": df})
    out = comp.compile('let(a=search(t, fl="x"), describe(col(a, x)))').collect()
    assert len(out) == 1
    r = out[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    assert r["n"] == n and r["min"] == 1.0 and r["max"] == 9.0
    assert r["mean"] == round(mean, 6)
    assert abs(r["var"] - var) < 1e-6 and abs(r["stdev"] - math.sqrt(var)) < 1e-6


def test_regress_recovers_exact_line(spark):
    rows = [(float(x), 3.0 * x + 7.0) for x in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    comp = _compiler({"t": df})
    out = comp.compile(
        'let(a=search(t, fl="x,y"), regress(col(a, x), col(a, y)))'
    ).collect()[0]
    assert out["slope"] == 3.0 and out["intercept"] == 7.0 and out["r_squared"] == 1.0


def test_regress_rejects_mismatched_streams(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    comp = _compiler({"t": df, "u": df})
    with pytest.raises(StreamExprError, match="same stream"):
        comp.compile(
            'let(a=search(t, fl="x"), b=search(u, fl="y"), '
            'regress(col(a, x), col(b, y)))'
        )


def test_let_bindings_are_scoped(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    df = spark.createDataFrame([(1.0,)], "x double")
    comp = _compiler({"t": df})
    comp.compile('let(a=search(t, fl="x"), describe(col(a, x)))')
    with pytest.raises(StreamExprError, match="unknown stream variable"):
        comp.compile("describe(col(a, x))")  # 'a' must not leak out of the let


# --------------------------------------------------------- WKT polygon


def test_wkt_polygon_parse_and_membership(spark):
    from hbase_increment_index_spark.search.geo import (
        parse_wkt_polygon,
        polygon_intersects,
    )

    verts = parse_wkt_polygon("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert verts == [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, 5.0, -1.0), (4, 9.9, 9.9)],
        "id long, lat double, lon double",
    )
    got = sorted(
        r["id"]
        for r in pts.filter(
            polygon_intersects(F.col("lat"), F.col("lon"), verts)
        ).collect()
    )
    assert got == [1, 4]


def test_wkt_polygon_rejects_garbage(spark):
    from hbase_increment_index_spark.search.geo import parse_wkt_polygon

    with pytest.raises(ValueError, match="not a WKT POLYGON"):
        parse_wkt_polygon("LINESTRING(0 0, 1 1)")
    with pytest.raises(ValueError, match="at least 3"):
        parse_wkt_polygon("POLYGON((0 0, 1 1, 0 0))")


# ------------------------------------------------------- relatedness()


def test_relatedness_ubiquitous_term_scores_zero(spark):
    from hbase_increment_index_spark.search.ranking import skg_relatedness_terms

    docs = spark.createDataFrame(
        [(i, "de" if i < 4 else "en", "common special" if i < 4 else "common")
         for i in range(10)],
        "doc_id long, lang string, text string",
    )
    out = {
        r["term"]: r["relatedness"]
        for r in skg_relatedness_terms(
            docs, F.col("lang") == "de", "doc_id", "text", min_fg_df=1
        ).collect()
    }
    assert out["common"] == 0.0          # bg_pop = 1 → defined 0
    assert 0.0 < out["special"] <= 1.0   # fg-only term scores high


# -------------------------------------------- incremental cluster merge


def test_merge_cluster_labels_equals_rebuild(spark):
    """merge(stored, delta pairs) must equal CC over the union pair
    set — including the two hard cases: a delta doc BRIDGING two
    previously separate components, and a prior singleton pulled in."""
    from hbase_increment_index_spark.pipeline.dedup import (
        connected_components,
        merge_cluster_labels,
    )

    base_pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "id_a long, id_b long"
    )
    stored = connected_components(base_pairs)
    # delta doc 100 bridges both components; 200 links singleton 50
    new_pairs = spark.createDataFrame(
        [(100, 2), (100, 11), (200, 50)], "id_a long, id_b long"
    )
    merged = {
        (r["doc"], r["component"])
        for r in merge_cluster_labels(stored, new_pairs).collect()
    }
    rebuilt = {
        (r["doc"], r["component"])
        for r in connected_components(base_pairs.unionByName(new_pairs)).collect()
    }
    assert merged == rebuilt
    # bridged component takes the global min id (1)
    assert (11, 1) in merged and (100, 1) in merged and (200, 50) in merged


def test_merge_cluster_labels_untouched_components_pass_through(spark):
    from hbase_increment_index_spark.pipeline.dedup import (
        connected_components,
        merge_cluster_labels,
    )

    stored = connected_components(
        spark.createDataFrame([(1, 2), (7, 8)], "id_a long, id_b long")
    )
    new_pairs = spark.createDataFrame([(100, 1)], "id_a long, id_b long")
    merged = {
        (r["doc"], r["component"])
        for r in merge_cluster_labels(stored, new_pairs).collect()
    }
    assert (7, 7) in merged and (8, 7) in merged  # untouched


# ------------------------------------------------------------ metaphone


def test_metaphone_known_codes(spark):
    from hbase_increment_index_spark.search.phonetic import metaphone_code

    words = ["spark", "sparc", "knight", "night", "phone", "school",
             "ghost", "judge", "accept", "xavier", "science"]
    want = ["SPRK", "SPRK", "NT", "NT", "FN", "SKL",
            "KST", "JJ", "AKSPT", "SFR", "SSNS"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r["c"] for r in df.select(metaphone_code("w").alias("c")).collect()]
    assert got == want


def test_metaphone_spark_matches_duckdb_on_vocab(spark, sf_dir):
    """The Spark chain and the SQL twin must agree code-for-code over
    the real fixture vocabulary (the oracle's guarantee, asserted
    directly here)."""
    import duckdb

    from hbase_increment_index_spark.catalog import load_table
    from hbase_increment_index_spark.search.phonetic import (
        metaphone_code,
        metaphone_sql,
    )
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(tokens("text")).alias("term")).distinct()
    got = {
        r["term"]: r["c"]
        for r in vocab.select("term", metaphone_code("term").alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(
        con.execute(
            "SELECT DISTINCT term, " + metaphone_sql("term") + " FROM ("
            "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '')) AS term FROM documents)"
        ).fetchall()
    )
    assert got == want


def test_hist_bins_cover_range_and_count_everything(spark):
    vals = [float(v) for v in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    comp = _compiler({"t": df})
    out = comp.compile(
        'let(a=search(t, fl="x"), hist(col(a, x), bins=4))'
    ).collect()
    assert [r["bin"] for r in out] == [0, 1, 2, 3]
    assert sum(r["n"] for r in out) == 100
    # the max value closes the LAST bin (no bins overflow)
    assert out[-1]["max"] == 99.0 and out[0]["min"] == 0.0
    assert out[0]["bin_lo"] == 0.0 and out[-1]["bin_hi"] == 99.0


def test_hist_emits_empty_bins(spark):
    df = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    comp = _compiler({"t": df})
    out = comp.compile('let(a=search(t, fl="x"), hist(col(a, x), bins=5))').collect()
    assert [r["n"] for r in out] == [1, 0, 0, 0, 1]
    assert all(r["mean"] is None for r in out if r["n"] == 0)


def test_corr_perfect_line_is_one(spark):
    rows = [(float(x), 2.0 * x + 1.0) for x in range(8)]
    df = spark.createDataFrame(rows, "x double, y double")
    comp = _compiler({"t": df})
    out = comp.compile(
        'let(a=search(t, fl="x,y"), corr(col(a, x), col(a, y)))'
    ).collect()[0]
    assert out["corr"] == 1.0 and out["n"] == 8


def test_corr_anticorrelated_is_minus_one(spark):
    rows = [(float(x), -3.0 * x) for x in range(8)]
    df = spark.createDataFrame(rows, "x double, y double")
    comp = _compiler({"t": df})
    out = comp.compile(
        'let(a=search(t, fl="x,y"), corr(col(a, x), col(a, y)))'
    ).collect()[0]
    assert out["corr"] == -1.0


def test_served_knn_pre_filter_restricts_before_ranking(spark):
    """Solr 9.1 fq-as-pre-filter: excluded docs never enter the
    shortlist, and the full k is still returned from the allowed set
    (a post-filter would under-fill)."""
    from hbase_increment_index_spark.pipeline.similarity import (
        build_ivf_pq,
        knn_ivf_pq_serve,
    )

    emb = _toy_embeddings(spark)
    q = [1.0, 0.1, 0.1, 1.0, 0.1, 0.1, 1.0, 0.1]
    cen, cb, cells, codes = build_ivf_pq(
        emb, dim=8, m=4, seed_ids=list(range(6)), attr_cols=("label",)
    )
    out = knn_ivf_pq_serve(
        cen, cb, cells, codes, q, k=5, n_probe=3, shortlist=60, m=4,
        pre_filter=F.col("label") != 0,
    ).collect()
    assert len(out) == 5                      # full k from the allowed set
    assert all(r["vec_id"] % 3 != 0 for r in out)  # label-0 docs excluded


def test_ltr_feature_vectors_shape_and_reuse(spark, sf_dir):
    """The feature-logging frame is exactly what both rerank models
    consume: linear-model score recomputed from the logged features
    must equal ltr_rerank's output."""
    from hbase_increment_index_spark.catalog import load_table
    from hbase_increment_index_spark.search.ranking import (
        ltr_feature_vectors,
        ltr_rerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = {"original_score": 1.0, "log_doclen": -0.2, "is_en": 0.4, "is_web": 0.2}
    feats = {r["doc_id"]: r for r in ltr_feature_vectors(
        docs, "doc_id", "text", ["join", "query", "spark"], rerank_docs=50
    ).collect()}
    reranked = ltr_rerank(
        docs, "doc_id", "text", ["join", "query", "spark"], w,
        rerank_docs=50, k=10,
    ).collect()
    for r in reranked:
        f = feats[r["doc_id"]]
        want = round(
            w["original_score"] * f["original_score"]
            + w["log_doclen"] * f["log_doclen"]
            + w["is_en"] * f["is_en"]
            + w["is_web"] * f["is_web"],
            6,
        )
        assert r["ltr_score"] == want


def test_percentile_matches_numpy_interpolation(spark):
    import numpy as np

    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    comp = _compiler({"t": df})
    out = comp.compile(
        'let(a=search(t, fl="x"), percentile(col(a, x), 90))'
    ).collect()[0]
    assert out["value"] == round(float(np.percentile(vals, 90)), 6)
    assert out["p"] == 90.0


def test_percentile_rejects_out_of_range(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    df = spark.createDataFrame([(1.0,)], "x double")
    comp = _compiler({"t": df})
    with pytest.raises(StreamExprError, match="0, 100"):
        comp.compile('let(a=search(t, fl="x"), percentile(col(a, x), 150))')


def test_ann_index_maintenance_merge_equals_rebuild(spark):
    """Fold one insert/update/delete batch into the served index
    frames and compare against a fresh encode of the final corpus
    under the SAME base-built structure (fixed centroids/codebooks)."""
    from hbase_increment_index_spark.pipeline.similarity import (
        assign_cells,
        build_ivf_pq,
        label_cell_centroids,
        pq_codebooks,
        pq_encode,
    )

    emb = _toy_embeddings(spark, n=30)
    m = F.col("vec_id") % 5
    base = emb.filter(m != 0)
    cents = label_cell_centroids(base)
    cbs = pq_codebooks(base, dim=8, m=4, seed_ids=[1, 2, 3, 4])

    def index_rows(df):
        return pq_encode(df, cbs, dim=8, m=4).join(assign_cells(df, cents), "vec_id")

    updates = emb.filter(m == 3).withColumn("embedding", F.reverse("embedding"))
    inserts = emb.filter(m == 0)
    touched = emb.filter(m.isin(3, 4)).select("vec_id")
    merged = index_rows(base).join(
        F.broadcast(touched), "vec_id", "left_anti"
    ).unionByName(index_rows(inserts.unionByName(updates)))

    final = emb.filter(m != 4).withColumn(
        "embedding",
        F.when(m == 3, F.reverse("embedding")).otherwise(F.col("embedding")),
    )
    rebuilt = index_rows(final)
    key = lambda r: (r["vec_id"], r["s"])
    got = {key(r): (r["code"], r["cid"]) for r in merged.collect()}
    want = {key(r): (r["code"], r["cid"]) for r in rebuilt.collect()}
    assert got == want


def test_features_selection_perfect_predictor_ranks_first(spark):
    """A term present in exactly the positive class has maximal IG."""
    docs = spark.createDataFrame(
        [(i, "de" if i < 5 else "en",
          ("marker noise" if i < 5 else "noise filler"))
         for i in range(10)],
        "doc_id long, lang string, text string",
    )
    comp = _compiler({"documents": docs})
    out = comp.compile(
        'featuresSelection(documents, field="text", outcome="lang:de", numTerms=3)'
    ).collect()
    byterm = {r["term"]: r["ig"] for r in out}
    # 'marker' (present in exactly the positive class) and 'filler'
    # (exactly the negative class) are BOTH perfect predictors:
    # IG = H(C) = 1 bit for the 5/5 split
    assert byterm["marker"] == 1.0 and byterm["filler"] == 1.0
    # a term in every document carries zero information
    assert byterm.get("noise", 0.0) == 0.0


def test_signature_dedup_keeps_latest_add(spark):
    """overwriteDupes semantics: the LAST added doc per signature
    survives — the opposite of e1's min-id canonical."""
    from hbase_increment_index_spark.queries import QUERIES

    out = {r["doc_id"]: r["n_overwritten"]
           for r in QUERIES["q83_signature_dedup"](spark, "/root/testdata/sf0.001").collect()}
    # every 3rd doc was re-added with id+2e6: the re-add must win
    assert all(k >= 2_000_000 or k % 3 != 0 for k in out)
    assert any(v == 1 for v in out.values())


def test_train_logreg_learns_a_perfect_predictor(spark):
    """On a separable toy corpus the marker term's weight grows
    positive and error falls monotonically across iterations."""
    docs = spark.createDataFrame(
        [(i, "de" if i < 6 else "en",
          ("marker text" if i < 6 else "text only"))
         for i in range(12)],
        "doc_id long, lang string, text string",
    )
    comp = _compiler({"documents": docs})
    out = comp.compile(
        'train(documents, field="text", outcome="lang:de", '
        'terms="marker,text", maxIterations=5)'
    ).collect()
    assert [r["iteration"] for r in out] == [1, 2, 3, 4, 5]
    errs = [r["error"] for r in out]
    assert all(a >= b for a, b in zip(errs, errs[1:]))  # monotone descent
    assert out[-1]["w_marker"] > 0.0            # positive-class feature
    assert out[-1]["w_marker"] > out[-1]["w_text"]


def test_train_logreg_rejects_empty_terms(spark):
    from hbase_increment_index_spark.search.streaming_expr import StreamExprError

    docs = spark.createDataFrame([(0, "en", "t")], "doc_id long, lang string, text string")
    comp = _compiler({"documents": docs})
    with pytest.raises(StreamExprError, match="terms"):
        comp.compile('train(documents, field="text", outcome="lang:de", terms="", maxIterations=2)')
