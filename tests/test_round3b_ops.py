"""Unit tests for the late-round-3 operators: SemDeDup, fuzzy
decontamination, phonetic search, LTR rerank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------- phonetic


@pytest.mark.parametrize(
    ("word", "code"),
    [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Tymczak", "T522"),  # NARA example (CZ collapse via run-collapse)
        ("Pfister", "P236"),  # NARA modern coding (PF run collapses)
        ("Ashcraft", "A226"),  # H/W-as-vowel variant (classic NARA: A261)
        ("spark", "S162"),
        ("sparc", "S162"),
        ("a", "A000"),
        ("", ""),
        ("123", ""),
    ],
)
def test_soundex_code(spark, word, code):
    from hbase_increment_index_spark.search.phonetic import soundex_code

    got = spark.range(1).select(soundex_code(F.lit(word)).alias("c")).first()["c"]
    assert got == code, (word, got, code)


def test_soundex_sql_matches_spark(spark):
    """The DuckDB SQL fragment reproduces the Spark expression on the
    whole document vocabulary."""
    import duckdb

    from hbase_increment_index_spark.search.phonetic import soundex_code, soundex_sql
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .distinct()
        .select("t", soundex_code(F.col("t")).alias("code"))
    )
    pdf = vocab.toPandas().sort_values("t").reset_index(drop=True)
    con = duckdb.connect()
    con.register("v", pdf[["t"]])
    want = con.execute(
        f"SELECT t, {soundex_sql('t')} AS code FROM v ORDER BY t"
    ).df()
    assert list(pdf["code"]) == list(want["code"])


def test_phonetic_search_matches_token_scan(spark):
    from hbase_increment_index_spark.search.phonetic import phonetic_search, soundex_code
    from hbase_increment_index_spark.search.tokenize import tokens

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r.doc_id for r in phonetic_search(docs, "doc_id", "text", "sparc").collect()}
    # reference: docs with any token of equal soundex, computed via explode
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    code = spark.range(1).select(soundex_code(F.lit("sparc")).alias("c")).first()["c"]
    want = {
        r.doc_id
        for r in toks.withColumn("c", soundex_code(F.col("t")))
        .filter(F.col("c") == code)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got == want and got  # non-empty at sf0.001


# --------------------------------------------------------- SemDeDup


def test_semantic_dedup_pairs_and_canonical(spark):
    from hbase_increment_index_spark.pipeline.dedup import semantic_dedup, semantic_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = semantic_pairs(emb, threshold=0.40, n_planes=4, dim=64, plane_fn="md5")
    rows = pairs.collect()
    # pairs are ordered, above threshold, and bucket-consistent
    for r in rows:
        assert r.id_a < r.id_b and r.cos >= 0.40

    marks = semantic_dedup(emb, threshold=0.40, n_planes=4, dim=64, plane_fn="md5")
    assert marks.count() == emb.count()
    # every pair member belongs to a component; canonical = min id
    comp = {r.vec_id: r.component for r in marks.collect() if r.component is not None}
    for r in rows:
        assert comp[r.id_a] == comp[r.id_b] <= r.id_a
    canon = {r.vec_id for r in marks.filter(F.col("is_canonical")).collect()}
    noncanon = {r.vec_id for r in marks.filter(~F.col("is_canonical")).collect()}
    assert canon | noncanon == {r.vec_id for r in emb.select("vec_id").collect()}
    # each component keeps exactly one canonical member
    import collections

    by_comp = collections.defaultdict(list)
    for r in marks.collect():
        if r.component is not None:
            by_comp[r.component].append(r)
    for members in by_comp.values():
        assert sum(1 for m in members if m.is_canonical) == 1


def test_semantic_dedup_fewer_buckets_finds_superset(spark):
    """Recall monotonicity: fewer planes → bigger buckets → at least
    as many candidate pairs."""
    from hbase_increment_index_spark.pipeline.dedup import semantic_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    few = semantic_pairs(emb, threshold=0.40, n_planes=2, dim=64, plane_fn="md5")
    many = semantic_pairs(emb, threshold=0.40, n_planes=6, dim=64, plane_fn="md5")
    few_set = {(r.id_a, r.id_b) for r in few.collect()}
    many_set = {(r.id_a, r.id_b) for r in many.collect()}
    assert many_set <= few_set


# ------------------------------------------------- fuzzy decontamination


def test_fuzzy_decontaminate_flags_planted_near_dup(spark):
    from hbase_increment_index_spark.pipeline.dedup import incremental_near_dups

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    base = docs.first()
    # plant an eval doc that is a lightly-edited copy of doc 0
    edited = " ".join(base.text.split()[:-2] + ["zzz"])
    eval_df = spark.createDataFrame([(100001, edited)], ["doc_id", "text"])
    pairs = incremental_near_dups(
        existing=eval_df, incoming=docs.select("doc_id", "text"),
        id_col="doc_id", text_col="text", n=3, threshold=0.3,
    )
    hits = {(r.id_new, r.id_old) for r in pairs.collect()}
    assert (base.doc_id, 100001) in hits


# --------------------------------------------------------- LTR


def test_ltr_rerank_weights_change_order(spark):
    from hbase_increment_index_spark.search import ranking

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    terms = ["join", "query", "spark"]
    bm25_only = ranking.ltr_rerank(
        docs, "doc_id", "text", terms,
        weights={"original_score": 1.0}, rerank_docs=30, k=30,
    )
    rows = bm25_only.collect()
    # with only the original-score feature, ltr ordering == bm25 ordering
    assert [r.ltr_score for r in rows] == [r.original_score for r in rows]

    shifted = ranking.ltr_rerank(
        docs, "doc_id", "text", terms,
        weights={"original_score": 1.0, "log_doclen": -5.0}, rerank_docs=30, k=30,
    ).collect()
    assert {r.doc_id for r in shifted} == {r.doc_id for r in rows}  # same head
    assert [r.doc_id for r in shifted] != [r.doc_id for r in rows]  # re-ordered


def test_ltr_rerank_is_head_bounded(spark):
    from hbase_increment_index_spark.search import ranking

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ranking.ltr_rerank(
        docs, "doc_id", "text", ["join"], weights={"original_score": 1.0},
        rerank_docs=5, k=10,
    )
    assert out.count() <= 5  # never widens past the head


# --------------------------------------------------------- analysis chain


@pytest.mark.parametrize(
    ("word", "stemmed"),
    [
        ("queries", "query"),
        ("caches", "cache"),  # es-rule changes 'es' to 'e' (Harman rule 2)
        ("windows", "window"),
        ("glass", "glass"),   # ss guard
        ("virus", "virus"),   # us guard
        ("toes", "toes"),     # oes guard
        ("trees", "trees"),   # ees guard
        ("spark", "spark"),
    ],
)
def test_s_stemmer(spark, word, stemmed):
    from hbase_increment_index_spark.search.analysis import stem

    got = spark.range(1).select(stem(F.lit(word)).alias("s")).first()["s"]
    assert got == stemmed, (word, got, stemmed)


def test_analyzed_tokens_drop_stopwords(spark):
    from hbase_increment_index_spark.search.analysis import analyzed_tokens

    row = (
        spark.range(1)
        .select(analyzed_tokens(F.lit("The queries of the windows are fast")).alias("t"))
        .first()
    )
    assert row["t"] == ["query", "window", "fast"]


def test_analyzed_vocabulary_matches_sql(spark):
    import duckdb

    from hbase_increment_index_spark.queries import QUERIES, ORACLES

    got = QUERIES["q64_analyzed_vocab"](spark, SF).toPandas()
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.execute(ORACLES["q64_analyzed_vocab"]).df()
    assert list(got["term"]) == list(want["term"])
    assert list(got["docfreq"]) == list(want["docfreq"])


# --------------------------------------------------------- DSIR


def test_dsir_prefers_target_like_docs(spark):
    """A corpus doc that is a copy of a target doc must outscore every
    unrelated corpus doc (its features are exactly the target model's)."""
    from hbase_increment_index_spark.pipeline.classify import dsir_importance

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    plant_text = target.first().text
    corpus = (
        docs.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", "text")
        .unionByName(spark.createDataFrame([(999999, plant_text)], ["doc_id", "text"]))
    )
    scores = dsir_importance(corpus, target, "doc_id", "text", n_buckets=128)
    ranked = [r.doc_id for r in scores.orderBy(F.col("dsir_logratio").desc()).collect()]
    # the copy shares every hashed feature with a target doc — it must
    # land in the extreme top tail (other docs can leapfrog it only by
    # being longer in target-heavy buckets)
    assert 999999 in ranked[: max(5, len(ranked) // 100)]


def test_dsir_partition_invariance(spark):
    """Exact-decimal sums: the score is identical at any parallelism."""
    from hbase_increment_index_spark.pipeline.classify import dsir_importance

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    a = dsir_importance(corpus, target, "doc_id", "text").toPandas()
    b = dsir_importance(
        corpus.repartition(3), target.repartition(5), "doc_id", "text"
    ).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert list(a["dsir_logratio"]) == list(b["dsir_logratio"])


# ------------------------------------------------- IVF upsert (e3k)


def test_centroid_assign_matches_bruteforce_argmax(spark):
    """Assignment = argmax cosine over the centroid set, verified
    against a numpy brute-force on the collected (small) frames."""
    import numpy as np

    from hbase_increment_index_spark.pipeline.similarity import (
        centroid_assign,
        label_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    existing = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    cents_df = label_centroids(existing)
    got = {r.vec_id: r.label for r in centroid_assign(delta, cents_df).collect()}
    assert len(got) == delta.count()

    cents = {}
    for r in cents_df.collect():
        cents.setdefault(r.label, {})[r.pos] = r.mean_v
    cmat = {
        lab: np.array([d[p] for p in sorted(d)], dtype=np.float64)
        for lab, d in cents.items()
    }
    for r in delta.collect():
        v = np.array(r.embedding, dtype=np.float64)
        best = max(
            sorted(cmat),  # ascending label = deterministic tie-break
            key=lambda lab: round(
                float(v @ cmat[lab]) / (np.linalg.norm(v) * np.linalg.norm(cmat[lab])), 6
            ),
        )
        assert got[r.vec_id] == best, r.vec_id


def test_centroid_assign_partition_invariance(spark):
    from hbase_increment_index_spark.pipeline.similarity import (
        centroid_assign,
        label_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = label_centroids(emb.filter(F.col("vec_id") % 10 != 0))
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    a = centroid_assign(delta, cents).toPandas().sort_values("vec_id")
    b = centroid_assign(delta.repartition(7), cents).toPandas().sort_values("vec_id")
    assert list(a["label"]) == list(b["label"])
    assert list(a["cos"]) == list(b["cos"])


# ------------------------------------------------- bigram backoff LM


def test_bigram_backoff_seen_vs_unseen(spark):
    """A doc made of LM-frequent bigrams scores lower NLL than one made
    of never-seen tokens (pure backoff with unseen unigrams)."""
    from hbase_increment_index_spark.pipeline.text import bigram_logprob_backoff

    lm = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(10)], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "zzz qqq www yyy")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.nll for r in bigram_logprob_backoff(score, lm, "doc_id", "text").collect()}
    assert out[100] < out[101]


def test_bigram_backoff_counts(spark):
    from hbase_increment_index_spark.pipeline.text import bigram_logprob_backoff

    lm = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    score = spark.createDataFrame([(2, "a b c d")], ["doc_id", "text"])
    row = bigram_logprob_backoff(score, lm, "doc_id", "text").first()
    assert row.n_bigrams == 3  # "a b", "b c", "c d"


# ------------------------------------------------- function-query parser


def test_function_query_parser_arithmetic(spark):
    from hbase_increment_index_spark.search.function_query import parse_function_query

    df = spark.createDataFrame([(4.0, 2.0)], ["x", "y"])
    cases = {
        "sum(x, y, 1)": 7.0,
        "sub(x, y)": 2.0,
        "product(x, y)": 8.0,
        "div(x, y)": 2.0,
        "min(x, y)": 2.0,
        "max(x, y, 5)": 5.0,
        "abs(sub(y, x))": 2.0,
        "log(100)": 2.0,         # Solr log = base 10
        "sqrt(x)": 2.0,
        "pow(y, 3)": 8.0,
        "recip(x, 1, 10, 6)": 1.0,   # 10/(1*4+6)
        "if(exists(x), y, 0)": 2.0,
        "map(x, 3, 5, 0)": 0.0,      # in range -> target
        "map(y, 3, 5, 0)": 2.0,      # out of range -> unchanged
    }
    row = df.select(
        *[parse_function_query(t).cast("double").alias(f"c{i}") for i, t in enumerate(cases)]
    ).first()
    for i, (text, want) in enumerate(cases.items()):
        assert row[f"c{i}"] == want, text


def test_function_query_parser_errors(spark):
    import pytest as _pytest

    from hbase_increment_index_spark.search.function_query import (
        FunctionQueryError,
        parse_function_query,
    )

    for bad in ["nosuch(1)", "sum(1", "sum(1) extra", "sub(1)"]:
        with _pytest.raises(FunctionQueryError):
            parse_function_query(bad)


def test_semantic_dedup_auto_scales_planes(spark):
    """Auto mode picks more planes for bigger corpora (constant
    expected bucket size) and produces valid canonical marks."""
    from hbase_increment_index_spark.pipeline.dedup import semantic_dedup_auto

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    marks = semantic_dedup_auto(emb, target_bucket_size=64, plane_fn="md5", dim=64)
    assert marks.count() == emb.count()
    # 500 vectors / 64-target -> ceil(log2(7.8)) = 3 planes = 8 buckets;
    # just assert the invariant that every row is marked
    assert marks.filter(F.col("is_canonical").isNull()).count() == 0


# ------------------------------------------------- JSON query DSL


def test_json_dsl_bool_semantics(spark):
    from hbase_increment_index_spark.search.json_dsl import JsonDslError, parse_json_query

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 15), (3, "a", 25)], ["id", "k", "v"]
    )
    # should with no must = at least one matches
    q = {"bool": {"should": [{"field": {"f": "k", "query": "a"}},
                             {"range": {"f": "v", "lower": 20}}]}}
    assert {r.id for r in df.filter(parse_json_query(q)).collect()} == {1, 3}
    # must + must_not
    q2 = {"bool": {"must": [{"range": {"f": "v", "lower": 10}}],
                   "must_not": [{"field": {"f": "k", "query": "a"}}]}}
    assert {r.id for r in df.filter(parse_json_query(q2)).collect()} == {2}
    # exclusive range bound
    q3 = {"range": {"f": "v", "lower": 5, "include_lower": False}}
    assert {r.id for r in df.filter(parse_json_query(q3)).collect()} == {2, 3}
    import pytest as _pytest

    for bad in [{"bool": {}}, {"nosuch": {}}, {"range": {"f": "v"}}, 42]:
        with _pytest.raises(JsonDslError):
            parse_json_query(bad)


def test_json_select_paging_projection(spark):
    from hbase_increment_index_spark.search.json_dsl import json_select

    df = spark.createDataFrame([(i, i * 10) for i in range(20)], ["id", "v"])
    out = json_select(
        df, {"sort": "v desc", "offset": 3, "limit": 4, "fields": "id"}
    ).collect()
    assert [r.id for r in out] == [16, 15, 14, 13]  # projection after paging


def test_incremental_semantic_dups_bipartite(spark):
    """Delta-vs-index semantic dedup: pairs are strictly new x old,
    above threshold, and a subset of the full-corpus pair set."""
    from hbase_increment_index_spark.pipeline.dedup import (
        incremental_semantic_dups,
        semantic_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    existing = emb.filter(F.col("vec_id") % 10 != 0)
    incoming = emb.filter(F.col("vec_id") % 10 == 0)
    inc = incremental_semantic_dups(
        existing, incoming, threshold=0.40, n_planes=4, dim=64, plane_fn="md5"
    ).collect()
    for r in inc:
        assert r.id_new % 10 == 0 and r.id_old % 10 != 0 and r.cos >= 0.40
    full = {
        frozenset((r.id_a, r.id_b))
        for r in semantic_pairs(emb, threshold=0.40, n_planes=4, dim=64, plane_fn="md5").collect()
    }
    assert {frozenset((r.id_new, r.id_old)) for r in inc} <= full


def test_leakage_safe_split_no_straddling_clusters(spark):
    """Every near-dup cluster lands wholly in one split."""
    from hbase_increment_index_spark.pipeline.dedup import near_dup_clusters
    from hbase_increment_index_spark.pipeline.sampling import train_val_split

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant a duplicate pair so clusters exist
    extra = docs.limit(1).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(extra)
    marks = near_dup_clusters(
        corpus, "doc_id", "text", threshold=0.30, num_perm=64, bands=16,
        impl="pandas", hash_fn="md5",
    )
    grouped = marks.select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("gk")
    )
    split = train_val_split(grouped, "gk", val_frac=0.3, test_frac=0.3)
    straddle = (
        split.groupBy("gk")
        .agg(F.countDistinct("split").alias("ns"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("ns") > 1))
        .count()
    )
    assert straddle == 0
    # and at least one real multi-member cluster exercised the invariant
    assert split.groupBy("gk").count().filter(F.col("count") > 1).count() >= 1


def test_json_domain_shared_with_select(spark):
    """json_select's pre-paging domain IS json_domain — the facade's
    facet domain can never drift from the returned docs."""
    from hbase_increment_index_spark.search.json_dsl import json_domain, json_select

    df = spark.read.parquet(f"{SF}/documents.parquet")
    request = {
        "query": {"range": {"f": "n_chars", "lower": 100}},
        "filter": [{"prefix": {"f": "source", "query": "src1"}}],
    }
    dom = json_domain(df, request)
    sel = json_select(df, request)  # no paging -> same row set
    assert dom.count() == sel.count()
    assert {r.doc_id for r in dom.collect()} == {r.doc_id for r in sel.collect()}


# ------------------------------------------------- wrap-up invariants


def test_dup_rate_by_source_invariants(spark):
    from hbase_increment_index_spark.queries import QUERIES

    out = QUERIES["e1e_dup_rate_by_source"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in out) == docs.count()
    for r in out:
        assert 0.0 <= r.dup_rate <= 1.0 and r.n_in_clusters <= r.n_docs


def test_collapse_by_signature_unique_sigs(spark):
    from hbase_increment_index_spark.queries import QUERIES

    rows = QUERIES["q40b_collapse_by_signature"](spark, SF).collect()
    sigs = [r.sig for r in rows]
    assert len(sigs) == len(set(sigs))  # one representative per signature
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_scan_agg_median_ordering(spark):
    from hbase_increment_index_spark.queries import QUERIES

    row = QUERIES["cdc_scan_agg_median"](spark, SF).first()
    assert row.p25 <= row.median <= row.p75


def test_ltr_null_field_values_score_default(spark):
    """ADVICE r3: NULL lang/source must degrade the feature to 0.0,
    not null the whole model score."""
    from hbase_increment_index_spark.search import ranking

    docs = spark.createDataFrame(
        [
            (1, "spark join query spark", None, None),
            (2, "spark join query", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = ranking.ltr_rerank(
        docs, "doc_id", "text", ["spark"],
        weights={"original_score": 1.0, "is_en": 0.5, "is_web": 0.5},
        k=2, rerank_docs=2,
    ).collect()
    scores = {r["doc_id"]: r["ltr_score"] for r in out}
    assert scores[1] is not None  # NULL fields must not null the score
    assert len(scores) == 2
