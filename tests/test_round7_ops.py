"""Round-7 hardening tests.

Covers the ADVICE r5 fixes with targeted regression evidence:
- E5D oracle byte-parity on NON-ASCII corpora (the fixture docs are
  ASCII, so the driver's green row alone could not catch a
  char-vs-byte divergence);
- dim_truncation_recall degenerate panels (zero-candidate queries);
- connected_components cache hygiene (no unbounded persist growth);
- LSH band-join skew guard (bounded per-bucket pair counts on an
  adversarial duplicate cluster, with recall preserved).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, texts):
    docs = spark.createDataFrame(
        [
            (i + 1, t, "xx", "src", len(t))
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_e5d_oracle_byte_parity_non_ascii(spark, tmp_path):
    """The aHash oracle must walk UTF-8 BYTES exactly as the decoder
    does — on multi-byte codepoints a char-based ord() oracle diverges
    (ADVICE r5 finding 2). Run both engines over a deliberately
    non-ASCII corpus, including texts shorter than 8 bytes and an
    empty text, and require identical (ahash -> cluster) results."""
    from hbase_increment_index_spark.queries import E5D_SQL, e5d_perceptual_hash

    texts = [
        "héllo wörld — ünïcode",
        "日本語のテキストです",
        "emoji 🙂🙂 payload",
        "plain ascii text body",
        "plain ascii text body",  # exact dup: must share an ahash
        "é",                       # 2 utf-8 bytes < 8 lanes
        "",                        # empty payload: all-zero lanes
        "ß" * 40,                  # repeated 2-byte codepoint
    ]
    sf_dir = _write_docs(spark, tmp_path, texts)

    got = [
        (r["ahash"], r["n_images"], r["min_media_id"], r["max_media_id"])
        for r in e5d_perceptual_hash(spark, sf_dir).collect()
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet/*.parquet')"
    )
    want = [tuple(t) for t in con.execute(E5D_SQL).fetchall()]
    assert sorted(got) == sorted(want)
    # and the exact-dup pair really collapsed into one cluster
    assert any(n == 2 for _, n, _, _ in got)


def test_dim_truncation_recall_zero_candidate_query(spark):
    """A query vector with no candidates must still count in n_queries
    and contribute 0 hits — not drop out of the denominator and NULL
    the totals (ADVICE r5 finding 3). Build a 1-vector corpus where
    the only query row IS the corpus row, so after the self-exclusion
    filter the query has zero scored candidates."""
    from hbase_increment_index_spark.pipeline.similarity import dim_truncation_recall

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["dims"]: (r["n_queries"], r["total_hits"])
        for r in dim_truncation_recall(
            emb, F.col("vec_id") == 1, dims=[2], k=3
        ).collect()
    }
    assert rows[2] == (1, 0)  # one query, zero hits — not (0, NULL)


def test_dim_truncation_recall_mixed_panel(spark):
    """Panel with one normal query and one zero-candidate query: the
    denominator counts both, hits come only from the live one."""
    from hbase_increment_index_spark.pipeline.similarity import dim_truncation_recall

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.8, 0.2, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # queries: vec 1 (two candidates) and a filter that matches only it
    # plus an isolated id-space twin — simulate by running two panels
    full = dim_truncation_recall(emb, F.col("vec_id") <= 3, dims=[4], k=2).collect()
    (r,) = full
    # dims=4 == full dims: truncated ranking equals full ranking, so
    # every query's top-2 intersects itself completely
    assert r["n_queries"] == 3
    assert r["total_hits"] == 3 * 2
    assert r["mean_recall"] == 1.0


def test_connected_components_cache_hygiene(spark):
    """The label-propagation loop must not accumulate cached frames
    across iterations (ADVICE r5 finding 4): after the loop, at most
    the edge checkpoint, the final round's frame, and any
    localCheckpoint survivors may remain — prior rounds' persists must
    be gone. Chain graph forces multiple propagation rounds."""
    from hbase_increment_index_spark.pipeline.dedup import connected_components

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    # a 12-node chain: min-label propagation needs ~11 rounds with
    # checkpoint_interval 5, so both persist() and localCheckpoint()
    # arms execute several times
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, 12)],
        "id_a long, id_b long, jaccard double",
    )
    comp = connected_components(pairs, driver_threshold=0, checkpoint_interval=5)
    rows = {r["doc"]: r["component"] for r in comp.collect()}
    assert set(rows.values()) == {1} and len(rows) == 12
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    # edges checkpoint + final stepped + <= 2 mid-loop localCheckpoints
    # (rounds 5 and 10) — the old behavior left one frame PER ROUND
    assert after - before <= 4, f"cached RDDs grew by {after - before}"


def test_lsh_skew_guard_bounds_hot_bucket(spark):
    """Adversarial corpus: one mass-duplicate cluster. Every band
    bucket contains the whole cluster, so the unguarded join is
    C(n,2)-quadratic; the guard must bound candidates at
    C(cap,2) + (n - cap) per bucket while keeping the cluster fully
    connected through the representative star (r5 task 4)."""
    from hbase_increment_index_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    n, cap = 200, 8
    dup_text = "the same boilerplate paragraph repeated across the crawl corpus"
    rows = [(i, dup_text) for i in range(1, n + 1)] + [
        (n + 1, "a genuinely unique document about spark shuffles"),
        (n + 2, "another unique document about parquet pruning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket_docs=cap
    )
    n_pairs = pairs.count()
    # identical signatures => identical buckets in every band => the
    # distinct candidate set is exactly one bucket's worth
    bound = cap * (cap - 1) // 2 + (n - cap)
    assert n_pairs <= bound, f"{n_pairs} pairs > bound {bound}"
    assert n_pairs < n * (n - 1) // 2 / 10  # nowhere near quadratic

    # recall: the whole cluster still collapses to ONE canonical doc
    clusters = near_dup_clusters(
        df, "doc_id", "text", threshold=0.5, max_bucket_docs=cap
    )
    canon = clusters.filter(F.col("is_canonical")).count()
    assert canon == 3  # 1 for the 200-dup cluster + 2 uniques


def test_lsh_skew_guard_no_trigger_parity(spark):
    """On a corpus with no hot bucket the guarded join must emit
    exactly the same verified pairs as the unguarded one — the guard
    only reshapes buckets past the cap."""
    from hbase_increment_index_spark.pipeline.dedup import minhash_lsh_pairs

    rows = [
        (1, "spark shuffles partition data across the cluster nodes"),
        (2, "spark shuffles partition data across the cluster racks"),
        (3, "parquet files store columns with pushdown friendly stats"),
        (4, "parquet files store columns with pushdown friendly stats"),
        (5, "a completely different document about inverted indexes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.3, max_bucket_docs=256
        ).collect()
    }
    unguarded = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.3, max_bucket_docs=None
        ).collect()
    }
    assert guarded == unguarded and (3, 4, 1.0) in guarded


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cells = st.lists(
    st.tuples(
        st.sampled_from(["put", "put", "put", "delete"]),  # puts dominate
        st.integers(min_value=0, max_value=5),             # row key
        st.sampled_from(["a", "b"]),                       # qualifier
        st.integers(min_value=0, max_value=99),            # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_cells)
def test_delete_by_query_equals_filtered_rebuild(spark, rows):
    """DBQ ∘ merge ≡ filter ∘ rebuild (r5 task 3): tombstoning every
    doc matching a predicate through the facade's mutation path must
    serve exactly the documents a one-shot rebuild minus a plain
    filter would — on ANY mutation history, including out-of-order
    updates and pre-existing row deletes."""
    import datetime as dt

    from hbase_increment_index_spark.api import SecondaryIndex

    base = dt.datetime(2024, 1, 1)
    log = spark.createDataFrame(
        [
            (
                op,
                f"r{row}",
                "cf",
                qual,
                None if op == "delete" else str(val),
                base + dt.timedelta(seconds=(i * 7) % len(rows)),  # out of order
                i,
            )
            for i, (op, row, qual, val) in enumerate(rows)
        ],
        "op string, row_key string, family string, qualifier string, "
        "value string, ts timestamp, seq long",
    )
    idx = SecondaryIndex(spark, families=["cf"], qualifiers=["a", "b"], key_field="id")
    idx.apply_mutations(log)
    pred = F.col("a").cast("double") >= 50.0
    survivors_by_filter = {
        tuple(r)
        for r in idx.documents.filter(~F.coalesce(pred, F.lit(False))).collect()
    }
    idx.delete_by_query(pred)
    survivors_by_dbq = {tuple(r) for r in idx.documents.collect()}
    assert survivors_by_dbq == survivors_by_filter


def test_bm25_served_with_side_tables_matches_derived(spark, sf_dir):
    """The build-time (doc_len, stats) side tables must serve the
    exact same ranking as deriving both from the postings at query
    time — the bench's q06c_bm25_servedidx leg depends on it."""
    from hbase_increment_index_spark.catalog import load_table
    from hbase_increment_index_spark.search import ranking
    from hbase_increment_index_spark.search.inverted import build_inverted_index

    docs = load_table(spark, sf_dir, "documents")
    postings = build_inverted_index(docs, "doc_id", "text")
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    terms = ["join", "query", "spark"]
    derived = [
        tuple(r)
        for r in ranking.bm25_topk_from_index(postings, "doc_id", terms).collect()
    ]
    served = [
        tuple(r)
        for r in ranking.bm25_topk_from_index(
            postings, "doc_id", terms, doc_len=dl, stats=st
        ).collect()
    ]
    assert served == derived and len(served) == 10


def test_materialize_state_roundtrip(spark):
    """materialize_state pins the compacted state without changing any
    serving-view semantics (and is a no-op before the first batch)."""
    import datetime as dt

    from hbase_increment_index_spark.api import SecondaryIndex

    idx = SecondaryIndex(spark, families=["cf"], qualifiers=["a"], key_field="id")
    assert idx.materialize_state() is idx  # empty: no-op, chains
    base = dt.datetime(2024, 1, 1)
    log = spark.createDataFrame(
        [("put", "r1", "cf", "a", "1", base, 1), ("put", "r2", "cf", "a", "2", base, 2)],
        "op string, row_key string, family string, qualifier string, "
        "value string, ts timestamp, seq long",
    )
    idx.apply_mutations(log)
    before = {tuple(r) for r in idx.documents.collect()}
    idx.materialize_state()
    assert {tuple(r) for r in idx.documents.collect()} == before
    assert idx._state.is_cached
    idx._state.unpersist()


def test_unimax_invariants(spark, sf_dir):
    """UniMax allocation: the budget is exactly exhausted whenever any
    source is uncapped, no source exceeds its epoch cap, and capped
    sources are exactly the ascending-token prefix."""
    from hbase_increment_index_spark.queries import e6j_unimax_allocation

    rows = e6j_unimax_allocation(spark, sf_dir).collect()
    B, C = 48_000, 2
    total = sum(r["alloc_tokens"] for r in rows)
    if not all(r["is_capped"] for r in rows):
        assert abs(total - B) < 1e-3  # budget fully distributed
    for r in rows:
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
        assert r["epochs"] <= C + 1e-9
    by_toks = sorted(rows, key=lambda r: (r["tokens_available"], r["source"]))
    flags = [r["is_capped"] for r in by_toks]
    assert flags == sorted(flags, reverse=True)  # capped = prefix
    # every uncapped source gets the same share
    shares = {r["alloc_tokens"] for r in rows if not r["is_capped"]}
    assert len(shares) <= 1
