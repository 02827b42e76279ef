"""Round-8 hardening tests.

Pins the ADVICE r7 fixes with targeted regression evidence:
- delete_by_query on a zero-row state is a clean no-op (previously an
  opaque ``None + timedelta`` TypeError from the NULL max(ts) scalar);
- minhash_lsh_pairs rejects max_bucket_docs=0 instead of silently
  disabling the skew guard via truthiness;
- LSH intermediates cached by one minhash_lsh_pairs call are released
  by the next call / by release_cached_intermediates(), so repeated
  library calls in a long session no longer accumulate cached
  partitions (bench.py's clearCache() was masking this).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hbase_increment_index_spark.api import SecondaryIndex

SCHEMA = (
    "op string, row_key string, family string, qualifier string, "
    "value string, ts timestamp, seq long"
)


def test_delete_by_query_zero_row_state_is_noop(spark):
    idx = SecondaryIndex(spark, families=["cf"], qualifiers=["name", "price"])
    idx.apply_mutations(spark.createDataFrame([], SCHEMA))
    # max(ts) over the empty state is NULL — DBQ must no-op, not crash
    out = idx.delete_by_query(F.lit(True))
    assert out.count() == 0
    # and the index remains usable: a later put lands normally
    cells = [("put", "r1", "cf", "name", "apple", dt.datetime(2024, 1, 1), 1)]
    idx.apply_mutations(spark.createDataFrame(cells, SCHEMA))
    assert {r["rowkey"] for r in idx.documents.collect()} == {"r1"}


def test_lsh_rejects_zero_bucket_cap(spark):
    from hbase_increment_index_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_bucket_docs"):
        minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_docs=0)


def test_lsh_caches_released_between_calls(spark):
    from hbase_increment_index_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        release_cached_intermediates,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta") for i in range(30)]
        + [(100 + i, "dup dup dup dup dup dup dup dup") for i in range(4)],
        "doc_id long, text string",
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    assert not cm.isEmpty()  # intermediates pinned while result is consumed

    # a second call releases the first call's intermediates before
    # pinning its own — the cache count must not grow run-over-run
    minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    release_cached_intermediates()
    assert cm.isEmpty()  # explicit release drops everything


def test_lsh_recompute_after_release_is_correct(spark):
    """Persist is a hint: releasing the caches under a live pair frame
    must recompute from lineage with identical results."""
    from hbase_increment_index_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        release_cached_intermediates,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "entirely unrelated text about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3)
    before = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    release_cached_intermediates()
    after = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert before == after and (1, 2) in before


# ---------------------------------------------------------------------------
# Round-8 operator invariants.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["spark", "join", "query", "hash", "table", "stream", "fast", "data"]

_corpus_and_splits = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),  # text tokens
        st.sampled_from(["keep", "insert", "update", "delete"]),     # mutation role
    ),
    min_size=1,
    max_size=20,
)


def _signatures(spark_df):
    from hbase_increment_index_spark.pipeline.dedup import (
        _MERSENNE,
        minhash_signature_from_hashes,
        portable_hash60,
        shingle_grams,
    )

    hs = F.transform(
        shingle_grams("text", 3),
        lambda s: F.pmod(portable_hash60(s), F.lit(_MERSENNE)),
    )
    return (
        spark_df.withColumn("hs", hs)
        .filter(F.size("hs") > 0)
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    ",", minhash_signature_from_hashes("hs", 64).cast("array<string>")
                )
            ).alias("sig_key"),
        )
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus_and_splits)
def test_signature_store_merge_equals_rebuild(spark, rows):
    """The e2o invariant generalized: for ANY corpus and ANY
    insert/update/delete split, maintaining the signature store
    incrementally (delta-only recompute + broadcast anti-join evict)
    must equal computing signatures fresh over the final corpus —
    the reference coprocessor's maintain ≡ rebuild equality."""
    docs = spark.createDataFrame(
        [(i, " ".join(toks), role) for i, (toks, role) in enumerate(rows)],
        "doc_id long, text string, role string",
    )
    base = docs.filter(F.col("role") != "insert")
    updates = docs.filter(F.col("role") == "update").withColumn(
        "text", F.substring("text", 1, 15)
    )
    inserts = docs.filter(F.col("role") == "insert")
    touched = docs.filter(F.col("role").isin("update", "delete")).select("doc_id")
    merged = (
        _signatures(base)
        .join(F.broadcast(touched), "doc_id", "left_anti")
        .unionByName(_signatures(inserts.unionByName(updates)))
    )
    final = docs.filter(F.col("role") != "delete").withColumn(
        "text",
        F.when(F.col("role") == "update", F.substring("text", 1, 15)).otherwise(
            F.col("text")
        ),
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in _signatures(final).collect()
    }


def test_kmeans_refine_matches_numpy(spark, tmp_path):
    """e16 cross-checked against a straight numpy Lloyd step on a
    synthetic corpus: same seeds (vec_id < 8), same squared-L2
    assignment with lowest-id tie-break, same mean recompute."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 64).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], i % 3) for i in range(40)],
        "vec_id long, embedding array<float>, label long",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    from hbase_increment_index_spark.queries import e16_kmeans_refine

    got = {
        r["centroid_id"]: (r["n_assigned"], r["shift"])
        for r in e16_kmeans_refine(spark, str(tmp_path)).collect()
    }

    x = vecs.astype("float64")
    seeds = x[:8]
    d = ((x[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)  # (40, 8)
    assign = d.argmin(axis=1)  # numpy argmin ties -> lowest index, same rule
    exp = {}
    for s in range(8):
        members = x[assign == s]
        new_c = np.round(members.mean(axis=0), 6)
        shift = round(float(np.sqrt(((new_c - seeds[s]) ** 2).sum())), 6)
        exp[s] = (len(members), shift)
    assert set(got) == set(exp)
    for s in exp:
        assert got[s][0] == exp[s][0], f"centroid {s} size"
        assert abs(got[s][1] - exp[s][1]) < 1e-5, f"centroid {s} shift"


def test_mmr_pool_smaller_than_k(spark):
    """MMR over a pool smaller than k returns the whole pool, ranked;
    rank 1 is the most relevant, later ranks are diversity-discounted."""
    from hbase_increment_index_spark.pipeline.similarity import mmr_select

    cand = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0.9),
            (2, [1.0, 0.001, 0.0], 0.89),   # near-clone of 1: heavily discounted
            (3, [0.0, 1.0, 0.0], 0.5),      # orthogonal: wins rank 2
        ],
        "vec_id long, e array<double>, rel double",
    )
    rows = mmr_select(cand, "vec_id", "e", "rel", k=10, lam=0.7).orderBy("rank").collect()
    assert [r["vec_id"] for r in rows] == [1, 3, 2]
    assert rows[0]["score"] == 0.9


def test_lsh_identical_repeat_call_is_memoized(spark):
    """An identical repeat call (same params, same input plan, caches
    live) must return the memoized pair frame — repeated near-dup
    queries serve from the cached signature index instead of paying
    signatures + banding + the skew probe again. A call with different
    params evicts the memo and the caches."""
    from hbase_increment_index_spark.pipeline.dedup import (
        _CACHED_INTERMEDIATES,
        minhash_lsh_pairs,
        release_cached_intermediates,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
        ],
        "doc_id long, text string",
    )
    release_cached_intermediates()
    p1 = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3)
    n_frames = len(_CACHED_INTERMEDIATES)
    p2 = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3)
    assert p2 is p1  # memo hit: same object, no new jobs, no new caches
    assert len(_CACHED_INTERMEDIATES) == n_frames
    # different params: memo miss, prior caches released, new ones pinned
    p3 = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    assert p3 is not p1
    assert sorted((r["id_a"], r["id_b"]) for r in p3.collect()) == [(1, 2)]
    release_cached_intermediates()
