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
