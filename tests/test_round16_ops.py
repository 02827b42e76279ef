"""Round-16 optimization guards.

The optimization round rewrites operator INTERNALS only — these tests
pin the contracts the rewrites must preserve.
"""

from pyspark.sql import functions as F


def test_minhash_arrow_kernel_bit_identical(spark):
    """r16: minhash_signatures_vectorized moved from a per-row Python
    loop inside mapInPandas to a whole-batch mapInArrow kernel
    (flat-values + offsets + np.minimum.reduceat — guide §4.2). The
    signatures must stay BIT-IDENTICAL to the JVM expression form,
    including the empty-doc / NULL-doc sentinel rows."""
    from hbase_increment_index_spark.pipeline.dedup import (
        minhash_signature_from_hashes,
        minhash_signatures_vectorized,
        shingle_hashes,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "a completely different document about spark"),
        (4, ""),  # empty → all-sentinel signature
        (5, None),  # null → all-sentinel signature
        (6, "ab"),  # shorter than the gram width → no shingles
        (7, "x " * 500),  # long repetitive doc
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pre = d.select("doc_id", shingle_hashes(F.col("text"), 3).alias("hs"))

    vec = minhash_signatures_vectorized(pre, "doc_id", "hs", 64)
    expr = pre.select(
        F.col("doc_id").alias("doc"),
        minhash_signature_from_hashes("hs", 64).alias("sig"),
    )
    assert vec.exceptAll(expr).count() == 0
    assert expr.exceptAll(vec).count() == 0
    # sentinel rows really are the never-colliding all-MAX signature
    sent = {r["doc"]: r["sig"] for r in vec.filter(F.col("doc").isin(4, 5)).collect()}
    assert sent[4] == [2**63 - 1] * 64
    assert sent[5] == [2**63 - 1] * 64
