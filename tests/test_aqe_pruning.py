"""Runtime scale-behavior proofs: AQE splits skewed join partitions,
and partitionBy layouts prune at the directory level (the IVF/LSH
read-path claim in SCALE.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark, tmp_path):
    # one hot key carrying ~100x the rows of every other key: without
    # AQE the sort-merge join puts the whole hot key in one task; with
    # skew-join handling the runtime plan marks the join skew=true and
    # splits it. (Thresholds lowered so the tiny fixture trips them.)
    confs = {
        # the session default is AQE-off for suite speed (conftest) —
        # this test is ABOUT adaptive execution, so turn it on here
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        cold = spark.range(2_000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("payload")
        )
        left = hot.unionByName(cold)
        right = spark.range(51).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = left.join(right, "k")
        # execute THIS plan instance so its adaptive plan is finalized
        # (count() would build a separate aggregated plan)
        n_rows = len(joined.toPandas())
        assert n_rows == 202_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitionby_layout_prunes_partitions(spark, tmp_path):
    # the ANN read-path claim: embeddings written partitionBy(cid)
    # serve a probe of n_probe cells by reading ONLY those directories
    # (PartitionFilters in the scan, partition count pruned)
    df = spark.range(1_000).select(
        (F.col("id") % 16).alias("cid"), F.col("id").alias("vec_id")
    )
    path = str(tmp_path / "ivf_cells")
    df.write.partitionBy("cid").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("cid").isin(3, 7))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    # runtime proof, not just plan text: only 2 of 16 directories scanned
    scanned = probe.select(F.input_file_name()).distinct().collect()
    dirs = {r[0].split("/cid=")[1].split("/")[0] for r in scanned}
    assert dirs == {"3", "7"}
    assert probe.count() == 126  # 63 rows in each of the two cells
