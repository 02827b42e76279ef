"""Physical-layout helpers: scan-parallelism alignment.

A parquet source with few (or single) row groups scans as a handful of
tasks no matter how many cores the cluster has — Spark cannot split
inside a row group. Any operator that does real per-row CPU work
downstream of such a scan (higher-order-function shingling, decimal
aggregation, per-row hashing) then runs effectively single-threaded,
because map-side work — including partial aggregation — executes inside
the scan tasks.

``fan_out`` is the gated fix: round-robin repartition to the session's
default parallelism, but ONLY when the input has fewer partitions than
that. On a real 100 TB table (thousands of splits) the condition is
false and this is a zero-cost no-op — the gate is what makes it safe to
leave in operator code. The shuffle it introduces on under-partitioned
inputs carries only the columns the downstream plan needs (Catalyst
prunes projections through Repartition) and costs far less than the
serial CPU time it buys back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * multiple`` iff it
    currently has fewer partitions than that (e.g. a single-row-group
    parquet fixture). No-op on well-partitioned inputs — at scale the
    scan already has more splits than cores and no shuffle is added."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
