"""Stats surface — SURVEY.md §2.2 Q13–Q14 (Solr ``stats.field``).

Every double aggregate goes through ``numeric.exact_*`` so results are
order-independent (partition-count invariant) — see numeric.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_increment_index_spark.functions.layout import fan_out
from hbase_increment_index_spark.numeric import exact_avg, exact_std, exact_sum


def stats_field(
    df: DataFrame, field: str, group_by: list[str] | None = None, scale: int = 6
) -> DataFrame:
    """Q13 — min/max/sum/mean/stddev/count/missing for a numeric field,
    optionally per group (Solr ``stats.field=f&stats.facet=g``).

    fan_out: the exact-decimal partial aggregation is the dominant
    map-side cost; on an under-partitioned scan it would otherwise run
    inside a single scan task."""
    df = fan_out(df)
    c = F.col(field)
    aggs = [
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        exact_sum(c, scale).alias("sum_v"),
        exact_avg(c, scale).alias("mean_v"),
        exact_std(c).alias("stddev_v"),
        F.count(c).alias("count_v"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias("missing_v"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def distinct_counts(df: DataFrame, field: str, group_by: list[str] | None = None) -> DataFrame:
    """Q14 — exact + approximate cardinality (``stats.calcdistinct``).

    ``approx_count_distinct`` is the 100 TB path (HyperLogLog++, fixed
    memory per group); exact countDistinct is kept for oracle parity.
    """
    aggs = [
        F.countDistinct(F.col(field)).alias("n_distinct"),
        F.approx_count_distinct(F.col(field)).alias("n_approx"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
