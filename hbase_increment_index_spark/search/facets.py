"""Facet surface — SURVEY.md §2.2 Q10–Q12, Q16.

Solr facets are group-by-count aggregations; Spark's hash aggregate
computes them with a map-side partial pass, so the shuffle carries one
row per (partition, group), not per input row — the property that
keeps these linear-scan cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def facet_field(df: DataFrame, field: str, count_alias: str = "n") -> DataFrame:
    """Q10 — ``facet.field=f``: value counts."""
    return df.groupBy(field).agg(F.count(F.lit(1)).alias(count_alias))


def facet_range(
    df: DataFrame,
    field: str,
    gap: float,
    bucket_alias: str = "bucket_start",
    count_alias: str = "n",
) -> DataFrame:
    """Q11 — ``facet.range=f&facet.range.gap=g``: fixed-width buckets.

    Bucket id is ``floor(f / g) * g`` — exact for integer-like gaps.
    """
    bucket = (F.floor(F.col(field) / F.lit(gap)) * F.lit(gap)).alias(bucket_alias)
    return df.groupBy(bucket).agg(F.count(F.lit(1)).alias(count_alias))


def facet_time(
    df: DataFrame,
    ts_field: str,
    unit: str = "day",
    bucket_alias: str = "bucket",
    count_alias: str = "n",
) -> DataFrame:
    """Q11 (time form) — date_trunc buckets over a timestamp."""
    return df.groupBy(F.date_trunc(unit, F.col(ts_field)).alias(bucket_alias)).agg(
        F.count(F.lit(1)).alias(count_alias)
    )


def facet_queries(df: DataFrame, buckets: dict[str, Column]) -> DataFrame:
    """Q12 — ``facet.query=...``: one count per arbitrary predicate,
    computed in a single scan via conditional aggregation."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in buckets.items()
    ]
    return df.agg(*aggs)


def facet_pivot(df: DataFrame, fields: list[str], count_alias: str = "n") -> DataFrame:
    """Q16 — ``facet.pivot=a,b``: nested value counts (leaf level)."""
    return df.groupBy(*fields).agg(F.count(F.lit(1)).alias(count_alias))


def facet_pivot_rollup(
    df: DataFrame, fields: list[str], count_alias: str = "n"
) -> DataFrame:
    """Q16 (subtotal form) — pivot with all prefix subtotal levels,
    i.e. SQL ROLLUP. Spark expands this to grouping sets in one pass."""
    return df.rollup(*fields).agg(F.count(F.lit(1)).alias(count_alias))
