"""Output sinks — SURVEY.md §2.1 S10 (reference SolrIndexTools.java:39-49
selects CloudSolrClient vs HttpSolrClient by config; here the sink is a
format+layout choice on one writer).

Parquet is the index/serving format (columnar, pruned); json mirrors a
Solr response dump; csv for interchange. Layout knobs are the scale
levers: ``partition_by`` gives directory pruning, ``n_buckets``
repartitions by key for point-lookup locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("parquet", "json", "csv")


def write_results(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: str | None = None,
    n_buckets: int | None = None,
    key_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}; expected one of {FORMATS}")
    if n_buckets and key_col:
        df = df.repartition(n_buckets, F.col(key_col))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key_col: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed, catalog-backed write — the 100 TB fact-fact join layout
    (SCALE.md "Bucketing / layout prescriptions").

    Unlike a plain ``repartition(n, key)`` parquet write, ``bucketBy``
    records the bucketing in the table catalog, so a join between two
    tables bucketed on the same key with the same bucket count is
    CO-LOCATED: Spark plans a SortMergeJoin with zero shuffle exchanges
    (and zero sorts if ``sort_by`` matches the join key). This is the
    difference between shuffling 100 TB per join and shuffling nothing
    — asserted in tests/test_sinks.py.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, key_col)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.format("parquet").saveAsTable(table_name)


def read_results(spark, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return getattr(reader, fmt)(path)
