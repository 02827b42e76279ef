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


def read_results(spark, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return getattr(reader, fmt)(path)
