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


def export_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    fl: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Solr ``/export`` handler: full sorted result-set export (the
    docValues streaming path Solr uses when a result is too big for
    ``start+rows`` paging — reference-surface Solr 5.x exports on
    sort+fl only, which is exactly this signature).

    A single global ``orderBy`` would funnel the result through one
    final collect; instead the export is RANGE-partitioned on the sort
    key and sorted within each partition — files are globally ordered
    (file k's rows all sort before file k+1's), each file is internally
    sorted, and every partition writes in parallel. Reading the files
    back in filename order yields the total order; range boundaries
    come from Spark's reservoir sampling of the sort key, so skewed
    keys still split evenly. At 100 TB this is the only export shape
    that works — and it doubles as the sorted-layout write for
    min/max-pruned scans.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}; expected one of {FORMATS}")
    cols = [F.col(c) for c in sort_cols]
    # explicit n_files pins the file count (AQE coalesces a bare
    # repartitionByRange on small inputs); size it to the target
    # file size at scale, e.g. rows ÷ (128 MB / row width)
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    if fl:
        out = out.select(*dict.fromkeys([*fl]))
    writer = out.write.mode(mode)
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
