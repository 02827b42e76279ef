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


def merge_upsert_parquet(
    spark,
    path: str,
    delta: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    delete_col: str | None = None,
) -> None:
    """Copy-on-write MERGE onto plain parquet — the Delta/Iceberg
    ``MERGE INTO`` semantics (upsert + optional delete) with zero
    format dependencies, closing the reference's batched add/delete
    sink (SolrIndexTools.java:60-63,127-131) into a real table merge:

    1. the table is hash-bucket partitioned (``kb = pmod(xxhash64(key),
       n_buckets)`` as a partition directory column) at first write;
    2. a merge computes the delta's impacted bucket set (a <=n_buckets
       driver list — bounded, never corpus-sized);
    3. ONLY those partitions are read back (directory pruning on kb),
       anti-joined against the delta's keys (delta side broadcast —
       small by construction in a CDC batch), unioned with the delta's
       surviving rows;
    4. the rewrite goes through ``partitionOverwriteMode=dynamic``, so
       untouched bucket directories are never rewritten — merge cost is
       ∝ |delta| + |impacted buckets|, not table size. At 100 TB with
       64k buckets a 1M-row batch touches ~1.5% of the table.

    ``delete_col``: optional boolean column in ``delta`` marking rows
    to delete instead of upsert (the S7 delete sink). Rows for a key
    appear at most once in the merged table (last-writer-wins within
    the batch is the caller's contract, as in the reference's batch).
    """
    kb = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("kb")
    if not merged_table_exists(spark, path):
        base = delta if delete_col is None else delta.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        # a data-less bootstrap (empty delta, or a first batch whose
        # keys are ALL tombstoned) would write only _SUCCESS — then
        # merged_table_exists() says true but read fails schema
        # inference, permanently wedging the table. Keep the table
        # absent until real rows arrive; the one-job probe runs only
        # on the (once-per-table) bootstrap path.
        if base.isEmpty():
            return
        base.withColumn("kb", kb).write.partitionBy("kb").mode(
            "overwrite"
        ).parquet(path)
        spark.catalog.refreshByPath(path)
        return
    delta = delta.withColumn("kb", kb)
    impacted = [r["kb"] for r in delta.select("kb").distinct().collect()]
    table = spark.read.parquet(path).filter(F.col("kb").isin(impacted))
    keys = delta.select(key_col, "kb").distinct()
    kept = table.join(F.broadcast(keys), [key_col, "kb"], "left_anti")
    if delete_col is not None:
        delta = delta.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    merged = kept.unionByName(delta.select(*kept.columns))
    # materialize BEFORE the overwrite: (a) Spark refuses to overwrite
    # a path its plan is still reading (the kept side scans `path`);
    # (b) we need the surviving bucket set to detect fully-emptied
    # buckets. The checkpoint holds |delta| + |impacted buckets| rows,
    # never the table.
    merged = merged.localCheckpoint(eager=True)
    # emptied-bucket detection only matters when deletes exist: without
    # them every impacted bucket retains at least its delta rows, so the
    # survivors probe (one job) is skipped on the upsert-only path
    survivors = (
        set(impacted)
        if delete_col is None
        else {r["kb"] for r in merged.select("kb").distinct().collect()}
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.partitionBy("kb").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only replaces partitions that PRODUCE rows — a
    # bucket whose every key was deleted writes nothing and would keep
    # serving stale files; drop those directories through the Hadoop
    # FileSystem API (works on local paths and HDFS/object stores alike)
    emptied = [b for b in impacted if b not in survivors]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for b in emptied:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/kb={b}")
            p.getFileSystem(conf).delete(p, True)
    # the overwrite replaced files behind Spark's cached FileIndex for
    # this path — invalidate it or the next read fails on vanished parts
    spark.catalog.refreshByPath(path)


def merged_table_exists(spark, path: str) -> bool:
    """Committed-table probe for merge_upsert_parquet layouts, through
    the Hadoop FileSystem API so it is scheme-agnostic (file://,
    hdfs://, s3a://) — an ``os.path.exists`` only answers for the
    driver's local disk. Requires the _SUCCESS marker, so a
    half-written bootstrap from a crashed job counts as absent."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jvm.org.apache.hadoop.fs.Path(path, "_SUCCESS")))


def read_merged_table(spark, path: str) -> DataFrame:
    """Serving view of a merge_upsert_parquet table (drops the bucket
    column; point lookups still prune on kb when the caller filters
    ``pmod(xxhash64(key), n) = b``)."""
    return spark.read.parquet(path).drop("kb")


def read_results(spark, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unknown sink format {fmt!r}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return getattr(reader, fmt)(path)
