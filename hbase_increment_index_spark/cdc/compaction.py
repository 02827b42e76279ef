"""CDC compaction + delete application (SURVEY.md §2.1 S1/S2/S6/S7/S9).

The reference's runtime semantics, reduced to relational algebra:

- *Upsert-by-rowkey* (Solr add with unique key overwrites;
  reference SolrIndexTools.java:60,127): keep only the newest cell
  per key → window ``row_number() == 1`` over
  ``partitionBy(key).orderBy(ts desc, seq desc)``.
- *Delete-by-rowkey deletes the whole document* (reference
  HbaseSolrIndexCoprocesser.java:56-61, SolrIndexTools.java:63,129 —
  ``deleteById``): a row whose *latest* op is delete is absent from
  the index.

Scale notes: both compaction and delete application are one shuffle
on the row key. On a real cluster the CDC log would be written
bucketed/partitioned by ``row_key`` so successive compactions reuse
the partitioning instead of re-shuffling (see index_builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(cell_log: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Newest change event per key (default key: row_key).

    Total order within a key: ts desc, then seq desc — seq is unique,
    so the survivor is deterministic even with timestamp ties.
    """
    keys = keys or ["row_key"]
    w = Window.partitionBy(*keys).orderBy(F.col("ts").desc(), F.col("seq").desc())
    return (
        cell_log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_per_cell(cell_log: DataFrame) -> DataFrame:
    """Newest value per (row_key, family, qualifier) — HBase's own
    per-cell versioning semantics (SURVEY.md §1.1)."""
    return latest_per_key(cell_log, keys=["row_key", "family", "qualifier"])


def apply_deletes(cell_log: DataFrame) -> DataFrame:
    """Materialize the live index keyspace: latest event per row_key,
    dropping keys whose latest op is a delete.

    Equivalent anti-join formulation (same result, two shuffles):
    ``puts.join(latest_deletes, 'row_key', 'left_anti')``; the window
    form does it in one shuffle, so it is the default.
    """
    return latest_per_key(cell_log).filter(F.col("op") == "put")


def apply_deletes_anti_join(cell_log: DataFrame) -> DataFrame:
    """The explicit anti-join form of delete application — the literal
    Spark translation of Solr ``deleteById`` (reference
    SolrIndexTools.java:63,129). Kept for parity/testing; prefer
    ``apply_deletes``."""
    latest = latest_per_key(cell_log)
    deleted_keys = latest.filter(F.col("op") == "delete").select("row_key")
    return latest.join(deleted_keys, "row_key", "left_anti")


def latest_n_versions(cell_log: DataFrame, n: int) -> DataFrame:
    """HBase ``VERSIONS=n`` retention: the newest ``n`` put versions
    per cell coordinate (row_key, family, qualifier), each tagged with
    its 1-based ``version`` (1 = newest). The reference's primary
    store is an HBase table, where version count is a column-family
    attribute enforced at compaction — this is that major-compaction
    semantics as one window over the cell log.

    SCOPE: version retention only — delete tombstones are IGNORED (a
    cell whose newest event is a row delete still yields its n latest
    puts here). HBase major compaction applies deletes before
    enforcing VERSIONS; for that composed semantics, anti-join this
    against the row tombstones the way ``live_cells`` does::

        latest_n_versions(log, n).join(
            latest_per_key(log).filter(F.col('op') == 'delete')
            .select('row_key'), 'row_key', 'left_anti')

    Same single shuffle as latest_per_cell; the window streams each
    partition once regardless of n."""
    w = Window.partitionBy("row_key", "family", "qualifier").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    return (
        cell_log.filter(F.col("op") == "put")
        .withColumn("version", F.row_number().over(w))
        .filter(F.col("version") <= n)
    )


def apply_ttl(cell_log: DataFrame, ttl_seconds: int, now=None) -> DataFrame:
    """HBase ``TTL=s`` expiry: drop cells older than ``ttl_seconds``
    before ``now`` (default: the log's max timestamp, so batch replays
    are deterministic — pass an explicit literal in streaming use).
    A pure filter when ``now`` is given (pushed into the scan); with
    the default, the max rides a 1-row broadcast cross join."""
    # bound literal via make_dt_interval — a non-numeric ttl fails here
    # with a clear TypeError instead of a SQL parse error at plan time,
    # and fractional TTLs keep their sub-second precision
    ttl = F.make_dt_interval(secs=F.lit(float(ttl_seconds)))
    if now is not None:
        return cell_log.filter(F.col("ts") >= F.lit(now) - ttl)
    mx = cell_log.agg(F.max("ts").alias("_now"))
    return (
        cell_log.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("_now") - ttl)
        .drop("_now")
    )


def live_cells(cell_log: DataFrame) -> DataFrame:
    """Live cell state: newest put per (row_key, family, qualifier),
    minus rows whose newest *row-level* event is a delete — a delete
    removes the whole document, never a single cell (reference
    HbaseSolrIndexCoprocesser.java:56-61; SURVEY.md §1.2)."""
    cell_latest = latest_per_cell(cell_log).filter(F.col("op") == "put")
    row_latest = latest_per_key(cell_log).select("row_key", F.col("op").alias("_row_op"))
    return (
        cell_latest.join(row_latest, "row_key")
        .filter(F.col("_row_op") == "put")
        .drop("_row_op")
    )
