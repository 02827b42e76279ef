"""The HBase cell model as a DataFrame schema (SURVEY.md §1.1, S3–S5).

Reference semantics being re-expressed:

- one change event per row mutation, carrying the rowkey and the
  cells of the *configured* column families only
  (HbaseSolrIndexCoprocesser.java:39-50);
- family allow-list from config ``hbase_column_family``
  (HbaseSolrIndexCoprocesser.java:42, application.properties:2);
- empty/missing families contribute nothing
  (HbaseSolrIndexCoprocesser.java:44);
- values decoded as strings — the *intended* cell-value decode, not
  the reference's getValueArray bug (SURVEY.md §1.1 quirk note).

The fixture corpus has no real HBase; ``cell_log_from_events``
derives a deterministic cell log from the ``events`` table exactly as
specified in FIXTURES.md (pure projection — every downstream query
stays DuckDB-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the CDC cell log (SURVEY.md §1.4): op ∈ {put, delete},
#: row_key string, family/qualifier strings, value string, ts event
#: time, seq a unique monotone id used as the total-order tie-break
#: (HBase resolves same-timestamp cells by sequence id; we make that
#: explicit instead of relying on arrival order).
CELL_LOG_COLUMNS = ("op", "row_key", "family", "qualifier", "value", "ts", "seq")


def cell_log_from_events(
    events: DataFrame,
    delete_event_type: str = "delete",
    value_scale: int = 2,
) -> DataFrame:
    """Derive the CDC cell log from the ``events`` fixture (FIXTURES.md).

    op = 'delete' for ``delete_event_type`` rows, else 'put';
    row_key = user_id; family = 'cf'; qualifier = event_type;
    value = event value formatted at fixed scale (decimal-string so the
    representation is engine-independent); seq = event_id.

    DuckDB equivalent of the value column::

        CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)
    """
    return events.select(
        F.when(F.col("event_type") == delete_event_type, F.lit("delete"))
        .otherwise(F.lit("put"))
        .alias("op"),
        F.col("user_id").cast("string").alias("row_key"),
        F.lit("cf").alias("family"),
        F.col("event_type").alias("qualifier"),
        F.col("value").cast(f"decimal(18,{value_scale})").cast("string").alias("value"),
        F.col("ts").alias("ts"),
        F.col("event_id").alias("seq"),
    )


def filter_families(cell_log: DataFrame, allowed_families: list[str]) -> DataFrame:
    """S4 — column-family allow-list (``hbase_column_family`` config,
    reference HbaseSolrIndexCoprocesser.java:42). A plain isin filter:
    Catalyst pushes it into the scan."""
    return cell_log.filter(F.col("family").isin(allowed_families))


def drop_empty_cells(cell_log: DataFrame) -> DataFrame:
    """S5 — skip cells with no payload (reference
    HbaseSolrIndexCoprocesser.java:44). Deletes carry no value by
    design and are kept."""
    return cell_log.filter(
        (F.col("op") == "delete")
        | (F.col("value").isNotNull() & (F.length("value") > 0))
    )
