"""Change-data-capture + index maintenance (SURVEY.md §2.1 S1–S10).

This is the part of the reference that actually exists as code: an
HBase coprocessor mirroring every Put/Delete into a Solr index
(reference HbaseSolrIndexCoprocesser.java:37-61) with batched,
timer-flushed commits (reference SolrIndexTools.java:39-144).

Spark re-expression: the mutation stream is a DataFrame of cell-level
change events ``(op, row_key, family, qualifier, value, ts, seq)``;
index maintenance is latest-per-key compaction (window) + anti-join
delete application; the "Solr index" is a columnar table written with
``df.write``. All of the reference's buffering/locking machinery
(Semaphore, Timer, threshold counters) disappears into Spark's
micro-batch/stage model.
"""

from hbase_increment_index_spark.cdc import cell_model, compaction, index_builder  # noqa: F401
