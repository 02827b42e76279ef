"""hbase_increment_index_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of
``qindongliang/hbase-increment-index`` (an HBase→Solr incremental
secondary-index coprocessor, see ``/root/reference``) as an idiomatic
PySpark engine:

- ``cdc``       — change-capture cell model, latest-per-key compaction,
                  delete application, index-table maintenance
                  (reference: HbaseSolrIndexCoprocesser.java:37-61,
                  SolrIndexTools.java:39-144).
- ``search``    — the Solr-style query surface the reference's
                  architecture serves (filters, full-text match,
                  facets, stats, ranking, pagination; reference
                  README.md:5-10).
- ``pipeline``  — LLM-data-pipeline extensions: dedup (exact/minhash/
                  simhash), similarity search, text analysis,
                  multimodal columns.
- ``streaming`` — Structured Streaming veneer over the CDC log
                  (micro-batch upsert, the reference's timer-flush
                  semantics; SolrIndexTools.java:47-82).

Everything is DataFrame/Spark-SQL first: the logical plan is declared
declaratively and Catalyst/Tungsten pick the physical strategy. No RDDs,
no row-at-a-time Python UDFs in any hot path.
"""

__version__ = "0.1.0"
