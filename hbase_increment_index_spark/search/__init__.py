"""Solr-style query surface (SURVEY.md §2.2 Q1–Q17), Spark-native.

The reference delegates all reads to a Solr ``select`` handler
(reference README.md:9-10); this package re-expresses that surface as
thin, composable DataFrame builders so Catalyst owns the physical
plan (pushdown, broadcast selection, whole-stage codegen).
"""

from hbase_increment_index_spark.search import facets, filters, paging, ranking, stats, tokenize  # noqa: F401
