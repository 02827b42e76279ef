"""Structured-Streaming veneer over the CDC log (SURVEY.md §2.1 S8, §7
Phase 4)."""

from hbase_increment_index_spark.streaming import cdc_stream  # noqa: F401
