"""Cross-cutting function helpers: skew mitigation, exact numeric
aggregation re-exports."""

from hbase_increment_index_spark.functions import skew  # noqa: F401
