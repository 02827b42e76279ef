"""LLM-data-pipeline operators (SURVEY.md §2.3 E1–E5).

Driver-mandated extensions beyond the reference surface
(BASELINE.json:north_star): dedup, similarity search, text analysis,
multimodal columns — each designed for 100 TB inputs (map-side
pre-aggregation, broadcast of small sides, banding/bucketing instead
of all-pairs, no driver-side loops).
"""

from hbase_increment_index_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
