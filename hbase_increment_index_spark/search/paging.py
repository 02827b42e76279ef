"""Sort / pagination / group-top-N — SURVEY.md §2.2 Q7, Q8, Q15.

Determinism note: Solr pagination is only stable with a total order,
so every helper here requires (and appends) a unique tie-break column.
At scale, ``limit`` after ``orderBy`` is executed by Spark as a
TakeOrderedAndProject — per-partition top-k then a k-sized merge on
the driver — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sorted_page(
    df: DataFrame,
    order: list[Column],
    tie_break: str,
    start: int = 0,
    rows: int = 10,
) -> DataFrame:
    """Q7+Q8 — ``sort=...&start=N&rows=M``.

    start == 0 uses orderBy+limit (TakeOrderedAndProject). Deep offsets
    use a row_number window — the same cost model as Solr's deep
    paging, and the reason real systems use cursors instead; exposed
    for parity, not recommended at depth.
    """
    full_order = [*order, F.col(tie_break).asc()]
    if start == 0:
        return df.orderBy(*full_order).limit(rows)
    w = Window.orderBy(*full_order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > start) & (F.col("_rn") <= start + rows))
        .drop("_rn")
    )


def group_top_n(
    df: DataFrame,
    group_field: str,
    order: list[Column],
    tie_break: str,
    n: int = 1,
) -> DataFrame:
    """Q15 — Solr result grouping (``group.field=f&group.limit=n``):
    top-n rows per group. Window ranking — one shuffle on the group
    key, no self-join."""
    w = Window.partitionBy(group_field).orderBy(*order, F.col(tie_break).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
