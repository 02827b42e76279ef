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


def keyset_page(
    df: DataFrame,
    sort_col: str,
    tie_break: str,
    after: tuple | None = None,
    rows: int = 10,
    descending: bool = True,
) -> DataFrame:
    """Solr cursorMark-style keyset pagination — the deep-paging path
    that stays O(rows) at any depth (offset pagination ranks everything
    before the offset; a cursor just filters past the last-seen key).

    ``after`` = (last_sort_value, last_tie_break) from the previous
    page; None = first page. The (sort, tie) pair is a total order, so
    pages partition the result set exactly — no skips, no repeats.
    """
    s, t = F.col(sort_col), F.col(tie_break)
    if after is not None:
        sv, tv = after
        gap = (s < F.lit(sv)) if descending else (s > F.lit(sv))
        pred = gap | ((s == F.lit(sv)) & (t > F.lit(tv)))
        df = df.filter(pred)
    order = [s.desc() if descending else s.asc(), t.asc()]
    return df.orderBy(*order).limit(rows)


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


def group_ngroups(df: DataFrame, group_field: str) -> DataFrame:
    """Solr ``group.ngroups=true`` response-header pair: one row
    ``(matches, ngroups)`` — total matching rows and number of distinct
    groups. Two-phase: per-group partial counts collapse map-side, then
    a single-row final — avoids the Expand a ``count(DISTINCT)`` over
    the full table would plan."""
    per_group = df.groupBy(group_field).agg(F.count(F.lit(1)).alias("_n"))
    return per_group.agg(
        # coalesce: an empty match set is (0, 0) like Solr's header,
        # not (NULL, 0)
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("matches"),
        F.count(F.lit(1)).cast("long").alias("ngroups"),
    )
