"""Field collapsing — Solr's ``{!collapse field=f sort=...}`` qparser
plus the ExpandComponent head (reference surface: the Solr 5.x select
handler the system's README delegates queries to, README.md:5-6,9-10).

Collapse keeps ONE representative document per value of the collapse
field (best by the given sort); expand surfaces what was collapsed
away — here the group size and the runner-up id, which is what result
UIs actually render ("+ 12 more like this").

Plan shape: a single shuffle on the collapse field feeding two window
functions over the SAME window frame (rank + count + lead), then a
rank-1 filter — Spark evaluates all three in one WindowExec pass, so
collapsing a 100 TB result set costs exactly one exchange of the
matching rows, with AQE handling skewed group keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def expand_component(
    df: DataFrame,
    field: str,
    order: list[Column],
    tie_break: str,
    rows: int = 2,
) -> DataFrame:
    """Solr ``expand=true&expand.rows=N`` — the ExpandComponent's FULL
    response: for each collapsed head, up to ``rows`` of the documents
    the collapse hid, in collapse-sort order. Flat shape (one row per
    expanded doc): (field, head_id, expanded_id, expand_rank).

    Plan: the SAME single window pass as collapse() — rank + the
    partition's first id evaluate in one WindowExec over one exchange
    of the matching rows; the rank filter caps output at ``rows`` per
    group map-side after the window. No join back to the heads: the
    head id rides the window frame (first row under the sort)."""
    w = Window.partitionBy(field).orderBy(*order, F.col(tie_break).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("head_id", F.first(tie_break).over(w))
        .filter((F.col("_rn") >= 2) & (F.col("_rn") <= rows + 1))
        .select(
            field,
            "head_id",
            F.col(tie_break).alias("expanded_id"),
            (F.col("_rn") - 1).cast("long").alias("expand_rank"),
        )
    )


def collapse(
    df: DataFrame,
    field: str,
    order: list[Column],
    tie_break: str,
    n_alias: str = "n_in_group",
    expand_alias: str = "expand_head",
) -> DataFrame:
    """One representative row per ``field`` value (first under
    ``order`` + unique ``tie_break``), annotated with the collapsed
    group size and the runner-up's ``tie_break`` id (the head of what
    ExpandComponent would return; NULL for singleton groups)."""
    w = Window.partitionBy(field).orderBy(*order, F.col(tie_break).asc())
    w_all = Window.partitionBy(field)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(n_alias, F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn(expand_alias, F.lead(tie_break).over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
