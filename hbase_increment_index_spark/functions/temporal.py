"""Temporal operators: as-of (point-in-time) join.

Not part of the reference surface (SURVEY.md §2.4: no theta/as-of join
exists there) — added because point-in-time correctness is foundational
for training-data pipelines (feature values as they were at event
time), and because the naive formulation (range join + per-row top-1)
is quadratic while the union-window formulation below is one sort.

Plan shape: tag both sides, union, one window over (key, ts) carrying
the right side's columns forward with ``last(ignorenulls)``. Cost =
one shuffle on the key + one sort — the same as a sort-merge join,
with no range-join explosion. At 100 TB both sides bucket by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tie: str,
) -> DataFrame:
    """For each left row: the right row with the greatest ``right_ts``
    <= ``left_ts`` for the same key (ties on right_ts broken by the
    greatest ``right_tie`` — total order, deterministic).

    Returns left columns + the matched payload columns (NULL payload =
    no right row at or before the event; filter on it for inner
    semantics).

    The payload travels as ONE struct through ``last(ignorenulls)``, so
    every payload column comes from the same matched right row — a NULL
    field inside the match stays NULL instead of being backfilled
    column-by-column from an older right row.
    """
    r_payload = F.struct(*[F.col(c).alias(c) for c in payload])
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None)
        .cast(right.select(r_payload.alias("_p")).schema["_p"].dataType)
        .alias("_p"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(right_tie).cast("long").alias("_tie"),
        r_payload.alias("_p"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    unioned = l_tag.unionByName(r_tag)

    # rights sort before lefts at equal ts (_is_left asc); among equal-ts
    # rights the greatest tie sorts last, so last(ignorenulls) picks it
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select("*", F.last("_p", ignorenulls=True).over(w).alias("_m"))
    out = filled.filter(F.col("_is_left") == 1).select(
        *[F.col("_row")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(c) for c in payload],
    )
    return out


def interval_join(
    events: DataFrame,
    anchors: DataFrame,
    key: str,
    event_ts_us: str,
    lo_us: str,
    hi_us: str,
    bin_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval (range) join: every event row whose timestamp falls in
    an anchor's [lo, hi] window, matched per key — "all activity within
    an hour of signup"-shaped queries. Like the as-of join, absent from
    the reference surface (SURVEY.md §2.4: equi only) but foundational
    for event-window feature extraction.

    Spark has no native range join; the naive formulation is a
    nested-loop (quadratic). This uses the standard bin decomposition:
    anchors explode to every ``bin_width_us`` bucket their interval
    overlaps, events compute their single bucket, the engine equi-joins
    on (key, bucket) — hash join, shuffle bounded by key×bucket — and
    the exact ``BETWEEN`` predicate filters residue. Each event joins
    its one bucket, so no pair can duplicate. Choose the bin near the
    median interval width: wider bins → fewer anchor replicas, more
    residue filtering; narrower → the reverse. All timestamp math is on
    integer microseconds (engine-portable, no tz semantics).

    Returns anchors' columns (minus lo/hi) + the event row's columns,
    inner semantics.
    """
    ev_bin = F.floor(F.col(event_ts_us) / F.lit(bin_width_us))
    a_bins = F.sequence(
        F.floor(F.col(lo_us) / F.lit(bin_width_us)),
        F.floor(F.col(hi_us) / F.lit(bin_width_us)),
    )
    a = anchors.withColumn("_bin", F.explode(a_bins))
    e = events.withColumn("_bin", ev_bin)
    joined = a.join(e, on=[key, "_bin"]).filter(
        F.col(event_ts_us).between(F.col(lo_us), F.col(hi_us))
    )
    return joined.drop("_bin", lo_us, hi_us)
