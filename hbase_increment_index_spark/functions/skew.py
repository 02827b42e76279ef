"""Skew mitigation — the manual counterpart to AQE's skew handling
(SURVEY.md §4 config note; session.py turns AQE skew-join on).

AQE splits skewed partitions at runtime, but only for joins and only
within a shuffle. For aggregations over pathologically hot keys
(one key = 30% of 100 TB), the classic fix is explicit two-phase
aggregation through a salt:

  phase 1: groupBy(key, salt)  — the hot key fans out over S reducers
  phase 2: groupBy(key)        — S partial rows per key combine

This only works for algebraic aggregates (sum/count/min/max and the
decimal-exact forms from numeric.py — all associative). The helper
refuses anything else by construction: you pass partial and final
expressions explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(col: Column | str, buckets: int = 16) -> Column:
    """Deterministic salt derived from the ROW (hash of all grouping-
    irrelevant entropy would do; xxhash64 of the value column keeps it
    reproducible run-to-run, unlike rand())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: str,
    partials: dict[str, Column],
    finals: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``partials``: alias → aggregate over the raw rows (phase 1).
    ``finals``:   alias → aggregate over the phase-1 columns (phase 2);
                  reference phase-1 aliases with F.col(alias).

    Example — skew-proof count+exact-sum::

        two_phase_agg(df, ["k"], "v",
            partials={"n": F.count(F.lit(1)),
                      "s": F.sum(F.col("v").cast("decimal(30,2)"))},
            finals={"n": F.sum("n").cast("long"),
                    "s": F.sum("s").cast("double")})
    """
    phase1 = (
        df.withColumn("_salt", salted(salt_source, buckets))
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in finals.items()]
    )
