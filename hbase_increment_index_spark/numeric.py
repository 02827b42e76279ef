"""Order-independent numeric aggregation helpers.

Floating-point sums depend on accumulation order, which differs
between Spark partitions/AQE plans and the DuckDB oracle (and between
runs at different parallelism). Every aggregate this engine exposes
therefore routes doubles through *exact decimal* sums — decimal
addition is associative, so the result is identical regardless of
partitioning — and only then converts to double.

The DuckDB-equivalent SQL for each helper is noted so oracle queries
can be written to match bit-for-bit:

    exact_sum(c, s)    ->  CAST(SUM(CAST(c AS DECIMAL(30,s))) AS DOUBLE)
    exact_avg(c, s)    ->  CAST(SUM(CAST(c AS DECIMAL(30,s))) AS DOUBLE)
                           / COUNT(c)
    exact_std(c)       ->  see _STD_NOTE below

This matters at 100 TB for a second reason: a deterministic aggregate
is re-computable — retried tasks and speculative execution produce the
same partial results, so AQE-induced re-partitioning never changes the
answer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal(30, s) leaves >= 20 integer digits — enough to sum 1e18 rows of
# 1e6-magnitude values without overflow. Spark widens the sum type itself.
_PREC = 30


def dec(col: Column | str, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PREC},{scale})")


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def exact_std(col: Column | str, scale: int = 10) -> Column:
    """Order-independent sample stddev.

    Uses sum-of-squares form with exact decimal sums; the per-row
    square is a single IEEE double multiply (deterministic), the sums
    are exact decimals, and the final combination is a fixed sequence
    of double ops — identical in any engine that implements IEEE 754.

    _STD_NOTE — DuckDB equivalent::

        SQRT((CAST(SUM(CAST(c*c AS DECIMAL(30,10))) AS DOUBLE)
              - CAST(SUM(CAST(c AS DECIMAL(30,10))) AS DOUBLE)
                * CAST(SUM(CAST(c AS DECIMAL(30,10))) AS DOUBLE) / COUNT(c))
             / (COUNT(c) - 1))
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    s1 = F.sum(dec(c, scale)).cast("double")
    s2 = F.sum(dec(c * c, scale)).cast("double")
    return F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1)))
