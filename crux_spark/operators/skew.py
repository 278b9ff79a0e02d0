"""Skew-handling utilities: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins;
these helpers cover the remaining cases — skewed aggregations and
broadcast-ineligible joins with a few dominant keys — via the standard
two-phase salt/unsalt pattern. At 100 TB a handful of hot entities (a
viral document, a null-ish default key) otherwise serialize a whole stage
on one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate: partial (key, salt) aggregation
    spreads a hot key over `salt` tasks, the final merge is tiny.
    Returns (key_cols..., n, total)."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count("*").alias("__n"), F.sum(value_col).alias("__s")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("total")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side's key, replicate the small side
    across all salt values, join on (key, salt). Use when the small side
    is too big to broadcast and the big side's key distribution is
    dominated by a few values."""
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")
