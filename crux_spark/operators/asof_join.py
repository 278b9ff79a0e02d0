"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native as-of join (pyspark guide: bucketize or merge_asof per
group). The scalable recast used here: union the two tagged streams, one
window partitioned by key ordered by (time, side), carry the right side's
values forward with last(ignorenulls) — a SINGLE shuffle on the key, no
per-group pandas, no range-condition join explosion. This is the batch
analogue of the reference's entity-as-of point resolution
(crux-core/src/crux/kv/index_store.clj:746-795) generalized to two
streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Attach to each left row the value_cols of the latest right row with
    right_time <= left_time for the same `on` key. Right columns come back
    prefixed ``asof_`` (plus ``asof_time``); unmatched rows keep nulls.
    """
    lt = left.select(
        F.col(on),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    rt = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    merged = lt.unionByName(rt)
    # right rows sort before left rows at equal timestamps, so an exact-tie
    # right row IS visible to the left row (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        on,
        "__side",
        "__lrow",
        F.last("__rt", ignorenulls=True).over(w).alias("asof_time"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    out = carried.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        "asof_time",
        *[F.col(f"asof_{c}") for c in value_cols],
    )
    if tolerance_us is not None:
        out = out.withColumn(
            "asof_time",
            F.when(
                F.col(left_time).cast("long") - F.col("asof_time").cast("long")
                <= tolerance_us // 1_000_000,
                F.col("asof_time"),
            ),
        )
    return out
