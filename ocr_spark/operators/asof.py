"""As-of join — a time-series operator Spark lacks natively.

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with the same ``by`` key and ``right.on <= left.on``
(backward inclusive; the pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics).

Scalable implementation (no per-group pandas): union the two sides tagged,
then one window pass per ``by`` key ordered by ``(on, side)`` carrying the
last non-null right values forward (``last(..., ignorenulls=True)``).  One
shuffle on the key, linear in rows — survives keys with millions of rows
where a per-group ``merge_asof`` would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward-inclusive as-of join; right columns arrive suffixed and are
    NULL when no right row precedes the left row."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        by, on, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows (side=0) sort before left rows at equal `on` -> inclusive
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )
