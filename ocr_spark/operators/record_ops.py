"""Record-level projections and updates (reference P1-P4).

The reference's editor mutates one field of the typed record with
type-aware coercion (reference: src/app/page.tsx:239-248,
src/components/data-editor.tsx:16-51).  In Spark these are declarative
struct operations — ``withField`` (no Python, no rebuild of the struct),
``cast`` for coercion, ``to_json`` for display stringification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def update_field(
    records: DataFrame, field: str, value: Column, struct_col: str = "fields"
) -> DataFrame:
    """P2 record update: replace one field inside the record struct
    (reference ``{...data, [key]: newValue}``, page.tsx:239-248)."""
    # back-quote: field names may contain non-ASCII (nombre_des_présents)
    return records.withColumn(
        struct_col, F.col(struct_col).withField(f"`{field}`", value)
    )


def coerce_like(value: Column, target_type: str) -> Column:
    """P3 type coercion: string input -> number/boolean by the original
    field's type (data-editor.tsx:31-39: parseFloat / v === "true").

    try_cast (not cast): Spark 4 ANSI mode throws on malformed numerics;
    the reference's parseFloat yields NaN — NULL is the SQL analogue.
    """
    if target_type in ("double", "float"):
        return value.try_cast("double")
    if target_type in ("long", "bigint", "int"):
        return value.try_cast("double").try_cast(target_type)  # parseFloat, trunc
    if target_type == "boolean":
        # coalesce mirrors JS `v === "true"`: a NULL input is false, not
        # NULL (the bare == null-propagates)
        return F.coalesce(value == "true", F.lit(False))
    return value.cast("string")


def display_value(col: Column, *, complex_type: bool = True) -> Column:
    """P4 display stringification: objects/arrays pretty-printed via
    ``to_json`` (the default); scalars as their plain string form
    (``complex_type=False``) — ``to_json`` accepts only struct/array/map,
    so the reference's typeof dispatch (data-editor.tsx:44-51
    ``getDisplayValue``) becomes an explicit caller flag."""
    if complex_type:
        return F.to_json(col, {"pretty": "true"})
    return col.cast("string")
