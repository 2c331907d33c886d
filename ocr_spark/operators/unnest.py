"""Unnesting / wide-row assembly (reference U1+U2 and P1).

The reference's Sheets writer loops over ``data.présences`` emitting one row
per student with the 7 doc-level fields repeated, and emits exactly one row
with empty student fields when the list is empty
(reference: src/ai/flows/save-to-google-sheet.ts:188-215).  In Spark that is
``explode_outer`` + coalesce-to-"" — declarative, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMMON_FIELDS = [
    "classe",
    "cours",
    "date",
    "nom_du_professeur",
    "nombre_des_présents",
    "salle_n",
    "séance",
]


def explode_presences(records: DataFrame, key_col: str = "url") -> DataFrame:
    """(key, fields struct) -> one wide row per student (U1+U2 semantics).

    Empty ``présences`` -> exactly one row with ``n="" nom_prénom=""``
    (save-to-google-sheet.ts:199-215); doc-level fields coalesce to their
    ""/0 defaults (P1, save-to-google-sheet.ts:189-197).
    """
    exploded = records.select(
        F.col(key_col),
        *[F.col(f"fields.{c}").alias(c) for c in COMMON_FIELDS],
        F.explode_outer(F.col("fields.présences")).alias("_s"),
    )
    return exploded.select(
        key_col,
        F.coalesce("classe", F.lit("")).alias("classe"),
        F.coalesce("cours", F.lit("")).alias("cours"),
        F.coalesce("date", F.lit("")).alias("date"),
        F.coalesce("nom_du_professeur", F.lit("")).alias("nom_du_professeur"),
        F.coalesce("nombre_des_présents", F.lit(0)).alias("nombre_des_présents"),
        F.coalesce("salle_n", F.lit("")).alias("salle_n"),
        F.coalesce("séance", F.lit("")).alias("séance"),
        F.coalesce(F.col("_s.n"), F.lit("")).alias("n"),
        F.coalesce(F.col("_s.nom_prénom"), F.lit("")).alias("nom_prénom"),
    )
