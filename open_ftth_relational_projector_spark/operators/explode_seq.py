"""Unnest-with-sequence-number (SURVEY §2.5 W1 + §2.6 X1).

The reference writes each ``Guid[]`` adjacency as rows numbered 1..n in array
order (Database/PostgresWriter.cs:56-65, 147-156). ``posexplode`` yields the
0-based position for free — no window, no sort, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def explode_with_seq(
    df: DataFrame,
    id_col: str,
    array_col: str,
    element_alias: str,
    seq_alias: str = "seq_no",
) -> DataFrame:
    """(id, [a, b, c]) → (id, a, 1), (id, b, 2), (id, c, 3)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(array_col)).alias("_pos", element_alias),
    ).select(
        id_col,
        element_alias,
        (F.col("_pos") + 1).cast("int").alias(seq_alias),
    )
