"""Declarative data-quality expectations — the dbt-test/Great-Expectations
surface a data platform runs against every landed table.

A rule set compiles into ONE aggregation pass per table (every rule is a
conditional count folded map-side), plus one broadcast anti-join per
referential rule — never a per-rule scan. Output is the audit table a
pipeline gates on: (table, rule, column, n_violations, passed).

Supported rules:
  * not_null(col)
  * unique(col)                 — duplicate ROWS beyond the first per value
  * accepted_range(col, lo, hi) — violations outside [lo, hi]
  * accepted_values(col, vals)
  * refers_to(col, other_df, other_col) — orphaned foreign keys

Scale notes: not_null/range/values fold in the same single aggregation;
unique adds one keyed groupBy (map-side combined — duplicate detection is
count>1 per value, the payload is distinct keys); refers_to broadcasts the
referenced KEY SET when it is a dimension (the normal case), so the fact
table never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_expectations(
    df: DataFrame,
    table: str,
    rules: list[dict],
) -> DataFrame:
    """Run all rules; return (table, rule, column, n_violations, passed)
    with one row per rule, deterministic order by (rule, column)."""
    spark = df.sparkSession
    agg_exprs = []
    agg_meta = []
    extra_frames = []
    for r in rules:
        kind, col = r["rule"], r["column"]
        if kind == "not_null":
            cond = F.col(col).isNull()
        elif kind == "accepted_range":
            cond = ~F.col(col).between(r["lo"], r["hi"]) | F.col(col).isNull()
        elif kind == "accepted_values":
            cond = ~F.col(col).isin(r["values"]) | F.col(col).isNull()
        elif kind == "unique":
            dup = (
                df.groupBy(col)
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("n") > 1, F.col("n") - 1)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_violations")
                )
                .select(
                    F.lit(table).alias("table"),
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("column"),
                    "n_violations",
                )
            )
            extra_frames.append(dup)
            continue
        elif kind == "refers_to":
            keys = r["ref"].select(F.col(r["ref_column"]).alias("__k")).distinct()
            orphans = (
                df.filter(F.col(col).isNotNull())
                .join(F.broadcast(keys), df[col] == keys["__k"], "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(
                    F.lit(table).alias("table"),
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("column"),
                    "n_violations",
                )
            )
            extra_frames.append(orphans)
            continue
        else:
            raise ValueError(f"unknown rule: {kind!r}")
        agg_exprs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(
                f"{kind}__{col}"
            )
        )
        agg_meta.append((kind, col))

    frames = list(extra_frames)
    if agg_exprs:
        one = df.agg(*agg_exprs)
        stacked = one.selectExpr(
            "stack({n}, {args}) AS (rule_col, n_violations)".format(
                n=len(agg_meta),
                args=", ".join(
                    f"'{kind}__{col}', `{kind}__{col}`"
                    for kind, col in agg_meta
                ),
            )
        ).select(
            F.lit(table).alias("table"),
            F.split("rule_col", "__").getItem(0).alias("rule"),
            F.split("rule_col", "__").getItem(1).alias("column"),
            "n_violations",
        )
        frames.append(stacked)
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.select(
        "table",
        "rule",
        "column",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule", "column")
