"""Lint every catalog oracle for DuckDB-only result types.

The driver's t2 hasher fetches oracle results in a typed form (pandas/
arrow), so a DuckDB HUGEINT column (what integer SUM widens to) hashes
differently from Spark's BIGINT even when the values are equal — the
round-1 q12 failure. `scripts/check_oracle.py` normalizes values and
cannot see this, so this lint inspects the *declared* result types of
each oracle at sf0.001 and flags anything that has no Spark twin:

  HUGEINT / UHUGEINT  -> CAST(... AS BIGINT)
  DECIMAL(p,s)        -> CAST(... AS DOUBLE) (testdata money cols are doubles)
  UINTEGER/UBIGINT... -> cast to the signed width

Run: python scripts/lint_oracle_types.py [sf_dir]   (exit 1 on any flag)
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BAD_TOKENS = ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    flags = []
    oracles = entry_mod.oracle_sql()
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            types = [str(t).upper() for t in rel.types]
        except Exception as e:  # noqa: BLE001 - report and move on
            flags.append((name, f"oracle failed to plan: {e}"))
            continue
        for col, typ in zip(rel.columns, types):
            if any(tok in typ for tok in BAD_TOKENS):
                flags.append((name, f"column {col} is {typ}"))
    if flags:
        for name, msg in flags:
            print(f"FLAG {name}: {msg}")
        print(f"{len(flags)} flags over {len(oracles)} oracles")
        return 1
    print(f"OK: {len(oracles)} oracles, no DuckDB-only result types")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
