"""Generate CATALOG.md: every registered query in registration (driver-
window) order, grouped by the catalog package's family modules, with its
oracle status — the map from SURVEY §2 / extension families to concrete
query names. Run: python scripts/gen_catalog_index.py
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

sys.path.insert(0, ".")

PKG = Path("open_ftth_relational_projector_spark/catalog")


def main() -> None:
    import __spark_entry__ as entry_mod

    osql = entry_mod.oracle_sql()
    qs = list(entry_mod.queries())

    # map each query name to its family module (first docstring line)
    sections: dict[str, str] = {}
    for mod in PKG.glob("*.py"):
        if mod.name.startswith("_"):
            continue
        src = mod.read_text()
        tree = ast.parse(src)
        label = (ast.get_docstring(tree) or mod.stem).splitlines()[0].rstrip(".")
        for name in re.findall(r'@_q\(\s*"([a-z0-9_]+)"', src):
            sections[name] = label

    out = [
        "# Catalog index",
        "",
        f"{len(qs)} queries, {len(osql)} with a DuckDB SQL oracle "
        "(the rest are rows-only approximate paths whose oracled twins "
        "run the same machinery). Order below = `queries()` registration "
        "order; the grading driver records the first 50 per round.",
        "",
        "| # | query | oracle | family |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(qs, 1):
        mark = "sql" if name in osql else "rows-only"
        out.append(f"| {i} | `{name}` | {mark} | {sections.get(name, chr(8212))} |")
    Path("CATALOG.md").write_text("\n".join(out) + "\n")
    print(f"CATALOG.md: {len(qs)} queries indexed")


if __name__ == "__main__":
    main()
