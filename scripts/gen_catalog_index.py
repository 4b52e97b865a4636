"""Generate CATALOG.md: every registered query in registration (driver-
window) order, grouped by the catalog's section banners, with its oracle
status — the map from SURVEY §2 / extension families to concrete query
names. Run: python scripts/gen_catalog_index.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> None:
    import __spark_entry__ as entry_mod

    osql = entry_mod.oracle_sql()
    qs = list(entry_mod.queries())

    # map each query name to the section banner above its registration
    src = open("open_ftth_relational_projector_spark/catalog.py").read()
    sections: dict[str, str] = {}
    current = "header"
    for line in src.splitlines():
        m = re.match(r"#\s*=+\s*$", line)
        if m:
            continue
        mh = re.match(r"#\s*\d+\.\s*(.+?)\s*$", line) or re.match(
            r"#\s*---\s*(.+?)\s*-*\s*$", line
        )
        if mh:
            current = mh.group(1).rstrip(" -")
        mq = re.match(r'@_q\(\s*$', line) or re.match(r'@_q\("([a-z0-9_]+)"', line)
        if mq and mq.groups() and mq.group(1):
            sections[mq.group(1)] = current
    # two-line @_q( form: associate on the following "name", line
    pend = False
    for line in src.splitlines():
        mh = re.match(r"#\s*\d+\.\s*(.+?)\s*$", line) or re.match(
            r"#\s*---\s*(.+?)\s*-*\s*$", line
        )
        if mh:
            current = mh.group(1).rstrip(" -")
        if pend:
            mn = re.match(r'\s*"([a-z0-9_]+)"', line)
            if mn:
                sections.setdefault(mn.group(1), current)
            pend = False
        if re.match(r"@_q\(\s*$", line):
            pend = True

    out = [
        "# Catalog index",
        "",
        f"{len(qs)} queries, {len(osql)} with a DuckDB SQL oracle "
        "(the rest are rows-only approximate paths whose oracled twins "
        "run the same machinery). Order below = `queries()` registration "
        "order; the grading driver records the first 50 per round.",
        "",
        "| # | query | oracle | section |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(qs, 1):
        mark = "sql" if name in osql else "rows-only"
        out.append(f"| {i} | `{name}` | {mark} | {sections.get(name, '—')} |")
    open("CATALOG.md", "w").write("\n".join(out) + "\n")
    print(f"CATALOG.md: {len(qs)} queries indexed")


if __name__ == "__main__":
    main()
