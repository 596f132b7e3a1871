#!/usr/bin/env python
"""Regenerate docs/QUERIES.md from the registry docstrings."""
import re, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# Query catalog

Every registered query in `plans/queries.py`, surfaced through
`__spark_entry__.queries()` with a DuckDB twin in `oracle_sql()`.
The driver certifies each row-count/schema/value-hash at sf0.01.

| Query | What it verifies |
|---|---|
"""


def main():
    import __spark_entry__ as entry
    qs = entry.queries()
    lines = [HEADER]
    for name, fn in qs.items():
        doc = (fn.__doc__ or "").strip()
        doc = re.sub(r"\s+", " ", doc)
        if len(doc) > 220:
            doc = doc[:217].rstrip() + "..."
        doc = doc.replace("|", "\\|")
        lines.append(f"| `{name}` | {doc} |\n")
    open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md"), "w").write("".join(lines))
    print(f"{len(qs)} rows")


if __name__ == "__main__":
    main()
