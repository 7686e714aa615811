#!/usr/bin/env python
"""Regenerate QUERIES.md — the full registered-query inventory (name,
check mode, tags, description) straight from the registry, so the doc
can never drift from the code. Run: python tools/gen_query_inventory.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ytspark.queries import registry

    reg = registry()
    lines = [
        "# Query inventory (auto-generated — `python tools/gen_query_inventory.py`)",
        "",
        f"{len(reg)} registered queries. Check mode: **oracle** = DuckDB SQL",
        "value-hash match at sf0.01 (the driver's t2 gate); **rows-only** =",
        "hash-function-dependent / approximate / iterative result, driver",
        "records row-count + schema only.",
        "",
        "| Query | Check | Tags | What it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        check = "oracle" if q.oracle else "rows-only"
        doc = " ".join(q.doc.split())
        tags = ", ".join(q.tags)
        lines.append(f"| `{name}` | {check} | {tags} | {doc} |")
    lines.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "QUERIES.md"), "w") as f:
        f.write("\n".join(lines))
    n_oracle = sum(1 for q in reg.values() if q.oracle)
    print(f"QUERIES.md: {len(reg)} queries ({n_oracle} oracle, "
          f"{len(reg) - n_oracle} rows-only)")


if __name__ == "__main__":
    main()
