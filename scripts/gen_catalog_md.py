#!/usr/bin/env python
"""Regenerate CATALOG.md: one line per catalog entry — name, the first
docstring sentence, and whether the driver window covers it. Run after
adding entries; commit the result."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def first_sentence(doc: str | None) -> str:
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text.split(stop)[0] + "."
    return text if text.endswith(".") else text + "."


def main() -> None:
    from etl_stream_spark.catalog import CATALOG, _DRIVER_PRIORITY

    window = set(_DRIVER_PRIORITY)
    lines = [
        "# Query catalog",
        "",
        "Every entry is a (Spark DataFrame function, DuckDB oracle SQL) pair",
        "checked by `scripts/check_correctness.py` (row count, column names,",
        "order-insensitive value hash). `window` marks membership in the",
        "driver's 50-entry verification window (`_DRIVER_PRIORITY`).",
        "",
        f"{len(CATALOG)} entries. Regenerate with",
        "`python scripts/gen_catalog_md.py`.",
        "",
        "| entry | window | summary |",
        "|---|---|---|",
    ]
    for name, qd in CATALOG.items():
        mark = "✓" if name in window else ""
        summary = first_sentence(qd.fn.__doc__).replace("|", "\\|")
        lines.append(f"| `{name}` | {mark} | {summary} |")
    out = os.path.join(REPO, "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(CATALOG)} entries")


if __name__ == "__main__":
    main()
