"""Regenerate INVENTORY.md: the machine-derived registry inventory.

Usage: python tools/make_inventory.py

COVERAGE.md is the narrative crosswalk (SURVEY §2 IDs -> impl); this
file is the mechanical complement — generated FROM the registry, so
its counts cannot drift from the code the way hand-written docs can.
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402


def main() -> None:
    _ensure_loaded()
    n = len(REGISTRY)
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    n_bench = sum(1 for s in REGISTRY.values() if s.bench)
    tag_counts = Counter(t for s in REGISTRY.values() for t in s.tags)

    lines = [
        "# INVENTORY — generated from the query registry",
        "",
        "Regenerate with `python tools/make_inventory.py`; do not edit.",
        "",
        f"**{n} registered queries; {n_oracle} with exact DuckDB oracles"
        f" ({n - n_oracle} rows-only); {n_bench} in the bench headline set.**",
        "",
        "Tag histogram: "
        + ", ".join(f"{t} ({c})" for t, c in tag_counts.most_common()),
        "",
        "| query | tags | oracle | bench | summary |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        s = REGISTRY[name]
        first = (s.doc or "").strip().splitlines()
        summary = first[0].strip() if first else ""
        if len(summary) > 90:
            summary = summary[:87] + "..."
        summary = summary.replace("|", "\\|")
        tag_cell = ", ".join(s.tags).replace("|", "\\|")
        lines.append(
            f"| `{name}` | {tag_cell} |"
            f" {'exact' if s.oracle else 'rows-only'} |"
            f" {'y' if s.bench else ''} | {summary} |"
        )
    (ROOT / "INVENTORY.md").write_text("\n".join(lines) + "\n")
    print(f"wrote INVENTORY.md: {n} queries, {n_oracle} oracled, {n_bench} benched")


if __name__ == "__main__":
    main()
