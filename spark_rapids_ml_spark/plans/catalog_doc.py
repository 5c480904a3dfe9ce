"""Generate QUERIES.md — the declared-operator catalog.

Usage: ``python -m spark_rapids_ml_spark.plans.catalog_doc``
One row per registered query: name, tags, oracle kind, bench flag,
and the first docstring line — the human-readable index of the
correctness contract (SURVEY.md §2.C maps the same names to §2.B rows).
"""

from __future__ import annotations

import inspect
from collections import Counter

from spark_rapids_ml_spark.registry import all_queries


def main() -> None:
    specs = all_queries()
    lines = [
        "# QUERIES — declared operator catalog",
        "",
        f"{len(specs)} declared queries; "
        f"{sum(1 for s in specs.values() if s.oracle)} with full DuckDB value-hash oracles, "
        f"{sum(1 for s in specs.values() if not s.oracle)} rows-only (each with a pytest gate); "
        f"{sum(1 for s in specs.values() if s.bench)} in the bench headline set.",
        "",
        "| query | tags | oracle | bench | summary |",
        "|---|---|---|---|---|",
    ]
    for name, spec in sorted(specs.items()):
        doc = inspect.getdoc(spec.fn) or ""
        summary = doc.splitlines()[0].strip() if doc else ""
        oracle = "duckdb" if spec.oracle else "rows-only"
        lines.append(
            f"| `{name}` | {', '.join(spec.tags)} | {oracle} | "
            f"{'✓' if spec.bench else ''} | {summary} |"
        )
    tag_counts = Counter(t for s in specs.values() for t in s.tags)
    lines += [
        "",
        "Tag counts: "
        + ", ".join(f"{t}={n}" for t, n in sorted(tag_counts.items())),
        "",
    ]
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote QUERIES.md ({len(specs)} queries)")


if __name__ == "__main__":
    main()
