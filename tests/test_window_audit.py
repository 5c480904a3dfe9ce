"""CI guard: every unpartitioned window (`Window.orderBy` with no
`partitionBy`) in engine code must be on the audited bounded-input
allowlist.

An unpartitioned window is a single-reducer total sort — the whole
input funnels through ONE task. At 100 TB that is the difference
between "runs" and "one straggler holds the stage"; the round-9
verdict's HITS finding was exactly this shape. Each allowed site below
feeds the window something bounded by a dimension size, a top-k prune,
or a value-domain cardinality — never by fact-table volume. Adding a
new `Window.orderBy(...)` without `partitionBy` requires adding it
here WITH its boundedness argument — the review gate this test
automates (round-10 follow-up to the HITS fix; companion to
tests/test_driver_hops.py which pins the same discipline for driver
materializations).
"""

from __future__ import annotations

import io
import os
import re
import tokenize

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_rapids_ml_spark",
)

# file -> {substring that must appear on the flagged line}: one entry
# per allowed unpartitioned-window site, each with the boundedness
# invariant it relies on.
ALLOWED = {
    "operators/windows.py": {
        'Window.orderBy("s_acctbal", "s_suppkey")',  # distribution ranks over the supplier DIM (10 rows/sf0.001 .. 100k/sf10, never fact-scale); fact-scale alternative named in the docstring
        'Window.orderBy("s_acctbal").rangeBetween(-500, Window.currentRow)',  # range frame over the supplier DIM, same bound
        'Window.orderBy("s_acctbal").rangeBetween(-500, 500)',  # centered range frame over the supplier DIM, same bound
    },
    "operators/timeseries.py": {
        'Window.orderBy("dur").rowsBetween',  # Kaplan-Meier risk-set cumsum: input is groupBy(dur) of day-resolution lifetimes — O(distinct durations) = time-range/day, not corpus rows
    },
    "operators/scale_patterns.py": {
        'Window.orderBy("zkey", "l_orderkey", "l_linenumber")',  # Z-order VERIFICATION layer only (capped read-back); the production write is range-partitioned, no global window
    },
    "operators/textstats.py": {
        'Window.orderBy(F.col("c").desc(), "term")',  # vocab coverage: fed by the per-partition top-k_max prune above it — <= k_max * n_partitions rows
        'Window.orderBy(F.col("score_micro").desc(), "phrase")',  # RAKE: fed by the per-partition top-RAKE_TOP prune above it — <= RAKE_TOP * n_partitions rows
    },
}

# an unpartitioned window is `Window.orderBy(` or `Window().orderBy(`;
# `Window.partitionBy(...).orderBy(...)` never matches this.
PATTERN = re.compile(r"Window(\(\))?\.orderBy\(")


def _code_lines(src: str) -> set[int]:
    """Line numbers that carry real code tokens (docstrings, string
    literals, and comments excluded) — so prose mentioning
    Window.orderBy never trips the gate."""
    lines: set[int] = set()
    skip = {
        tokenize.STRING,
        tokenize.COMMENT,
        tokenize.NL,
        tokenize.NEWLINE,
        tokenize.INDENT,
        tokenize.DEDENT,
        tokenize.ENCODING,
    }
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type in skip:
            continue
        for ln in range(tok.start[0], tok.end[0] + 1):
            lines.add(ln)
    return lines


def test_no_unaudited_unpartitioned_windows():
    violations = []
    for dirpath, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path) as f:
                src = f.read()
            lines = src.splitlines()
            code = _code_lines(src)
            allowed = ALLOWED.get(rel, set())
            for i, line in enumerate(lines, 1):
                if i not in code:
                    continue
                if not PATTERN.search(line):
                    continue
                if any(marker in line for marker in allowed):
                    continue
                violations.append(f"{rel}:{i}: {line.strip()}")
    assert not violations, (
        "unaudited unpartitioned window site(s) — a Window.orderBy with "
        "no partitionBy is a single-task total sort; add a per-partition "
        "top-k prune (textstats.py RAKE pattern) or add the site to "
        "tests/test_window_audit.py ALLOWED with a boundedness argument:\n"
        + "\n".join(violations)
    )


def test_allowlist_entries_still_exist():
    """Every allowlisted marker must still match a live line — stale
    entries would silently widen the gate as code moves."""
    stale = []
    for rel, markers in ALLOWED.items():
        path = os.path.join(PKG, rel)
        with open(path) as f:
            src = f.read()
        for m in markers:
            if m not in src:
                stale.append(f"{rel}: {m!r}")
    assert not stale, (
        "stale test_window_audit.py ALLOWED entries (site moved or "
        "removed — update the allowlist):\n" + "\n".join(stale)
    )
