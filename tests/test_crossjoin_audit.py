"""CI guard: every `crossJoin` in engine code must either broadcast
its small side explicitly (`F.broadcast(...)` in the call's immediate
context) or be on the audited bounded-side allowlist.

A cross join whose both sides scale with the data is the canonical
100 TB catastrophe (|A|x|B| rows). Every allowed site below attaches a
side that is provably tiny — a 1-row scalar aggregate, a value-domain
dimension, or a fixed demo dim — never a fact table. Adding a new
`crossJoin` requires F.broadcast on the small side or an entry here
WITH its boundedness argument — the same review gate
tests/test_driver_hops.py and tests/test_window_audit.py automate for
driver hops and unpartitioned windows.
"""

from __future__ import annotations

import io
import os
import tokenize

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_rapids_ml_spark",
)

# file -> {substring matching the flagged line}: one entry per allowed
# non-broadcast crossJoin, each with the boundedness invariant.
ALLOWED = {
    "ml_queries.py": {
        "tok_te.crossJoin(classes)",  # Naive Bayes scoring fan-out by the LABEL DOMAIN (|classes| = distinct o_orderpriority = 5), never fact-sized
    },
    "operators/aggregates.py": {
        "stats = sa.crossJoin(sb).withColumn(",  # KMV sketch union: sa and sb are each ONE aggregated sketch-summary row
        "stats.crossJoin(ex)",  # exact-count verdict attach: ex is ONE row (global agg)
        ".crossJoin(ni)",  # KMV intersection estimate attach: ni is ONE row
    },
    "operators/scale_patterns.py": {
        'uniq_chk = dup_keys.crossJoin(c.agg(F.count(F.lit(1)).alias("n_checked")))',  # DQ check: both sides 1-row global aggregates
        'fk_chk = orphans.crossJoin(o.agg(F.count(F.lit(1)).alias("n_checked")))',  # DQ check: both sides 1-row global aggregates
    },
    "operators/dedup.py": {
        "nt.crossJoin(nc)",  # recall verdict: three 1-row scalar attaches
        ".crossJoin(nh)",  # recall verdict: 1-row hit count
    },
    "operators/graph.py": {
        "n_edges.crossJoin(wedges)",  # clustering-coefficient verdict: 1-row scalar aggregates
        ".crossJoin(tri)",  # triangle count: ONE row
    },
    "operators/joins.py": {
        "return r.crossJoin(n)",  # declared CROSS JOIN demo over the region x nation dims (25x5), docstring says never fact-sized
    },
    "operators/curation.py": {
        "sizes.crossJoin(union_size)",  # bitmap-jaccard verdict: two 1-row frames
    },
}


def _code_lines(src: str) -> set[int]:
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


def test_no_unaudited_crossjoins():
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
                if i not in code or ".crossJoin(" not in line:
                    continue
                # explicit broadcast in the call's immediate context
                # (the argument often starts on the following line)
                ctx = "\n".join(lines[i - 1 : i + 2])
                if "F.broadcast(" in ctx:
                    continue
                if any(marker in line for marker in allowed):
                    continue
                violations.append(f"{rel}:{i}: {line.strip()}")
    assert not violations, (
        "unaudited crossJoin site(s) — wrap the small side in "
        "F.broadcast(...) or add the site to tests/test_crossjoin_audit.py "
        "ALLOWED with a boundedness argument:\n" + "\n".join(violations)
    )


def test_allowlist_entries_still_exist():
    stale = []
    for rel, markers in ALLOWED.items():
        path = os.path.join(PKG, rel)
        with open(path) as f:
            src = f.read()
        for m in markers:
            if m not in src:
                stale.append(f"{rel}: {m!r}")
    assert not stale, (
        "stale test_crossjoin_audit.py ALLOWED entries:\n" + "\n".join(stale)
    )
