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

Detection is AST-based (`ast.walk` for ``orderBy`` attribute calls
whose receiver chain bottoms out at the ``Window`` class with no
``partitionBy`` link), so line-wrapped or formatter-split calls cannot
slip past a line regex, and prose in docstrings never false-positives.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_rapids_ml_spark",
)

# file -> {substring of the flagged call's source segment}: one entry
# per allowed unpartitioned-window site, each with the boundedness
# invariant it relies on.
ALLOWED = {
    "operators/windows.py": {
        'Window.orderBy("s_acctbal", "s_suppkey")',  # distribution ranks over the supplier DIM (10 rows/sf0.001 .. 100k/sf10, never fact-scale); fact-scale alternative named in the docstring
        'Window.orderBy("s_acctbal")',  # two range frames over the supplier DIM, same bound
    },
    "operators/timeseries.py": {
        'Window.orderBy("dur")',  # Kaplan-Meier risk-set cumsum: input is groupBy(dur) of day-resolution lifetimes — O(distinct durations) = time-range/day, not corpus rows
    },
    "operators/llm_pipeline.py": {
        'Window.orderBy(F.col("rem").desc(), "lang")',  # mixture apportionment: remainder rank over ONE ROW PER LANGUAGE (value-domain cardinality, ~dozens at any corpus scale), never fact-sized
    },
    "operators/scale_patterns.py": {
        'Window.orderBy("zkey", "l_orderkey", "l_linenumber")',  # Z-order VERIFICATION layer only (capped read-back); the production write is range-partitioned, no global window
    },
    "operators/textstats.py": {
        'Window.orderBy(F.col("c").desc(), "term")',  # vocab coverage: fed by the per-partition top-k_max prune above it — <= k_max * n_partitions rows
        'Window.orderBy(F.col("score_micro").desc(), "phrase")',  # RAKE: fed by the per-partition top-RAKE_TOP prune above it — <= RAKE_TOP * n_partitions rows
    },
}


from tests.audit_util import marker_matches as _marker_matches  # noqa: E402


def _receiver_chain_root(node: ast.expr) -> ast.expr:
    """Walk a method chain (a.b(...).c(...).d) down to its leftmost
    receiver expression."""
    while True:
        if isinstance(node, ast.Attribute):
            node = node.value
        elif isinstance(node, ast.Call):
            node = node.func
        else:
            return node


def _chain_has_partition_by(node: ast.expr) -> bool:
    """True if any call in the receiver chain is .partitionBy(...)."""
    while True:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if node.func.attr == "partitionBy":
                return True
            node = node.func.value
        elif isinstance(node, ast.Attribute):
            node = node.value
        else:
            return False


def _unpartitioned_window_calls(tree: ast.AST):
    """Yield Call nodes of the form Window[...].orderBy(...) (chain
    rooted at the Name `Window`) with no partitionBy link anywhere in
    the receiver chain."""
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)):
            continue
        if node.func.attr != "orderBy":
            continue
        root = _receiver_chain_root(node.func.value)
        if not (isinstance(root, ast.Name) and root.id == "Window"):
            continue
        if _chain_has_partition_by(node.func.value):
            continue
        yield node


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
            tree = ast.parse(src)
            allowed = ALLOWED.get(rel, set())
            for call in _unpartitioned_window_calls(tree):
                seg = ast.get_source_segment(src, call) or ""
                flat = " ".join(seg.split())
                if any(_marker_matches(m, flat) for m in allowed):
                    continue
                violations.append(f"{rel}:{call.lineno}: {flat[:120]}")
    assert not violations, (
        "unaudited unpartitioned window site(s) — a Window.orderBy with "
        "no partitionBy is a single-task total sort; add a per-partition "
        "top-k prune (textstats.py RAKE pattern) or add the site to "
        "tests/test_window_audit.py ALLOWED with a boundedness argument:\n"
        + "\n".join(violations)
    )


def test_allowlist_entries_still_exist():
    """Every allowlisted marker must still match a live call — stale
    entries would silently widen the gate as code moves."""
    stale = []
    for rel, markers in ALLOWED.items():
        path = os.path.join(PKG, rel)
        with open(path) as f:
            src = f.read()
        flat_src = " ".join(src.split())
        for m in markers:
            if " ".join(m.split()) not in flat_src:
                stale.append(f"{rel}: {m!r}")
    assert not stale, (
        "stale test_window_audit.py ALLOWED entries (site moved or "
        "removed — update the allowlist):\n" + "\n".join(stale)
    )


def test_detector_catches_wrapped_and_chained_forms():
    """The gate must see through formatter line-splits and frame
    chains — the shapes a regex missed."""
    wrapped = ast.parse(
        "w = Window.orderBy(\n    F.col('x').desc(),\n    'id',\n)"
    )
    assert len(list(_unpartitioned_window_calls(wrapped))) == 1
    chained = ast.parse("w = Window.orderBy('x').rowsBetween(-1, 0)")
    assert len(list(_unpartitioned_window_calls(chained))) == 1
    partitioned = ast.parse("w = Window.partitionBy('g').orderBy('x')")
    assert not list(_unpartitioned_window_calls(partitioned))
    partitioned_after = ast.parse(
        "w = Window.orderBy('x')\n"  # flagged
        "v = Window.partitionBy('g').orderBy('x').rangeBetween(0, 1)"  # fine
    )
    assert len(list(_unpartitioned_window_calls(partitioned_after))) == 1
