"""CI guard: every `crossJoin` in engine code must either broadcast
its argument explicitly (`F.broadcast(...)` as the cross join's OWN
argument, not merely nearby) or be on the audited bounded-side
allowlist.

A cross join whose both sides scale with the data is the canonical
100 TB catastrophe (|A|x|B| rows). Every allowed site below attaches a
side that is provably tiny — a 1-row scalar aggregate, a value-domain
dimension, or a fixed demo dim — never a fact table. Adding a new
`crossJoin` requires F.broadcast around its argument or an entry here
WITH its boundedness argument — the same review gate
tests/test_driver_hops.py and tests/test_window_audit.py automate for
driver hops and unpartitioned windows.

Detection is AST-based: the exemption requires the broadcast call to
be INSIDE the crossJoin argument expression itself, so a broadcast of
some unrelated frame on a neighboring line can never mask an
unbounded cross join; line-wrapped calls are seen whole.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_rapids_ml_spark",
)

# file -> {substring of the flagged call's flattened source segment}:
# one entry per allowed non-broadcast crossJoin, each with the
# boundedness invariant.
ALLOWED = {
    "ml_queries.py": {
        "tok_te.crossJoin(classes)",  # Naive Bayes scoring fan-out by the LABEL DOMAIN (|classes| = distinct o_orderpriority = 5), never fact-sized
    },
    "operators/aggregates.py": {
        "sa.crossJoin(sb)",  # KMV sketch union: sa and sb are each ONE aggregated sketch-summary row
        "stats.crossJoin(ex)",  # exact-count + intersection-estimate verdict attaches: ex and ni are ONE row each (global aggs); the short marker matches both the inner call and the chained outer
    },
    "operators/scale_patterns.py": {
        'dup_keys.crossJoin(c.agg(F.count(F.lit(1)).alias("n_checked")))',  # DQ check: both sides 1-row global aggregates
        'orphans.crossJoin(o.agg(F.count(F.lit(1)).alias("n_checked")))',  # DQ check: both sides 1-row global aggregates
    },
    "operators/dedup.py": {
        "nt.crossJoin(nc)",  # recall verdict: three 1-row scalar attaches (nc/nh are 1-row counts; matches inner and chained outer)
    },
    "operators/graph.py": {
        "n_edges.crossJoin(wedges)",  # clustering-coefficient verdict: 1-row scalar aggregates (edge/wedge/triangle counts; matches inner and chained outer)
    },
    "operators/joins.py": {
        "r.crossJoin(n)",  # declared CROSS JOIN demo over the region x nation dims (25x5), docstring says never fact-sized
    },
    "operators/curation.py": {
        "sizes.crossJoin(union_size)",  # bitmap-jaccard verdict: two 1-row frames
    },
}


def _arg_is_broadcast(node: ast.expr) -> bool:
    """True only when the cross join's argument IS a broadcast: its
    outermost call is broadcast(...) or its receiver chain bottoms out
    at one (F.broadcast(x).select(...)). Deliberately does NOT walk
    into call ARGUMENTS — a broadcast nested inside a fact-sized
    argument (big.crossJoin(huge.join(F.broadcast(dim), 'k'))) must
    not exempt the unbounded cross join (round-10 advice)."""
    while True:
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Attribute) and fn.attr == "broadcast":
                return True
            if isinstance(fn, ast.Name) and fn.id == "broadcast":
                return True
            node = fn  # descend the receiver chain, never the args
        elif isinstance(node, ast.Attribute):
            node = node.value
        else:
            return False


from tests.audit_util import marker_matches as _marker_matches  # noqa: E402


def _crossjoin_calls(tree: ast.AST):
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "crossJoin"
        ):
            yield node


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
            tree = ast.parse(src)
            allowed = ALLOWED.get(rel, set())
            for call in _crossjoin_calls(tree):
                # exemption: the broadcast must BE the crossJoin's own
                # argument (outermost call / receiver-chain root) — a
                # broadcast elsewhere, or nested inside a fact-sized
                # argument, doesn't count
                if call.args and _arg_is_broadcast(call.args[0]):
                    continue
                seg = ast.get_source_segment(src, call) or ""
                flat = " ".join(seg.split())
                if any(_marker_matches(m, flat) for m in allowed):
                    continue
                violations.append(f"{rel}:{call.lineno}: {flat[:140]}")
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
        flat_src = " ".join(src.split())
        for m in markers:
            if not _marker_matches(m, flat_src):
                stale.append(f"{rel}: {m!r}")
    assert not stale, (
        "stale test_crossjoin_audit.py ALLOWED entries:\n" + "\n".join(stale)
    )


def test_exemption_requires_broadcast_inside_the_argument():
    """A broadcast of an UNRELATED frame nearby must not exempt the
    cross join — the defect the AST rewrite exists to close."""
    masked = ast.parse(
        "x = big.crossJoin(huge)\n"
        "y = other.join(F.broadcast(dim), 'k')\n"
    )
    calls = list(_crossjoin_calls(masked))
    assert len(calls) == 1
    assert not _arg_is_broadcast(calls[0].args[0])


def test_exemption_requires_broadcast_as_the_argument_root():
    """A broadcast nested inside a fact-sized argument must not exempt
    the cross join; a broadcast at the argument root (even under later
    chained methods) must."""
    nested = ast.parse("x = big.crossJoin(huge.join(F.broadcast(dim), 'k'))")
    call = next(iter(_crossjoin_calls(nested)))
    assert not _arg_is_broadcast(call.args[0])
    rooted = ast.parse("x = big.crossJoin(F.broadcast(dim).select('a'))")
    call = next(iter(_crossjoin_calls(rooted)))
    assert _arg_is_broadcast(call.args[0])


def test_marker_requires_identifier_boundary():
    assert not _marker_matches("nt.crossJoin(nc)", "z = giant.crossJoin(nc)")
    assert _marker_matches("nt.crossJoin(nc)", "z = nt.crossJoin(nc)")
    # line-wrapped broadcast argument still exempts
    ok = ast.parse("x = big.crossJoin(\n    F.broadcast(one_row)\n)")
    (call,) = list(_crossjoin_calls(ok))
    assert _arg_is_broadcast(call.args[0])
