"""Shared helpers for the AST audit gates (window / crossjoin /
collect-agg / driver-hops): allowlist markers are matched at an
identifier boundary so a new violating site whose text contains a
marker as a substring can never ride an existing exemption (the
round-10 advice). One definition — the boundary logic is asymmetric
(prefix boundary always required; suffix boundary only when the
marker itself ends in an identifier character) and subtle enough that
three diverging copies were a drift risk flagged in round 11.
"""

from __future__ import annotations

import re


def marker_matches(marker: str, flat: str) -> bool:
    """Whitespace-flattened ``marker`` present in ``flat`` at an
    identifier boundary on both ends (so 'nt.f(nc)' can never be
    satisfied by 'giant.f(nc)', and 'f(sa)' never by 'f(sab)')."""
    m = " ".join(marker.split())
    for match in re.finditer(re.escape(m), flat):
        s, e = match.start(), match.end()
        pre_ok = s == 0 or not (flat[s - 1].isalnum() or flat[s - 1] == "_")
        post_ok = e == len(flat) or not (
            (flat[e].isalnum() or flat[e] == "_") and (m[-1].isalnum() or m[-1] == "_")
        )
        if pre_ok and post_ok:
            return True
    return False
