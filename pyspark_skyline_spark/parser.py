"""Parser for the reference's query grammar: ``SKYLINE OF c1 MIN, c2 MAX, ...``.

The reference parser (src/utils/functions.py:303-333) only scans for the
ordered MIN/MAX tokens and treats column names as positional convention.
This parser is compatible with that grammar but additionally captures and
validates column names, so queries run against arbitrary DataFrames
(not just ``x1..xd``).
"""

from __future__ import annotations

import re

__all__ = ["parse_skyline_query"]

_QUERY_RE = re.compile(r"^\s*SKYLINE\s+OF\s+(.+)$", re.IGNORECASE | re.DOTALL)
_CLAUSE_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_.]*)\s+(MIN|MAX)\s*$", re.IGNORECASE)


def parse_skyline_query(query: str) -> list[tuple[str, str]]:
    """``"SKYLINE OF a MIN, b MAX"`` -> ``[("a", "min"), ("b", "max")]``.

    Raises ``ValueError`` on malformed queries (unlike the reference,
    which silently ignores anything that is not a MIN/MAX token).
    """
    m = _QUERY_RE.match(query)
    if not m:
        raise ValueError(f"not a skyline query (expected 'SKYLINE OF ...'): {query!r}")
    dims: list[tuple[str, str]] = []
    for clause in m.group(1).split(","):
        cm = _CLAUSE_RE.match(clause)
        if not cm:
            raise ValueError(f"bad skyline clause {clause!r} (expected '<col> MIN|MAX')")
        dims.append((cm.group(1), cm.group(2).lower()))
    if not dims:
        raise ValueError("skyline query needs at least one dimension")
    return dims
