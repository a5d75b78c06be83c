"""ECMA-262 → Java-regex dialect handling for ``pattern`` keywords.

The reference translates ECMA regexes to the Rust dialect on the driver
(``crates/jsonschema/src/ecma.rs:8-70``) and caches compiled programs
(``keywords/pattern.rs:15-58``).  Our execution dialect is Java
(``Column.rlike`` → compiled once per task by Catalyst, which subsumes the
reference's LRU cache).  Java regex is a near-superset of ECMA for the
patterns that appear in schemas (lookarounds included), so translation is a
small set of rewrites plus a compatibility check; anything unexpressible
falls back to an Arrow-batched pandas UDF using Python ``re``.

Semantics: JSON Schema ``pattern`` is a *search* (unanchored), which matches
``rlike`` exactly.
"""

from __future__ import annotations

import re


def ecma_to_java(pattern: str) -> str | None:
    """Translate an ECMA-262 pattern to Java regex.

    Returns None when the pattern needs the Python-``re`` fallback.
    Rewrites mirror the cases in the reference's ``ecma.rs``:
    - ``\\cX``  control escapes      → ``\\x{...}``
    - ``$`` / ``^`` are fine (both dialects: line anchors without MULTILINE
      behave as string anchors for our single-line values)
    - ``\\d \\w \\s`` are ASCII in ECMA; Java defaults match (no UNICODE flag)
    - ``\\uXXXX`` is valid in both
    """
    out = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "c" and i + 2 < n and pattern[i + 2].isalpha():
                out.append("\\x{%02x}" % (ord(pattern[i + 2].upper()) - 64))
                i += 3
                continue
            out.append(ch)
            out.append(nxt)
            i += 2
            continue
        out.append(ch)
        i += 1
    java = "".join(out)
    # sanity-compile with Python re as a syntactic proxy; Java accepts a
    # superset of what passes here for the constructs we emit.
    try:
        re.compile(java)
    except re.error:
        return None
    return java


def needs_python_fallback(pattern: str) -> bool:
    return ecma_to_java(pattern) is None
