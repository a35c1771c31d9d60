"""Scalar / column-level function layer (SURVEY §2.7-2.8).

Everything here is a pure Column expression (JVM-side, codegen'd) unless
explicitly noted — the reference's per-record Python functions
(consumer1.py:55-69) become Catalyst expressions, never row-at-a-time
UDFs.
"""

from .scalar import (  # noqa: F401
    influence_score,
    nz,
    parse_trailing_ts,
    rewrite_values,
    stable_hash64,
)
