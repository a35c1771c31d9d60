"""Scalar column functions (SURVEY §2.7).

Reference parity:

* F1 influence score  (reference consumer1.py:55-59)
* F2 value-only string rewrite (reference consumer1.py:61-69)
* F4 filename-timestamp parse  (reference consumer2.py:56-59)
* F7 null-coalesce arithmetic  (reference consumer2.py:184-191)

plus ``stable_hash64`` — a cross-engine deterministic 60-bit hash used
by the dedup / MinHash / fingerprint extensions. It is md5-based so the
DuckDB oracle can reproduce it bit-for-bit (Spark's builtin ``hash`` is
murmur3 with Spark-specific seeding; DuckDB's ``hash`` is different —
md5 is the portable intersection, and at 100 TB the md5 cost is dwarfed
by the shuffle it feeds).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


def nz(col: Column | str, default: float = 0) -> Column:
    """F7: ``x or 0`` — null-coalesce used across all reference math
    (consumer1.py:56-58, consumer2.py:184-191)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def influence_score(followers: Column | str, statuses: Column | str,
                    friends: Column | str) -> Column:
    """F1: ``followers*0.5 + statuses*0.3 - friends*0.2`` with nulls→0
    (reference consumer1.py:55-59). Pure column expression — no UDF."""
    return (nz(followers) * F.lit(0.5)
            + nz(statuses) * F.lit(0.3)
            - nz(friends) * F.lit(0.2))


def rewrite_values(col: Column | str,
                   pairs: tuple[tuple[str, str], ...] = (
                       ("twitter", "x"), ("Twitter", "X"))) -> Column:
    """F2 (flat case): chained literal replacement on one string column.

    The reference walks arbitrarily nested dicts/lists rewriting string
    *values* only (consumer1.py:61-69). For flat string columns this is
    a chain of ``replace``; nested struct/array/map columns go through
    :func:`rewrite_values_nested`.
    """
    c = F.col(col) if isinstance(col, str) else col
    for old, new in pairs:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


def rewrite_values_nested(col: Column, dtype: T.DataType,
                          pairs: tuple[tuple[str, str], ...] = (
                              ("twitter", "x"), ("Twitter", "X"))) -> Column:
    """F2 (nested case): rewrite every string *value* at any depth of a
    struct/array/map column; map *keys* and field names are untouched —
    the reference rewrites dict values only (consumer1.py:63), a
    correctness trap a to_json/regex shortcut would fall into.

    Implemented as a recursive Column rebuild with ``transform`` /
    ``map_from_arrays`` — stays entirely in Catalyst (no UDF).
    """
    if isinstance(dtype, T.StringType):
        return rewrite_values(col, pairs)
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            col, lambda x: rewrite_values_nested(x, dtype.elementType, pairs))
    if isinstance(dtype, T.MapType):
        # keys untouched, values rewritten
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col),
                        lambda v: rewrite_values_nested(v, dtype.valueType, pairs)))
    if isinstance(dtype, T.StructType):
        return F.struct(*[
            rewrite_values_nested(col.getField(f.name), f.dataType, pairs)
            .alias(f.name)
            for f in dtype.fields
        ])
    return col


def parse_trailing_ts(name: Column | str) -> Column:
    """F4: extract the trailing ``_<unixts>.json`` integer from a file
    name (reference consumer2.py:56-59) as a long."""
    c = F.col(name) if isinstance(name, str) else name
    return F.regexp_extract(c, r"_(\d+)\.json$", 1).cast("long")


def stable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Deterministic cross-engine 60-bit hash of a string.

    ``conv(substr(md5(concat(seed, ':', s)), 1, 15), 16, 10)`` — the
    DuckDB oracle mirrors it as
    ``('0x' || substr(md5(seed || ':' || s), 1, 15))::BIGINT``.
    15 hex digits = 60 bits, always positive, fits a long.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(str(seed)), F.lit(":"), c)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def stable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB-side twin of :func:`stable_hash64` (oracle helper)."""
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT)"
