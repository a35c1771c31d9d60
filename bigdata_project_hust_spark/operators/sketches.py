"""Deterministic cross-engine sketches.

Spark's native ``approx_count_distinct`` (HLL++) is engine-internal:
its registers — and therefore its estimate — can't be reproduced by
any other system, which is why the ``approx_distinct`` query is a
rows-only check. This module implements HyperLogLog from its
definition (Flajolet et al. 2007) on the shared ``stable_hash64``,
making the ENTIRE sketch — registers, zero count, estimate —
bit-identical on any engine that can hash and compare integers. The
price is a fixed m=256 register file; the payoff is that an
approximate operator becomes value-hash verifiable.

Scale shape: one hash-aggregate to max 256 registers (map-side
combine collapses every partition to <= 256 rows before the
exchange), then a 256-row fold on a single tiny row. The input scan
is the only data-sized work at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalar import stable_hash64, stable_hash64_sql

HLL_M = 256            # registers (b = 8 index bits)
_HLL_W_BITS = 52       # 60-bit hash minus 8 index bits
# alpha_m * m^2 computed HERE and embedded as one literal in both
# engines — no cross-engine transcendental arithmetic anywhere
HLL_ALPHA_M2 = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M


def _rho(w: Column) -> Column:
    """Position of the first 1-bit of the 52-bit suffix (1-based from
    the MSB); 53 when the suffix is all zeros. A pure integer
    comparison chain — engines disagree about log2() ulps, never
    about ``w >= 2^k``."""
    # chain via .when() in DESCENDING threshold order — wrapping an
    # accumulated .otherwise() instead would put the LAST-built branch
    # outermost and return 52 for every nonzero w
    expr = F.when(w >= F.lit(1 << (_HLL_W_BITS - 1)), F.lit(1))
    for k in range(1, _HLL_W_BITS):       # k = 1 .. 51
        expr = expr.when(w >= F.lit(1 << (_HLL_W_BITS - 1 - k)),
                         F.lit(k + 1))
    return expr.otherwise(F.lit(_HLL_W_BITS + 1))


def _rho_sql(w: str) -> str:
    branches = "".join(
        f" WHEN {w} >= {1 << (_HLL_W_BITS - 1 - k)} THEN {k + 1}"
        for k in range(_HLL_W_BITS))
    return f"(CASE{branches} ELSE {_HLL_W_BITS + 1} END)"


def _pow2neg(r: Column) -> Column:
    """2^-r for r in [0, 53] as a literal lookup chain — each branch
    embeds the exactly-representable double, so no pow() (1-ulp
    licence) and no variable-distance shift (Spark's shiftleft takes
    a literal count only)."""
    expr = F.lit(0.0)
    for k in range(_HLL_W_BITS + 2):
        expr = F.when(r == F.lit(k), F.lit(0.5 ** k)).otherwise(expr)
    return expr


def hll_sketch(df: DataFrame, col: str) -> DataFrame:
    """One-row HLL summary of ``count(distinct col)``: the raw
    estimate (no small/large-range corrections — those need ln(),
    which is exactly the cross-engine trap this sketch avoids; with
    n >> m the raw estimate is the operative branch anyway), the
    exact count for reference, the empty-register count, and an
    order-pinned register checksum so a single flipped register fails
    the value hash.

    The S = sum of 2^-reg fold runs sequentially over registers sorted
    by index — powers of two are exact doubles and the addition order
    is pinned, so S (and the estimate) is bit-identical everywhere.
    """
    h = stable_hash64(F.col(col).cast("string"))
    hashed = df.select(h.alias("h"), F.col(col).alias("v"))
    regs = (hashed
            .select((F.col("h") % HLL_M).alias("idx"),
                    _rho(F.shiftrightunsigned("h", 8)).alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("reg")))
    # exact count rides the same scan for the error contract
    exact = df.select(F.count_distinct(col).alias("n_exact"))
    folded = regs.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "reg"))),
                lambda s: s.getField("reg")),
            F.lit(0.0),
            lambda acc, r: acc + _pow2neg(r))
         .alias("s_present"),
        F.count("*").alias("n_present"),
        F.sum(F.col("reg") * (F.col("idx") + 1)).cast("long")
         .alias("reg_checksum"))
    out = folded.crossJoin(F.broadcast(exact)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        # absent registers hold 0 => contribute 2^0 = 1 each
        F.floor(F.lit(HLL_ALPHA_M2)
                / (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present"))))
         .cast("long").alias("hll_estimate"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long")
         .alias("n_zero_registers"),
        F.col("reg_checksum"))
    rel_err = (F.abs(F.col("hll_estimate") - F.col("n_exact"))
               / F.col("n_exact"))
    # m=256 -> rsd ~ 1.04/sqrt(256) = 6.5%; assert at ~3 sigma
    return out.where(F.assert_true(
        rel_err <= 0.20,
        F.lit("deterministic HLL estimate outside 20% of exact")).isNull())


def hll_sketch_oracle(table: str, col: str) -> str:
    """DuckDB twin of :func:`hll_sketch` — register-for-register."""
    h = stable_hash64_sql(f"{col}::VARCHAR")
    rho = _rho_sql("(h >> 8)")
    return f"""
  WITH hashed AS (SELECT {h} AS h FROM {table}),
  regs AS (
    SELECT h % {HLL_M} AS idx, max({rho}) AS reg
    FROM hashed GROUP BY idx
  ),
  folded AS (
    SELECT list_sum(list_transform(list(reg ORDER BY idx),
                                   r -> 1.0 / (1::BIGINT << r))) AS s_present,
           count(*) AS n_present,
           sum(reg * (idx + 1))::BIGINT AS reg_checksum
    FROM regs
  ),
  exact AS (SELECT count(DISTINCT {col})::BIGINT AS n_exact FROM {table})
  SELECT n_exact,
         floor({HLL_ALPHA_M2!r}
               / (s_present + ({HLL_M} - n_present)))::BIGINT
           AS hll_estimate,
         ({HLL_M} - n_present)::BIGINT AS n_zero_registers,
         reg_checksum
  FROM folded, exact
"""
