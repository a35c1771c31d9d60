"""Round-12 extension queries: ingest-gate data quality, leakage-safe
feature engineering, and harmonic seasonality.

* ``dq_constraint_report`` — Deequ-style constraint suite over the
  orders feed (operators/dq.py): completeness, uniqueness, range,
  domain, referential integrity — one agg pass + one anti-join.
* ``oof_target_encoding`` — out-of-fold damped target encoding of
  customer market segment against order value: the subtraction trick
  (total − fold) yields every fold's out-of-fold mean in ONE pass —
  the leakage-safe categorical encoder of a tabular-ML pipeline.
* ``dow_seasonality_harmonics`` — first two Fourier harmonics of the
  day-of-week profile per event type; cos/sin weights are PRECOMPUTED
  e6-integer literals injected into BOTH engines (libm cos() may
  differ in the last ulp across engines — literals can't).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..functions.scalar import stable_hash64, stable_hash64_sql
from ..operators import dq
from .spec import QuerySpec, _t

QUERIES_ROUND12: dict[str, QuerySpec] = {}

_OOF_FOLDS, _OOF_SEED, _OOF_DAMP = 5, 31, 20

# e6-quantized cos/sin(2π·k·dow/7) literal tables, k = 1, 2 — shared
# verbatim by the Spark plan and the DuckDB oracle
_HARM = {
    k: ([math.floor(math.cos(2 * math.pi * k * d / 7) * 1e6)
         for d in range(7)],
        [math.floor(math.sin(2 * math.pi * k * d / 7) * 1e6)
         for d in range(7)])
    for k in (1, 2)
}


def q_dq_constraint_report(spark, sf_dir):
    """Five-constraint DQ report over orders (see operators/dq.py)."""
    return dq.constraint_report(_t(spark, sf_dir, "orders"),
                                _t(spark, sf_dir, "customer")) \
        .orderBy("check_name")


def _oracle_dq() -> str:
    return """
  WITH viol AS (
    SELECT count(*)::BIGINT AS n,
           sum((o_custkey IS NULL)::BIGINT)::BIGINT AS v_complete,
           (count(*) - count(DISTINCT o_orderkey))::BIGINT AS v_unique,
           sum((NOT (o_totalprice > 0))::BIGINT)::BIGINT AS v_range,
           sum((o_orderstatus NOT IN ('O', 'F', 'P'))::BIGINT)::BIGINT
             AS v_domain
    FROM orders
  ),
  fk AS (
    SELECT count(*)::BIGINT AS v_fk
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
  ),
  stacked AS (
    SELECT n, 'complete_custkey' AS check_name, v_complete AS v
    FROM viol, fk
    UNION ALL SELECT n, 'unique_orderkey', v_unique FROM viol, fk
    UNION ALL SELECT n, 'range_totalprice', v_range FROM viol, fk
    UNION ALL SELECT n, 'domain_status', v_domain FROM viol, fk
    UNION ALL SELECT n, 'fk_custkey', v_fk FROM viol, fk
  )
  SELECT check_name, n AS n_rows, v::BIGINT AS n_violations,
         floor((n - v)::DOUBLE * 1e6 / n::DOUBLE)::BIGINT
           AS pass_frac_e6,
         (v = 0)::BIGINT AS passed
  FROM stacked ORDER BY check_name
"""


def q_oof_target_encoding(spark, sf_dir):
    """Damped out-of-fold target encoding: enc(seg, fold) =
    (Σ_{seg} y − Σ_{seg,fold} y + damp·μ) / (n_seg − n_fold + damp),
    y = order cents, μ = global mean cents (floored). Exact BIGINT
    fold/segment/global sums; one pinned double division per output
    row; folds by stable hash of the order key.

    Scale shape: one fact-side join to the customer dim for the
    segment, one map-side-combined groupBy on (segment, fold) — 25
    output rows regardless of corpus — then broadcast scalars."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rows = (o.join(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_mktsegment"), "o_custkey")
            .select(F.col("c_mktsegment").alias("seg"),
                    F.pmod(stable_hash64(
                        F.col("o_orderkey").cast("string"),
                        seed=_OOF_SEED), F.lit(_OOF_FOLDS)).alias("fold"),
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                     .alias("y")))
    per = rows.groupBy("seg", "fold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"))
    seg = per.groupBy("seg").agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"))
    g = per.groupBy().agg(
        F.floor(F.sum("s").cast("double") / F.sum("n").cast("double"))
        .cast("long").alias("mu_c"))
    return (per.join(seg, "seg").crossJoin(F.broadcast(g))
            .select(F.col("seg").alias("mktsegment"),
                    F.col("fold").cast("long").alias("fold"),
                    F.col("n").alias("n_test"),
                    F.floor((F.col("ts") - F.col("s")
                             + F.lit(_OOF_DAMP) * F.col("mu_c"))
                            .cast("double") * F.lit(1000000.0)
                            / (F.col("tn") - F.col("n")
                               + F.lit(_OOF_DAMP)).cast("double"))
                    .cast("long").alias("enc_cents_e6"))
            .orderBy("mktsegment", "fold"))


def _oracle_oof() -> str:
    h = stable_hash64_sql("o_orderkey::VARCHAR", seed=_OOF_SEED)
    return f"""
  WITH rws AS (
    SELECT c.c_mktsegment AS seg, ({h} % {_OOF_FOLDS}) AS fold,
           floor(o.o_totalprice * 100)::BIGINT AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  ),
  per AS (
    SELECT seg, fold, count(*)::BIGINT AS n, sum(y)::BIGINT AS s
    FROM rws GROUP BY seg, fold
  ),
  segt AS (
    SELECT seg, sum(n)::BIGINT AS tn, sum(s)::BIGINT AS ts
    FROM per GROUP BY seg
  ),
  g AS (
    SELECT floor(sum(s)::DOUBLE / sum(n)::DOUBLE)::BIGINT AS mu_c
    FROM per
  )
  SELECT p.seg AS mktsegment, p.fold::BIGINT AS fold, p.n AS n_test,
         floor((t.ts - p.s + {_OOF_DAMP} * g.mu_c)::DOUBLE * 1e6
               / (t.tn - p.n + {_OOF_DAMP})::DOUBLE)::BIGINT
           AS enc_cents_e6
  FROM per p JOIN segt t USING (seg), g
  ORDER BY mktsegment, fold
"""


def _lit_table(vals: list[int], col: str) -> str:
    cases = " ".join(f"WHEN {d} THEN {v}" for d, v in enumerate(vals))
    return f"CASE ({col} % 7) {cases} END"


def q_dow_harmonics(spark, sf_dir):
    """First two Fourier harmonics of each event type's day-of-week
    cents profile: coef_cos_k = floor(2·Σ_d t_d·cos_e6[dow_d] /
    (n·1e6)), likewise sin — a closed-form harmonic regression whose
    weights are integer literals, so Σ t·w is an exact BIGINT and the
    whole fit is two pinned divisions per (type, k).

    Scale shape: one groupBy(type, day) rollup, then a type-keyed agg
    over the day-sized frame with the literal weight lookup inlined —
    zero joins, zero windows."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    day = F.floor(F.floor(F.unix_timestamp(F.col("ts"))).cast("long")
                  / F.lit(86400)).cast("long")
    daily = (e.select(F.col("event_type").alias("g"), day.alias("day"),
                      cents.alias("v"))
             .groupBy("g", "day").agg(F.sum("v").cast("long").alias("t")))

    def w(vals: list[int]):
        arr = F.array(*[F.lit(v).cast("long") for v in vals])
        return F.element_at(arr, (F.pmod(F.col("day"), F.lit(7)) + 1)
                            .cast("int"))

    aggs = [F.count("*").cast("long").alias("n_days")]
    for k in (1, 2):
        cv, sv = _HARM[k]
        aggs.append(F.sum(F.col("t") * w(cv)).cast("long").alias(f"sc{k}"))
        aggs.append(F.sum(F.col("t") * w(sv)).cast("long").alias(f"ss{k}"))
    per = daily.groupBy("g").agg(*aggs)
    cols = [F.col("g").alias("event_type"), "n_days"]
    for k in (1, 2):
        cols.append(F.floor(F.lit(2.0) * F.col(f"sc{k}").cast("double")
                            / (F.col("n_days").cast("double")
                               * F.lit(1000000.0)))
                    .cast("long").alias(f"cos{k}_cents"))
        cols.append(F.floor(F.lit(2.0) * F.col(f"ss{k}").cast("double")
                            / (F.col("n_days").cast("double")
                               * F.lit(1000000.0)))
                    .cast("long").alias(f"sin{k}_cents"))
    return per.select(*cols).orderBy("event_type")


def _oracle_harmonics() -> str:
    sums, outs = [], []
    for k in (1, 2):
        cv, sv = _HARM[k]
        sums.append(f"sum(t * ({_lit_table(cv, 'day')}))::BIGINT AS sc{k}")
        sums.append(f"sum(t * ({_lit_table(sv, 'day')}))::BIGINT AS ss{k}")
        outs.append(f"floor(2.0 * sc{k}::DOUBLE / (n_days::DOUBLE * 1e6))"
                    f"::BIGINT AS cos{k}_cents")
        outs.append(f"floor(2.0 * ss{k}::DOUBLE / (n_days::DOUBLE * 1e6))"
                    f"::BIGINT AS sin{k}_cents")
    return f"""
  WITH daily AS (
    SELECT event_type AS g,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS t
    FROM events GROUP BY 1, 2
  ),
  per AS (
    SELECT g, count(*)::BIGINT AS n_days, {', '.join(sums)}
    FROM daily GROUP BY g
  )
  SELECT g AS event_type, n_days, {', '.join(outs)}
  FROM per ORDER BY event_type
"""


QUERIES_ROUND12.update({
    "dq_constraint_report": QuerySpec(
        q_dq_constraint_report, _oracle_dq(),
        doc="Deequ-style constraint suite: completeness / uniqueness / "
            "range / domain / FK in one agg pass + one anti-join"),
    "oof_target_encoding": QuerySpec(
        q_oof_target_encoding, _oracle_oof(),
        doc="out-of-fold damped target encoding of mktsegment vs "
            "order cents (subtraction trick, one pass)"),
    "dow_seasonality_harmonics": QuerySpec(
        q_dow_harmonics, _oracle_harmonics(),
        doc="first two Fourier harmonics of per-type day-of-week "
            "profile (literal e6 cos/sin weights)"),
})
