"""Data-quality constraint suite (Deequ-style, AWS Labs' deequ /
Schelter et al. VLDB'18): declarative completeness / uniqueness /
range / domain / referential-integrity checks evaluated in as few
passes as the constraint mix allows, emitting one report row per
constraint.

The reference pipeline trusts its producer (`producer.py` pushes raw
API frames with no validation); a 100 TB ingest cannot — this is the
gate that runs between landing and curation.

Plan shape: every row-local constraint (completeness, range, domain)
folds into ONE aggregate over a single scan — adding a constraint adds
a column to that agg, not a pass. Uniqueness rides the same pass as a
count(distinct); referential integrity is the only join (broadcast
when the dimension fits, AQE decides). The per-constraint rows come
from unpivoting the single metrics row — a 1×k → k×1 reshape on the
driver-side-sized result, never on data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["constraint_report"]


def constraint_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Five-constraint report over the orders feed:

    - ``complete_custkey``  — o_custkey IS NOT NULL
    - ``unique_orderkey``   — o_orderkey has no duplicates
    - ``range_totalprice``  — o_totalprice > 0
    - ``domain_status``     — o_orderstatus ∈ {O, F, P}
    - ``fk_custkey``        — o_custkey exists in customer

    Output per constraint: n_rows, n_violations, pass_frac_e6,
    passed (1/0). ``pass_frac_e6`` floors violations/n on the e6 grid
    — exact for the oracle compare."""
    viol = orders.groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).cast("long")
         .alias("v_complete"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long")
         .alias("v_unique"),
        F.sum((~(F.col("o_totalprice") > 0)).cast("long")).cast("long")
         .alias("v_range"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long"))
         .cast("long").alias("v_domain"))
    fk = (orders.join(customer.select(F.col("c_custkey").alias("o_custkey"))
                      .distinct(),
                      "o_custkey", "left_anti")
          .groupBy().agg(F.count("*").cast("long").alias("v_fk")))
    m = viol.crossJoin(F.broadcast(fk))
    stacked = m.select("n", F.expr(
        "stack(5, 'complete_custkey', v_complete, "
        "'unique_orderkey', v_unique, "
        "'range_totalprice', v_range, "
        "'domain_status', v_domain, "
        "'fk_custkey', v_fk) as (check_name, n_violations)"))
    return stacked.select(
        "check_name", F.col("n").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.floor((F.col("n") - F.col("n_violations")).cast("double")
                * F.lit(1000000.0) / F.col("n").cast("double"))
        .cast("long").alias("pass_frac_e6"),
        (F.col("n_violations") == 0).cast("long").alias("passed"))
