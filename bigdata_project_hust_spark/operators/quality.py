"""Data-quality constraint audit (deequ / dbt-test style).

A pipeline that ingests 100 TB needs its invariants checked as QUERIES,
not as assumptions: null-rate on key columns, key uniqueness, and
referential integrity between fact and dimension tables. ``audit``
evaluates a set of declared constraints and returns one tall frame
``(chk, col_name, n_violations)`` — zero rows violated is itself a
hashable, regression-testable result.

Plan shape: all not-null and uniqueness checks for a table fold into a
SINGLE aggregate pass over it (one scan, partial aggs); each
referential check is one anti-join against the dimension (broadcast
when the dimension is small). Nothing is collected to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def audit(df: DataFrame,
          not_null: tuple[str, ...] = (),
          unique: tuple[str, ...] = (),
          refs: tuple[tuple[str, DataFrame, str], ...] = ()) -> DataFrame:
    """Evaluate constraints over ``df``.

    - ``not_null``: columns that must never be null.
    - ``unique``: columns whose non-null values must be distinct
      (violations = non-null count − distinct count).
    - ``refs``: (col, dim_df, dim_key) foreign-key checks; violations =
      rows whose col value has no match in the dimension (left anti).
      A null FK has no match and therefore counts as a violation here —
      pair with a ``not_null`` check on the same column to tell the two
      cases apart in the report.
    """
    parts: list[DataFrame] = []
    scalar_aggs, labels = [], []
    for c in not_null:
        scalar_aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        labels.append(("not_null", c, f"nn_{c}"))
    for c in unique:
        scalar_aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c)))
            .alias(f"uq_{c}"))
        labels.append(("unique", c, f"uq_{c}"))
    if scalar_aggs:
        one = df.agg(*scalar_aggs)
        stack_args = ", ".join(
            f"'{chk}', '{col}', {alias}" for chk, col, alias in labels)
        parts.append(one.select(F.expr(
            f"stack({len(labels)}, {stack_args}) "
            "AS (chk, col_name, n_violations)")))
    for col, dim, dim_key in refs:
        dangling = (df.join(dim, df[col] == dim[dim_key], "left_anti")
                      .agg(F.count("*").alias("n")))
        parts.append(dangling.select(
            F.lit("ref").alias("chk"), F.lit(col).alias("col_name"),
            F.col("n").cast("long").alias("n_violations")))
    if not parts:
        raise ValueError("no constraints declared")
    return reduce(lambda a, b: a.unionByName(b), parts)


def winsorize_groups(df: DataFrame, group_col: str, val_col,
                     id_col: str, lo_pct: int = 10,
                     hi_pct: int = 90) -> DataFrame:
    """Per-group winsorization audit: clip each value to the group's
    exact nearest-rank [p_lo, p_hi] percentiles and report the clipped
    sum + clip counts — the outlier-capping pass a feature/training
    pipeline runs before normalization, with the cut points computed
    EXACTLY (rank arithmetic on BIGINTs, no FP percentile
    interpolation to diverge across engines).

    ``val_col`` must already be an integer-grid Column (e.g. cents).
    Nearest-rank: p_q = value at row_number ``ceil(q·n/100)`` in
    (value, id) order — deterministic under ties.

    Scale shape: ONE key shuffle for the rank window; the cut-point
    table is |groups| rows → broadcast back; final rollup reuses the
    group key. No global sort, no collect.
    """
    v = val_col if not isinstance(val_col, str) else F.col(val_col)
    from pyspark.sql import Window
    base = df.select(F.col(group_col).alias("g"), v.alias("v"),
                     F.col(id_col).alias("i"))
    w = Window.partitionBy("g").orderBy("v", "i")
    ranked = base.select(
        "g", "v", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"))
    lo_rn = F.ceil(F.col("n") * lo_pct / 100).cast("long")
    hi_rn = F.ceil(F.col("n") * hi_pct / 100).cast("long")
    cuts = (ranked.groupBy("g")
            .agg(F.min(F.when(F.col("rn") == lo_rn, F.col("v")))
                  .alias("lo_c"),
                 F.min(F.when(F.col("rn") == hi_rn, F.col("v")))
                  .alias("hi_c")))
    joined = base.join(F.broadcast(cuts), "g")
    clipped = F.greatest(F.col("lo_c"), F.least(F.col("hi_c"),
                                                F.col("v")))
    return (joined.groupBy("g")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.max("lo_c").cast("long").alias("lo_c"),
                 F.max("hi_c").cast("long").alias("hi_c"),
                 F.sum(clipped).cast("long").alias("sum_clipped"),
                 F.sum(F.when(F.col("v") < F.col("lo_c"), 1)
                        .otherwise(0)).cast("long").alias("n_clip_lo"),
                 F.sum(F.when(F.col("v") > F.col("hi_c"), 1)
                        .otherwise(0)).cast("long").alias("n_clip_hi"))
            .select(F.col("g").alias(group_col), "n_rows", "lo_c",
                    "hi_c", "sum_clipped", "n_clip_lo", "n_clip_hi"))


def mad_outliers(df: DataFrame, group_col: str, val_col,
                 id_col: str, k: int = 3) -> DataFrame:
    """Robust per-group outlier census via median/MAD (the
    median-absolute-deviation rule — immune to the very outliers it
    hunts, unlike the 3σ z-score twin ``value_outliers_per_user``):
    flag rows with ``|v − median| > k·MAD``. Both medians are exact
    LOW-median ranks (``floor((n+1)/2)`` in (value, id) order) on the
    integer grid — no FP quantiles anywhere, so the census
    hash-matches any engine.

    Scale: two rank windows on the SAME group key (median, then
    deviation median) + one broadcast of the |groups|-row stats —
    the shuffle layout is reused across all three passes. MAD = 0
    (constant-majority group) degenerates to "any deviation flags",
    which is the textbook rule's limit and stays deterministic.
    """
    v = val_col if not isinstance(val_col, str) else F.col(val_col)
    from pyspark.sql import Window
    base = df.select(F.col(group_col).alias("g"), v.alias("v"),
                     F.col(id_col).alias("i"))

    def _low_median(frame: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("g").orderBy(col, "i")
        r = frame.select("g", F.col(col),
                         F.row_number().over(w).alias("rn"),
                         F.count("*").over(
                             Window.partitionBy("g")).alias("n"))
        med_rn = F.floor((F.col("n") + 1) / 2).cast("long")
        return (r.groupBy("g")
                .agg(F.min(F.when(F.col("rn") == med_rn, F.col(col)))
                      .alias(f"med_{col}")))

    med = _low_median(base, "v")
    dev = (base.join(F.broadcast(med), "g")
           .select("g", "v", "i",
                   F.abs(F.col("v") - F.col("med_v")).alias("d")))
    mad = _low_median(dev, "d")
    stats = med.join(mad, "g")
    flagged = (base.join(F.broadcast(stats), "g")
               .select("g", "med_v", "med_d",
                       (F.abs(F.col("v") - F.col("med_v"))
                        > F.lit(k) * F.col("med_d")).alias("is_out")))
    return (flagged.groupBy("g")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.max("med_v").cast("long").alias("median_c"),
                 F.max("med_d").cast("long").alias("mad_c"),
                 F.sum(F.when(F.col("is_out"), 1).otherwise(0))
                  .cast("long").alias("n_outliers"))
            .select(F.col("g").alias(group_col), "n_rows", "median_c",
                    "mad_c", "n_outliers"))


def k_anonymity(df: DataFrame, qi_cols: tuple[str, ...],
                sensitive_col: str, k: int = 5) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier
    combination — the privacy gate a training-data release runs
    before shipping records keyed on demographic-ish columns: every
    QI equivalence class must contain ≥ k rows (re-identification
    bound) and its sensitive attribute should take > 1 distinct value
    (homogeneity attack bound).

    One hash aggregation over the QI tuple: n_rows (exact),
    l_diversity = exact count(DISTINCT sensitive) per class, and an
    integer violation flag per bound. Map-side combinable except the
    distinct (which Spark expands to a two-phase partial-distinct
    agg — still one shuffle keyed on the QI tuple)."""
    agg = df.groupBy(*qi_cols).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct(sensitive_col).cast("long")
         .alias("l_diversity"))
    return agg.select(
        *qi_cols, "n_rows", "l_diversity",
        (F.col("n_rows") < k).cast("long").alias("k_violation"),
        (F.col("l_diversity") <= 1).cast("long").alias("l_violation")
    ).orderBy(*qi_cols)


def quantile_normalize_map(df: DataFrame, group_col: str,
                           val_col) -> DataFrame:
    """Quantile normalization ACROSS groups: map every group's value
    distribution onto the POOLED distribution by rank — the batch-
    effect-removal preprocessing step (expression arrays, per-source
    score calibration).  Output is the per-distinct-cell mapping
    (group, v, v_norm) a downstream join applies to the full table.

    All-integer construction: per-group doubled midranks r2 (one
    partitioned window over distinct cells), target pooled index
    i = ceil(r2·N / 2n_g) by positive-operand ceil-div, and the
    "first pooled value with cum ≥ i" lookup as a MERGE-STREAM
    window — queries and pooled cum boundaries union-sorted on
    (pos, is_boundary), answer = min boundary value over the frame
    [current row → end).  That replaces the naive interval range join
    (O(cells × pool) nested loop) with one sort — the scalable shape.
    Both full-domain running aggregates (the pooled cumulative counts
    and the merge-stream suffix-min) run through the two-phase bucketed
    helpers in ``operators.scale`` — parallel per-range windows plus a
    tiny per-bucket carry table — so no single task ever sorts the
    whole value domain (a straggler when a continuous 100 TB column
    makes |distinct| ≈ |rows|)."""
    from pyspark.sql import Window

    from .scale import dist_cumsum, dist_suffix_min
    c = F.col(val_col) if isinstance(val_col, str) else val_col
    d = df.select(F.col(group_col).alias("g"), c.alias("v"))
    cells = d.groupBy("g", "v").agg(F.count("*").alias("c"))
    wg = (Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0))
    ranked = cells.select(
        "g", "v",
        (2 * (F.sum("c").over(wg) - F.col("c")) + F.col("c") + 1)
        .alias("r2"),
        F.sum("c").over(Window.partitionBy("g")).alias("n_g"))
    pool = d.groupBy("v").agg(F.count("*").alias("cp"))
    bounds = (dist_cumsum(pool, "v", {"cum": "cp"})
              .select(F.col("v").alias("bv"), "cum"))
    n_total = d.groupBy().agg(F.count("*").alias("n_tot"))
    # i = ceil(r2·N / (2·n_g)) — positive operands, div == floor
    queries = (ranked.crossJoin(F.broadcast(n_total))
               .select("g", "v",
                       F.expr("(r2 * n_tot + 2 * n_g - 1) "
                              "div (2 * n_g)").alias("pos"),
                       F.lit(0).alias("is_b"),
                       F.lit(None).cast("long").alias("bval")))
    boundaries = bounds.select(
        F.lit(None).cast(queries.schema["g"].dataType).alias("g"),
        F.lit(None).cast("long").alias("v"),
        F.col("cum").alias("pos"), F.lit(1).alias("is_b"),
        F.col("bv").alias("bval"))
    merged = queries.unionByName(boundaries)
    looked = dist_suffix_min(merged, "pos", "bval", "v_norm",
                             tie_cols=("is_b",)) \
        .select("g", "v", "is_b", "v_norm")
    return (looked.where(F.col("is_b") == 0)
            .select("g", "v", "v_norm")
            .orderBy("g", "v"))
