"""Aggregation operators (SURVEY §2.4).

The reference accumulates into Python dicts on the driver
(consumer2.py:169-191, 243-274). Here every aggregate is a
``groupBy().agg()`` — Catalyst plans partial (map-side) + final hash
aggregation automatically, which is exactly the two-phase plan you want
at 100 TB: the shuffle carries one row per (partition, key), not per
input row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalar import nz


def author_engagement(df: DataFrame, author_col: str,
                      metric_cols: list[str]) -> DataFrame:
    """A1: per-author count + sum/max of each engagement metric with
    null→0 (reference consumer2.py:159-191).

    Note the null trap (SURVEY §7.3): the reference treats null metric
    values as 0 *inside* the aggregation, so ``sum`` over an all-null
    group is 0, not null, and ``max`` of an all-null group is 0. Hence
    nz() *before* aggregating, not after.
    """
    aggs: list[Column] = [F.count("*").alias("total_tweets")]
    for m in metric_cols:
        aggs.append(F.sum(nz(m)).alias(f"total_{m}"))
    for m in metric_cols:
        aggs.append(F.max(nz(m)).alias(f"max_{m}"))
    return df.groupBy(F.col(author_col).alias("author")).agg(*aggs)


def value_counts(df: DataFrame, col: str, out_name: str = "cnt") -> DataFrame:
    """A3/A4: histogram of non-null values (reference consumer2.py:243-274
    skips nulls explicitly)."""
    return (df.where(F.col(col).isNotNull())
              .groupBy(col)
              .agg(F.count("*").alias(out_name)))


def global_scalars(df: DataFrame, avg_col: str, max_col: str) -> DataFrame:
    """A5: count / mean / max in one pass (reference show.py:181-183)."""
    return df.agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg(avg_col), 2).alias(f"avg_{avg_col}"),
        F.max(max_col).alias(f"max_{max_col}"),
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A6: distinct values of one column (reference show.py:147,159).
    Partial-distinct runs map-side before the shuffle."""
    return df.select(col).distinct()


def merge_aggregate(prev: DataFrame, batch: DataFrame, key: str,
                    sum_cols: list[str], max_cols: list[str],
                    count_col: str) -> DataFrame:
    """A2: incremental merge of batch aggregates into running totals —
    the reference's $inc/$max Mongo upsert loop (consumer2.py:193-241)
    as a relational merge: outer-join on key, add sums/counts, take
    elementwise max. Invariant (property-tested): merging per-batch
    aggregates == aggregating the concatenation.
    """
    p = prev.select(
        F.col(key).alias("__p_k"),
        F.col(count_col).alias("__p_cnt"),
        *[F.col(c).alias(f"__p_s_{c}") for c in sum_cols],
        *[F.col(c).alias(f"__p_m_{c}") for c in max_cols],
    )
    b = batch.select(
        F.col(key).alias("__b_k"),
        F.col(count_col).alias("__b_cnt"),
        *[F.col(c).alias(f"__b_s_{c}") for c in sum_cols],
        *[F.col(c).alias(f"__b_m_{c}") for c in max_cols],
    )
    # null-safe equality: a null group key (groupBy puts all nulls in
    # one group) must MERGE across batches — a plain equi-join would
    # emit two disjoint null-key rows and split the totals forever
    joined = (p.join(b, F.col("__p_k").eqNullSafe(F.col("__b_k")),
                     "full_outer")
               .withColumn(key, F.coalesce(F.col("__p_k"),
                                           F.col("__b_k"))))
    out = [F.col(key), (nz("__p_cnt") + nz("__b_cnt")).alias(count_col)]
    out += [(nz(f"__p_s_{c}") + nz(f"__b_s_{c}")).alias(c) for c in sum_cols]
    # greatest() skips nulls (absent side), which is the correct $max
    # identity — coalescing to 0 first would corrupt negative maxima
    # (found by the hypothesis incremental==recompute property)
    out += [F.greatest(f"__p_m_{c}", f"__b_m_{c}").alias(c)
            for c in max_cols]
    return joined.select(*out)


def value_histogram(df: DataFrame, col: str, lo: float, hi: float,
                    nbins: int) -> DataFrame:
    """Equi-width histogram with explicit under/overflow bins: bin -1
    holds values < lo, bin ``nbins`` holds values ≥ hi, bins 0..nbins-1
    are [lo + i·w, lo + (i+1)·w). Emits per-bin count and exact min/max
    (doubles pass through untouched — no FP summing, so the result is
    bit-identical across engines). One partial+final hash-agg over at
    most nbins+2 groups — the map-side combine collapses everything
    before the (tiny) shuffle. The binning expression is plain
    ``floor((x−lo)/w)`` arithmetic rather than engine ``width_bucket``
    built-ins, whose edge conventions differ between engines."""
    w = (hi - lo) / nbins
    x = F.col(col)
    # least(..., nbins-1): when w rounds DOWN in FP, a value just
    # under hi can compute floor((x-lo)/w) == nbins even though the
    # x >= hi guard rejected it — clamp so the overflow bin holds
    # exactly the documented x >= hi set (oracle mirrors the clamp)
    bin_ = (F.when(x < lo, F.lit(-1))
             .when(x >= hi, F.lit(nbins))
             .otherwise(F.least(F.floor((x - F.lit(lo)) / F.lit(w)),
                                F.lit(nbins - 1))))
    return (df.select(bin_.cast("long").alias("bin"), x.alias("__v"))
              .groupBy("bin")
              .agg(F.count("*").alias("n"),
                   F.min("__v").alias("bin_min"),
                   F.max("__v").alias("bin_max"))
              .select("bin", F.col("n").cast("long"),
                      "bin_min", "bin_max"))


def value_outliers(df: DataFrame, key_col: str, val_col: str,
                   id_col: str, sigmas: int = 3,
                   scale: int = 100) -> DataFrame:
    """Per-group z-score outliers with EXACT integer arithmetic: flag
    rows where (x − μ)² > sigmas²·σ². Values are quantized to a fixed
    grid (``floor(x·scale)``), and the comparison is cross-multiplied
    so no division, sqrt, or FP mean ever happens:

        (n·x − Σ)²  >  sigmas² · (n·Σx² − Σ²)

    (both sides exact BIGINTs) — group moments are plain associative
    integer sums, so the flags are bit-identical across engines and
    partial-agg merge orders. Classic two-pass shape: one groupBy for
    (n, Σ, Σx²), joined back to the rows on the group key — at scale
    the join reuses the groupBy's hash partitioning.

    Overflow budget: |q| ≤ scale·|x|; (n·q)² must stay < 2^63 — with
    cents (scale=100) and |x| ≤ 10^6 that allows n ≈ 3·10^7 rows per
    group; larger groups want a smaller scale or decimal(38).
    """
    q = F.floor(F.col(val_col) * F.lit(scale)).cast("long")
    rows = df.select(F.col(id_col), F.col(key_col), q.alias("q"))
    mom = (rows.groupBy(key_col)
           .agg(F.count("*").alias("n"),
                F.sum("q").alias("s"),
                F.sum(F.col("q") * F.col("q")).alias("s2")))
    j = rows.join(mom, key_col)
    lhs = (F.col("n") * F.col("q") - F.col("s"))
    rhs = F.lit(sigmas * sigmas) * (
        F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    return (j.select(F.col(id_col), F.col(key_col),
                     F.col("q").alias("val_q"),
                     F.col("n").cast("long").alias("n_group"),
                     (lhs * lhs > rhs).cast("long").alias("is_outlier"))
            .where(F.col("is_outlier") == 1))


# floor(log10(1 + 1/d)·1e6) for d = 1..9 — shared literal table with
# every oracle (no cross-engine log10 calls at query time)
BENFORD_E6: dict[int, int] = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_digits(df: DataFrame, val_col: str) -> DataFrame:
    """Benford first-digit audit of a positive numeric column (the
    fraud/fabrication screen): observed first-significant-digit
    shares next to the Benford expectation, one row per digit 1-9.

    The leading digit is taken from the DECIMAL STRING of the floored
    value — pure string ops, no log10 on the data path (a float
    ``10^floor(log10 x)`` extraction rounds differently per engine at
    powers of ten). Expected probabilities are the shared literal e6
    table. Output: digit, n_obs, p_obs_e6 (floor n_obs·1e6/n),
    p_benford_e6, diff_e6 (signed, integer).

    One digit-keyed aggregation (9 groups, map-side collapsed), one
    1-row total broadcast.
    """
    digit = F.substring(
        F.floor(F.col(val_col)).cast("long").cast("string"), 1, 1) \
        .cast("long")
    base = df.where(F.col(val_col) >= 1).select(digit.alias("digit"))
    counts = base.groupBy("digit").agg(
        F.count("*").cast("long").alias("n_obs"))
    total = counts.agg(F.sum("n_obs").cast("long").alias("n"))
    bt = F.create_map(*[F.lit(x) for kv in BENFORD_E6.items()
                        for x in kv])
    scored = (counts.crossJoin(F.broadcast(total))
              .select("digit", "n_obs",
                      F.floor(F.col("n_obs") * F.lit(1_000_000)
                              / F.col("n")).cast("long")
                       .alias("p_obs_e6"),
                      bt[F.col("digit")].cast("long")
                       .alias("p_benford_e6")))
    return scored.select(
        "digit", "n_obs", "p_obs_e6", "p_benford_e6",
        (F.col("p_obs_e6") - F.col("p_benford_e6")).cast("long")
         .alias("diff_e6"))


def theil_index(df: DataFrame, group_col: str, val_cents: Column) -> DataFrame:
    """Theil T inequality index per group — the decomposable
    entropy-based concentration measure (0 = perfectly even):
    ``T = (1/n) Σ (x/μ)·ln(x/μ)`` over positive values.

    Exactness: group totals are exact BIGINTs broadcast back to the
    rows; each row's (x/μ)·ln(x/μ) term runs ONCE on a pinned double
    tree (μ itself one pinned division) and floors at e9; the group
    index is the EXACT integer sum of floored terms, divided by n as
    one final pinned floor(sum/n) (floor, not truncating `div`:
    per-term flooring can push a near-zero sum slightly NEGATIVE,
    where truncation rounds toward zero and floor away — engines
    would disagree by 1). Zero-value rows contribute exactly 0 (the
    x·ln x limit).

    Plan: one tiny per-group agg, one broadcast join back (|groups|
    rows), one re-aggregation on the same key — the fact table
    shuffles once."""
    d = df.select(F.col(group_col).alias("g"),
                  val_cents.cast("long").alias("x"))
    tot = d.groupBy("g").agg(F.count("*").cast("long").alias("n"),
                             F.sum("x").cast("long").alias("s"))
    j = d.join(F.broadcast(tot), "g")
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    r = F.col("x").cast("double") / mu
    term = (F.when(F.col("x") > 0, F.floor(r * F.log(r) * 1e9))
            .otherwise(F.lit(0))).cast("long")
    out = (j.select("g", "n", "s", term.alias("t"))
           .groupBy("g", "n", "s")
           .agg(F.sum("t").cast("long").alias("t_sum")))
    return out.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_events"),
        F.col("s").alias("sum_cents"),
        F.floor(F.col("t_sum").cast("double")
                / F.col("n").cast("double"))
         .cast("long").alias("theil_e9")
    ).orderBy(group_col)


def corr_matrix3(df: DataFrame, x: Column, y: Column, z: Column,
                 names: tuple[str, str, str]) -> DataFrame:
    """Full 3x3 Pearson correlation matrix in ONE scan — the
    feature-redundancy screen run before model fitting: nine exact
    decimal(38) moments in a single aggregate (map-side partials, one
    1-row exchange), then each of the three pairwise correlations
    combines on a pinned double tree floored at e6. Output is the
    tall upper triangle (pair, n_rows, corr_e6) — unpivoted via a
    literal 3-element explode on the 1-row aggregate, never a second
    scan."""
    d = df.select(x.cast("long").alias("x"), y.cast("long").alias("y"),
                  z.cast("long").alias("z"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"

    def c19(c):
        return F.col(c).cast(d19)

    agg = d.groupBy().agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("z").cast(dec)).alias("sz"),
        F.sum(c19("x") * c19("x")).alias("sxx"),
        F.sum(c19("y") * c19("y")).alias("syy"),
        F.sum(c19("z") * c19("z")).alias("szz"),
        F.sum(c19("x") * c19("y")).alias("sxy"),
        F.sum(c19("x") * c19("z")).alias("sxz"),
        F.sum(c19("y") * c19("z")).alias("syz"))

    def corr(sa, sb, saa, sbb, sab):
        n = F.col("n").cast("double")
        a, b = F.col(sa).cast("double"), F.col(sb).cast("double")
        aa, bb = F.col(saa).cast("double"), F.col(sbb).cast("double")
        ab = F.col(sab).cast("double")
        num = n * ab - a * b
        den = F.sqrt((n * aa - a * a) * (n * bb - b * b))
        return (F.when(den > 0.0, F.floor(num / den * 1e6))
                .otherwise(F.lit(0))).cast("long")

    pairs = F.array(
        F.struct(F.lit(f"{names[0]}_{names[1]}").alias("pair"),
                 corr("sx", "sy", "sxx", "syy", "sxy").alias("c")),
        F.struct(F.lit(f"{names[0]}_{names[2]}").alias("pair"),
                 corr("sx", "sz", "sxx", "szz", "sxz").alias("c")),
        F.struct(F.lit(f"{names[1]}_{names[2]}").alias("pair"),
                 corr("sy", "sz", "syy", "szz", "syz").alias("c")))
    return (agg.select(F.col("n").cast("long").alias("n_rows"),
                       F.explode(pairs).alias("p"))
            .select(F.col("p.pair").alias("pair"), "n_rows",
                    F.col("p.c").alias("corr_e6"))
            .orderBy("pair"))


def median_of_means(df: DataFrame, id_col: str, val_cents,
                    k_groups: int = 32) -> DataFrame:
    """Median-of-means robust mean estimator: rows hash-partition
    into ``k_groups`` deterministic buckets, each bucket's mean is
    one pinned division on exact sums, and the estimate is the exact
    LOW median of the bucket means — the heavy-tail-robust
    alternative to the plain mean (sub-Gaussian deviation bounds
    under only finite variance), fully reproducible because bucket
    membership is ``stable_hash64(id) mod k``, never a partitioning
    accident.

    One |rows| agg keyed by the hash bucket (k partial rows per
    task), one k-row rank window. The plain mean rides along for the
    outlier-gap diagnostic."""
    from pyspark.sql import Window
    from ..functions.scalar import stable_hash64
    d = df.select(
        F.pmod(stable_hash64(F.col(id_col).cast("string")),
               F.lit(k_groups)).alias("g"),
        val_cents.cast("long").alias("v"))
    groups = d.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"))
    gm = (F.when(F.col("n") > 0,
                 F.floor(F.col("s").cast("double")
                         / F.col("n").cast("double")))
          .otherwise(F.lit(0))).cast("long")
    ranked = groups.select(gm.alias("m")).select(
        "m", F.row_number().over(Window.orderBy("m")).alias("rn"))
    med_r = (k_groups + 1) // 2
    mom = ranked.where(F.col("rn") == med_r).select(
        F.col("m").alias("mom_c"))
    base = d.groupBy().agg(
        F.count("*").cast("long").alias("n_rows"),
        F.floor(F.sum("v").cast("double")
                / F.count("*").cast("double")).cast("long")
         .alias("mean_c"))
    return (base.crossJoin(F.broadcast(mom))
            .select("n_rows", F.lit(k_groups).cast("long")
                    .alias("k_groups"), "mean_c", "mom_c"))


def trimmed_mean(df: DataFrame, group_col: str, val_cents,
                 trim_num: int = 1, trim_den: int = 10) -> DataFrame:
    """Exact trimmed mean per group: drop the lowest and highest
    ``trim_num/trim_den`` of ranks (floor(n·num/den) rows each side —
    pure integer rank arithmetic), then one pinned division over the
    exact surviving sum — the robustness midpoint between the mean
    and the median, fully deterministic (rank ties carry equal
    values, so the trimmed SUM is rank-order-independent).

    One key shuffle for the rank window, one re-aggregation."""
    from pyspark.sql import Window
    d = df.select(F.col(group_col).alias("g"),
                  val_cents.cast("long").alias("v"))
    w = Window.partitionBy("g").orderBy("v")
    ranked = d.select(
        "g", "v", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"))
    k = F.expr(f"(n * {trim_num}) div {trim_den}")
    kept = ranked.where((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    agg = kept.groupBy("g").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("v").cast("long").alias("s_kept"),
        F.max("n").cast("long").alias("n_total"))
    tm = F.floor(F.col("s_kept").cast("double")
                 / F.col("n_kept").cast("double"))
    return (agg.select(F.col("g").alias(group_col), "n_total", "n_kept",
                       tm.cast("long").alias("trimmed_mean_c"))
            .orderBy(group_col))


def anova_oneway(df: DataFrame, group_col: str, val_cents) -> DataFrame:
    """One-way ANOVA F statistic across groups — "do the group means
    differ more than within-group noise explains?", the k-group
    generalization of the two-sample tests in eventflow.

    Moment sums (n, Σx, Σx² per group) are exact decimal(38); each
    group's within-sum-of-squares term floors ONCE from a pinned
    double tree (sxx − sx²/n), the between term likewise against the
    grand mean, both sums are exact integer sums of floored terms,
    and F = (SSB/(k−1))/(SSW/(n−k)) is one final pinned combine
    floored at e3. Two tiny aggregations, one 1-row output."""
    d = df.select(F.col(group_col).alias("g"),
                  val_cents.cast("long").alias("v"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    per = d.groupBy("g").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("sx"),
        F.sum(F.col("v").cast(d19) * F.col("v").cast(d19)).alias("sxx"))
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    ssw_t = F.floor(sxx_d - sx_d * sx_d / n_d).cast("long")
    terms = per.select("g", "n", "sx", ssw_t.alias("ssw_t"))
    tot = terms.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("n")).cast(dec).alias("nn"),
        F.sum(F.col("sx")).cast(dec).alias("ssx"),
        F.sum("ssw_t").cast("long").alias("ssw"))
    j = terms.crossJoin(F.broadcast(tot))
    gmean = F.col("ssx").cast("double") / F.col("nn").cast("double")
    dev = sx_d / n_d - gmean
    ssb_t = F.floor(n_d * dev * dev).cast("long")
    agg = (j.select("k", "nn", "ssw", ssb_t.alias("ssb_t"))
           .groupBy("k", "nn", "ssw")
           .agg(F.sum("ssb_t").cast("long").alias("ssb")))
    kk = F.col("k").cast("double")
    nn = F.col("nn").cast("double")
    f_stat = ((F.col("ssb").cast("double") / (kk - F.lit(1.0)))
              / (F.col("ssw").cast("double") / (nn - kk)))
    return agg.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_rows"),
        F.col("ssb").alias("ssb_c2"), F.col("ssw").alias("ssw_c2"),
        F.when((F.col("k") > 1) & (F.col("ssw") > 0),
               F.floor(f_stat * 1e3))
         .otherwise(F.lit(0)).cast("long").alias("f_e3"))


ECDF_POINTS_C = (100, 250, 500, 1000, 2000, 4000, 8000, 16000)


def ecdf_at_points(df: DataFrame, group_col: str, val_cents,
                   points=ECDF_POINTS_C) -> DataFrame:
    """Empirical CDF evaluated at fixed literal cut points per group —
    the distribution fingerprint a monitoring system stores per
    period (compact, exact, comparable across runs; the fixed grid
    sidesteps every percentile-interpolation divergence).

    One conditional-sum aggregation per group (all points in a single
    pass, map-side combinable), then a literal unpivot. All-integer:
    share_e6 = (n_le·1e6) div n."""
    d = df.select(F.col(group_col).alias("g"),
                  val_cents.cast("long").alias("v"))
    agg = d.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        *[F.sum((F.col("v") <= p).cast("long")).alias(f"le_{i}")
          for i, p in enumerate(points)])
    pairs = F.array(*[
        F.struct(F.lit(p).cast("long").alias("point_c"),
                 F.col(f"le_{i}").cast("long").alias("n_le"))
        for i, p in enumerate(points)])
    return (agg.select("g", "n", F.explode(pairs).alias("p"))
            .select(F.col("g").alias(group_col), "n",
                    F.col("p.point_c").alias("point_c"),
                    F.col("p.n_le").alias("n_le"),
                    F.expr("(p.n_le * 1000000) div n").cast("long")
                    .alias("share_e6"))
            .orderBy(group_col, "point_c"))


def cv_by_group(df: DataFrame, group_col: str, val_cents) -> DataFrame:
    """Coefficient of variation per group (sample-stdev / mean) — the
    scale-free dispersion gauge: exact decimal moments, one pinned
    sqrt-and-divide per group floored at e6 (zero/negative means pin
    to 0)."""
    d = df.select(F.col(group_col).alias("g"),
                  val_cents.cast("long").alias("v"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    agg = d.groupBy("g").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum(F.col("v").cast(d19) * F.col("v").cast(d19)).alias("q"))
    n, s, q = [F.col(c).cast("double") for c in ("n", "s", "q")]
    var = (n * q - s * s) / (n * (n - F.lit(1.0)))
    cv = F.sqrt(var) / (s / n)
    ok = (F.col("n").cast("long") > 1) & (F.col("s").cast("long") > 0)
    return (agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.when(ok, F.floor(cv * 1e6)).otherwise(F.lit(0))
         .cast("long").alias("cv_e6"))
        .orderBy(group_col))


def cramers_v(df: DataFrame, row_col, col_col) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    normalized chi-square (0 = independent, 1 = perfectly
    associated). Contingency counts and margins are exact BIGINTs;
    each cell's (o−e)²/e term runs ONCE on a pinned double tree
    floored at e6, the chi-square is the exact integer sum of floored
    terms, and V combines once more, floored at e6.

    Plan: one contingency agg, margins via two tiny re-aggs broadcast
    back, one |cells| rollup — nothing scans the fact table twice."""
    d = df.select(row_col.cast("string").alias("r"),
                  col_col.cast("string").alias("c"))
    cells = d.groupBy("r", "c").agg(F.count("*").cast("long").alias("o"))
    rm = cells.groupBy("r").agg(F.sum("o").alias("nr"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = cells.groupBy().agg(F.sum("o").cast("long").alias("n"),
                              F.countDistinct("r").cast("long")
                               .alias("k_r"),
                              F.countDistinct("c").cast("long")
                               .alias("k_c"))
    # the FULL margin grid — an unobserved cell still contributes
    # (0−e)²/e (dropping zero cells understates chi² exactly when the
    # association is strongest; caught by the perfect-association
    # unit test)
    grid = rm.crossJoin(F.broadcast(cm))
    full = (grid.join(cells, ["r", "c"], "left")
            .select("r", "c", "nr", "nc",
                    F.coalesce("o", F.lit(0)).cast("long").alias("o")))
    j = full.crossJoin(F.broadcast(tot))
    e = (F.col("nr").cast("double") * F.col("nc").cast("double")
         / F.col("n").cast("double"))
    term = F.floor((F.col("o").cast("double") - e)
                   * (F.col("o").cast("double") - e) / e * 1e6)
    agg = (j.select("n", "k_r", "k_c", term.cast("long").alias("t"))
           .groupBy("n", "k_r", "k_c")
           .agg(F.sum("t").cast("long").alias("chi2_e6")))
    mind = F.least(F.col("k_r") - 1, F.col("k_c") - 1).cast("double")
    v = F.sqrt(F.col("chi2_e6").cast("double") / 1e6
               / (F.col("n").cast("double") * mind))
    ok = (F.col("k_r") > 1) & (F.col("k_c") > 1) & (F.col("chi2_e6") >= 0)
    return agg.select(
        F.col("n").alias("n_rows"), "k_r", "k_c", "chi2_e6",
        F.when(ok, F.floor(v * 1e6)).otherwise(F.lit(0))
         .cast("long").alias("cramers_v_e6"))


def percentile_cont_quartiles(df: DataFrame, val_col,
                              scale: int = 100) -> DataFrame:
    """EXACT interpolated quartiles (percentile_cont semantics) of a
    numeric column, with the linear interpolation done in integer
    arithmetic: rank position (n-1)·q/4 splits into lo index and a
    fractional numerator mod 4, and the interpolated value is
    v_lo·scale + (v_hi - v_lo)·scale·frac div 4 — no doubles, so no
    engine can disagree.  The rank→value lookups run against the
    DISTINCT-value cumulative grid (never a full row sort): the six
    needed ranks broadcast across the grid and a conditional min
    resolves each — O(|distinct|) work however many rows."""
    from pyspark.sql import functions as FF
    c = FF.col(val_col) if isinstance(val_col, str) else val_col
    d = df.select(c.cast("long").alias("v"))
    grid = d.groupBy("v").agg(FF.count("*").alias("c"))
    # two-phase bucketed cumsum (operators.scale): the grid is the
    # distinct-value domain — a global-window sort here is a one-task
    # straggler on continuous columns at scale
    from .scale import dist_cumsum
    cum = dist_cumsum(grid, "v", {"cum": "c"}).select("v", "cum")
    n = d.groupBy().agg(FF.count("*").alias("n"))
    qs = d.sparkSession.range(1, 4).select(FF.col("id").alias("q"))
    ranks = (qs.crossJoin(FF.broadcast(n))
             .select("q", "n",
                     (FF.expr("((n - 1) * q) div 4") + 1).alias("rlo"),
                     (FF.expr("((n - 1) * q) div 4") + 2).alias("rhi"),
                     FF.expr("((n - 1) * q) % 4").alias("frac")))
    lo = (cum.crossJoin(FF.broadcast(ranks))
          .where(FF.col("cum") >= FF.col("rlo"))
          .groupBy("q", "n", "frac", "rhi")
          .agg(FF.min("v").alias("v_lo")))
    hi = (cum.crossJoin(FF.broadcast(
            ranks.select("q", FF.col("rhi").alias("rh"))))
          .where(FF.col("cum") >= FF.col("rh"))
          .groupBy("q").agg(FF.min("v").alias("v_hi")))
    j = lo.join(hi, "q")
    # frac = 0 → rhi may exceed n (q3 of n where (n-1)*3 % 4 == 0);
    # the hi lookup then finds nothing, but its weight is zero — pin
    # v_hi to v_lo so the arithmetic stays total
    v_hi = FF.coalesce(FF.col("v_hi"), FF.col("v_lo"))
    return (j.select(
        "q", FF.col("n").cast("long").alias("n_rows"),
        FF.col("v_lo"), v_hi.alias("v_hi"),
        (FF.col("v_lo") * scale
         + FF.expr(f"((coalesce(v_hi, v_lo) - v_lo) * {scale} "
                   f"* frac) div 4")).alias(f"value_e{len(str(scale))-1}"))
        .orderBy("q"))
