"""Event-flow analytics: ordered funnels and retention cohorts.

The product-analytics pair every event pipeline serves (reference
consumer2 builds per-entity engagement aggregates for the same
dashboards — show/page.py); both are classic "one key shuffle, then
tiny rollup" shapes at 100 TB.

Exactness: every derived quantity is a BIGINT (epoch seconds / epoch
weeks / counts); ratios floor-scale at e6. No FP aggregates anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..checkpoint import materialize

FUNNEL_STAGES: tuple[str, ...] = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 86400  # each stage must convert within a day
_DAY_S = 24 * 3600


def _ts_s(col: str = "ts") -> Column:
    return F.floor(F.unix_timestamp(F.col(col))).cast("long")


def _first_within(arr: Column, lo: Column, within_s: int) -> Column:
    """Earliest element of ``arr`` in [lo, lo+within_s]; null when none
    or when ``lo`` is null. A plain closure — a loop-variable lambda
    with a default arg would present arity 2 to F.filter, which then
    binds the second parameter to the ELEMENT INDEX."""
    return F.array_min(F.filter(
        arr, lambda x: (x >= lo) & (x <= lo + F.lit(within_s))))


def stage_times(df: DataFrame, stages: tuple[str, ...] = FUNNEL_STAGES,
                within_s: int = FUNNEL_WINDOW_S,
                user_col: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts") -> DataFrame:
    """Per-user stage-reach times ``(u, t0..t{n-1})`` under the funnel
    window rule (stage k's earliest event within ``within_s`` at-or-
    after reaching stage k-1; null = never reached). The shared
    gather behind :func:`event_funnel` (counts) and
    :func:`stage_transition_medians` (latencies): ONE groupBy(user)
    exchange, then pure array expressions."""
    e = df.select(F.col(user_col).alias("u"),
                  F.col(type_col).alias("et"),
                  _ts_s(ts_col).alias("ts_s"))
    per_user = e.groupBy("u").agg(
        *[F.array_sort(F.collect_list(
            F.when(F.col("et") == F.lit(stage), F.col("ts_s"))))
           .alias(f"a{i}")
          for i, stage in enumerate(stages)])
    cur, prev_t = per_user, None
    for i in range(len(stages)):
        if prev_t is None:
            t = F.get(F.col(f"a{i}"), 0)
        else:
            t = _first_within(F.col(f"a{i}"), F.col(prev_t), within_s)
        cur = cur.withColumn(f"t{i}", t)
        prev_t = f"t{i}"
    return cur.select("u", *[f"t{i}" for i in range(len(stages))])


def event_funnel(df: DataFrame, stages: tuple[str, ...] = FUNNEL_STAGES,
                 within_s: int = FUNNEL_WINDOW_S,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Time-boxed ordered conversion funnel: a user reaches stage k
    when their earliest stage-k event lands within ``within_s``
    seconds at-or-after the moment they reached stage k-1 (ties at
    the same second count — both engines compare the same BIGINT).
    Returns one row per stage depth 0..len(stages) with the user
    count and the e6-floored share of all users.

    Plan shape: ONE wide exchange — a single groupBy(user) gathers
    each stage's sorted event-time array map-side (partial
    collect_list before the shuffle), and the whole stage chain then
    evaluates as per-row array expressions (element_at / filter /
    array_min) on the aggregated row. A window-chain formulation
    measured 5 shuffles here; this form is 1 plus two tiny rollups
    over |stages|+1 rows. (get() is null-on-missing inside
    stage_times; element_at would ERROR on an empty array under ANSI
    mode — a user with no stage-0 events must yield null, not kill
    the job.)
    """
    cur = stage_times(df, stages, within_s, user_col, type_col, ts_col)
    depth = F.lit(0)
    for i in range(len(stages)):
        depth = F.when(F.col(f"t{i}").isNotNull(), F.lit(i + 1)) \
                 .otherwise(depth)
    # t_i is only defined when t_{i-1} was reached (the filter bound is
    # null otherwise), so the when-chain (last non-null wins) IS the
    # null-terminated prefix depth
    staged = cur.select(depth.alias("funnel_stage"))
    counts = staged.groupBy("funnel_stage") \
                   .agg(F.count("*").cast("long").alias("n_users"))
    # the share denominator is a global window over the |stages|+1-row
    # rollup — NOT a self-join against a re-aggregated copy, which
    # would duplicate the whole upstream plan (and its shuffles)
    from pyspark.sql import Window
    n_total = F.sum("n_users").over(
        Window.partitionBy())  # single partition of <= |stages|+1 rows
    return counts.select(
        "funnel_stage", "n_users",
        F.floor(F.col("n_users") * F.lit(1_000_000) / n_total)
         .cast("long").alias("share_e6"))


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Daily retention triangle: users cohorted by the epoch day of
    their first event; one output row per (cohort_day, day_offset)
    with the distinct active-user count.

    Days are ``floor(epoch_seconds / 86400)`` — a pure BIGINT, no
    calendar/timezone functions to diverge across engines.

    Plan shape: groupBy(user) gathers the distinct-day set map-side
    (partial collect_set) — cohort day is its array_min, no window and
    no separate de-dup pass; the explode feeds the (cohort, offset)
    rollup, whose input is |user-days| already-distinct rows. Two wide
    exchanges total (user, then cohort-offset) — the textbook minimum
    for a cohort pivot. The output triangle is |days|² rows.
    """
    e = df.select(F.col(user_col).alias("u"),
                  F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
                   .alias("day"))
    per_user = e.groupBy("u").agg(F.collect_set("day").alias("days"))
    per_user = per_user.select(
        F.array_min("days").alias("cohort_day"),
        F.explode("days").alias("day"))
    return (per_user
            .groupBy("cohort_day",
                     (F.col("day") - F.col("cohort_day")).alias("day_offset"))
            .agg(F.count("*").cast("long").alias("n_active_users")))


PATTERN_VIEW_TO_PURCHASE = "v[ce]*p"  # view, then clicks/errors, then buy


def event_pattern_matches(df: DataFrame,
                          pattern: str = PATTERN_VIEW_TO_PURCHASE,
                          ts_col: str = "ts", user_col: str = "user_id",
                          type_col: str = "event_type",
                          id_col: str = "event_id") -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence detection: per user, events are
    ordered by (ts, id), each type encoded as its first letter
    (distinct across the event vocabulary), and the journey string is
    scanned for non-overlapping regex matches — complex-event
    patterns ("a view converts to a purchase through clicks/errors
    only") as ONE exchange + string ops.

    The pattern grammar is deliberately lookaround-free and built so
    each match start admits a unique match ([ce]* cannot contain the
    terminator), making Java-regex (backtracking) and RE2
    (leftmost-longest) agree — the PII_RULES portability rule.

    Scale: one groupBy(user) exchange carrying (ts, id, 1 char); the
    sort is per-group map-side array_sort; journeys are ~events/user
    chars. Same shape as event_funnel, but the pattern is free-form
    instead of a fixed stage list."""
    ev = (df.groupBy(F.col(user_col))
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col(ts_col), F.col(id_col),
                F.substring(F.col(type_col), 1, 1).alias("c"))))
                 .alias("__ev")))
    journey = F.concat_ws(
        "", F.transform("__ev", lambda s: s.getField("c")))
    return ev.select(
        F.col(user_col),
        F.size("__ev").cast("long").alias("n_events"),
        journey.alias("journey"),
        F.size(F.regexp_extract_all(journey, F.lit(pattern), F.lit(0)))
         .cast("long").alias("n_matches"))


CUSUM_H_C = 2_000          # alarm threshold: 20.00 in value cents
EWMA_TAIL = 64             # EWMA folds only the last 64 events


def cusum_drift_alerts(df: DataFrame, h_c: int = CUSUM_H_C,
                       user_col: str = "user_id", ts_col: str = "ts",
                       val_col: str = "value",
                       id_col: str = "event_id") -> DataFrame:
    """Per-user one-sided CUSUM drift detection (Page 1954) over the
    event value stream, computed by the PREFIX-SUM IDENTITY instead of
    the textbook recursive fold:

        c_t = max(0, c_{t-1} + d_t)  ≡  S_t − min(0, S_1, …, S_t)

    with ``S_t`` the running sum of drifts ``d_t = value_c − target``.
    Both sides are plain window aggregates over one (user) key shuffle
    — no per-user array collect, so a hot user with 10⁹ events streams
    through the window operator instead of materializing in one task
    (the fold-over-collect_list idiom caps at per-key memory; this
    caps at nothing). Everything is BIGINT on the cents grid: the
    target is each user's own floor-mean value (first window pass),
    drift sums are exact, and the alarm is the first event whose CUSUM
    exceeds ``h_c``.

    Output per user: n_events, target_c, max CUSUM, and the alarm
    event id (-1 when the stream never drifts) — the monitoring rollup
    a quality/billing pipeline runs per entity.
    """
    from pyspark.sql import Window
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(F.col(user_col).alias("u"),
                     F.col(ts_col).alias("ts"),
                     F.col(id_col).alias("eid"),
                     v_c.alias("v_c"))
    per_user = Window.partitionBy("u")
    ordered = (Window.partitionBy("u")
               .orderBy("ts", "eid")
               .rowsBetween(Window.unboundedPreceding, 0))
    # pass 1: per-user integer target (floor of the mean on the cents
    # grid — sum/count as exact BIGINTs, not avg() doubles)
    with_target = base.withColumn(
        "target_c",
        F.floor(F.sum("v_c").over(per_user)
                / F.count("*").over(per_user)).cast("long"))
    # window functions cannot nest in one expression: materialize the
    # drift prefix sum S_t, then its running min, then the identity
    with_s = with_target.withColumn(
        "s", F.sum(F.col("v_c") - F.col("target_c")).over(ordered))
    with_min = with_s.withColumn(
        "s_min", F.min("s").over(ordered))
    stepped = with_min.select(
        "u", "eid", "target_c",
        (F.col("s") - F.least(F.lit(0).cast("long"), F.col("s_min")))
        .alias("c"))
    return (stepped.groupBy("u")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.max("target_c").alias("target_c"),
                 F.max("c").cast("long").alias("cusum_max_c"),
                 F.coalesce(
                     F.min(F.when(F.col("c") > h_c, F.col("eid"))),
                     F.lit(-1)).cast("long").alias("alarm_event_id"))
            .select(F.col("u").alias(user_col), "n_events", "target_c",
                    "cusum_max_c", "alarm_event_id"))


def ewma_recent(df: DataFrame, tail: int = EWMA_TAIL,
                user_col: str = "user_id", ts_col: str = "ts",
                val_col: str = "value",
                id_col: str = "event_id") -> DataFrame:
    """Per-user EWMA (α = 1/2) of the LAST ``tail`` event values on the
    cents grid: ``s ← (s + v_c·64) div 2`` folded left-to-right over
    the (ts, id)-sorted tail slice — integer ops only, so the smoothed
    level is bit-exact on any engine (α = 1/2 as a halving keeps the
    whole fold in BIGINT; the ×64 head-scale preserves 6 fractional
    bits through the floors).

    Bounding the fold to a fixed tail makes the collect_list safe by
    CONSTRUCTION (≤ tail structs per user in memory, whatever the
    user's history length) — the unbounded monitoring path is
    :func:`cusum_drift_alerts`' window identity. One key shuffle.
    """
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(F.col(user_col).alias("u"),
                     F.struct(F.col(ts_col).alias("ts"),
                              F.col(id_col).alias("eid"),
                              v_c.alias("v_c")).alias("rec"))
    folded = (base.groupBy("u")
              .agg(F.array_sort(F.collect_list("rec")).alias("arr"))
              # slice(-tail) on a SHORTER array returns [] in Spark —
              # take the tail explicitly from max(1, n-tail+1)
              .select("u", F.slice(
                  F.col("arr"),
                  F.greatest(F.lit(1), F.size("arr") - F.lit(tail - 1)),
                  tail).alias("tl"))
              .select("u", F.size("tl").alias("n_tail"),
                      F.aggregate(
                          F.col("tl"), F.lit(0).cast("long"),
                          lambda acc, r: F.floor(
                              (acc + r.getField("v_c") * F.lit(64))
                              / F.lit(2)).cast("long"))
                      .alias("ewma_c64")))
    return folded.select(F.col("u").alias(user_col),
                         F.col("n_tail").cast("long"), "ewma_c64")


def autocorr_lag1(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", val_col: str = "value",
                  id_col: str = "event_id") -> DataFrame:
    """Per-user lag-1 autocorrelation of the event value series —
    Pearson r between consecutive (ts, id)-ordered values, the
    burstiness/momentum signal of a metric stream.

    Same exactness contract as ``pearson_qty_price``: the (x, y) pairs
    come from ONE lag window (no self-join), the five moments
    accumulate as exact decimal(38,0) (partial-agg order cannot change
    them), and only the final closed-form combination runs in double,
    floored at e6. Degenerate series (n ≤ 1 pairs or zero variance)
    emit r = 0 with the pair count. One key shuffle (the lag window),
    one tiny agg.
    """
    from pyspark.sql import Window
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("u").orderBy("ts", "eid")
    pairs = (df.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("ts"),
                       F.col(id_col).alias("eid"),
                       v_c.alias("y"))
             .withColumn("x", F.lag("y").over(w))
             .where(F.col("x").isNotNull()))
    dec, dec19 = "decimal(38,0)", "decimal(19,0)"
    agg = pairs.groupBy("u").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec19) * F.col("x").cast(dec19))
         .alias("sxx"),
        F.sum(F.col("y").cast(dec19) * F.col("y").cast(dec19))
         .alias("syy"),
        F.sum(F.col("x").cast(dec19) * F.col("y").cast(dec19))
         .alias("sxy"))
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxx, syy, sxy = [F.col(c).cast("double")
                     for c in ("sxx", "syy", "sxy")]
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        F.col("u").alias(user_col),
        F.col("n").cast("long").alias("n_pairs"),
        F.when(den > 0.0, F.floor(num / den * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("autocorr_e6"))


ATTRIBUTION_WINDOW_S = 86400


def purchase_attribution(df: DataFrame,
                         within_s: int = ATTRIBUTION_WINDOW_S,
                         user_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: each purchase is credited to the
    user's LATEST preceding view within ``within_s`` seconds — the
    marketing-analytics join every event pipeline serves, as ONE
    ordered window (no self-join): ``last(view, ignorenulls)`` over
    rows strictly before the purchase.

    Output per purchase: event id, user, the attributed view id and
    the view→purchase gap in seconds (-1 / -1 when no view precedes
    within the window). Epoch-second BIGINTs only.

    Scale: one key shuffle; the frame is ROWS-bounded so state per
    user is O(1) — a hot user streams through. Same (ts, id) total
    order as every eventflow operator.
    """
    from pyspark.sql import Window
    base = df.select(F.col(user_col).alias("u"),
                     _ts_s(ts_col).alias("ts_s"),
                     F.col(id_col).alias("eid"),
                     F.col(type_col).alias("et"))
    w = (Window.partitionBy("u").orderBy("ts_s", "eid")
         .rowsBetween(Window.unboundedPreceding, -1))
    lastview = F.last(
        F.when(F.col("et") == "view",
               F.struct(F.col("ts_s").alias("vts"),
                        F.col("eid").alias("vid"))),
        ignorenulls=True).over(w)
    scored = (base.withColumn("lv", lastview)
              .where(F.col("et") == "purchase"))
    ok = (F.col("lv").isNotNull()
          & ((F.col("ts_s") - F.col("lv.vts")) <= within_s))
    return scored.select(
        F.col("eid").alias("purchase_id"),
        F.col("u").alias(user_col),
        F.when(ok, F.col("lv.vid")).otherwise(F.lit(-1)).cast("long")
         .alias("attributed_view_id"),
        F.when(ok, F.col("ts_s") - F.col("lv.vts")).otherwise(F.lit(-1))
         .cast("long").alias("gap_s"))


def ks_two_sample(df: DataFrame, cond_a, cond_b,
                  val_col: str = "value") -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two row populations (e.g. purchase vs view
    amounts) — the distribution-shift test on a NUMERIC column, next
    to term_drift_chi2's categorical one.

    Entirely integer-exact: per distinct cents value, cumulative
    counts cumA/cumB accumulate under one value-ordered window, and
    ``D = max |cumA·n_B − cumB·n_A|`` is exact BIGINT arithmetic —
    the usual float-CDF subtraction never happens. Output: one row
    with both sample sizes, ``ks_e6 = floor(D·1e6/(n_A·n_B))``, and
    the (lowest) value where the maximum gap occurs.

    Scale: one distinct-value aggregation + one |distinct values|-row
    window + a 1-row rollup. The corpus is scanned once.
    """
    from pyspark.sql import Window
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    tagged = df.select(
        v_c.alias("v"),
        cond_a.cast("long").alias("ia"),
        cond_b.cast("long").alias("ib")).where(
        F.col("ia") + F.col("ib") > 0)
    per_v = tagged.groupBy("v").agg(
        F.sum("ia").cast("long").alias("ca"),
        F.sum("ib").cast("long").alias("cb"))
    # distributed prefix sums over the value grid (operators.scale) —
    # the naive Window.orderBy("v") is a one-task sort when |distinct|
    # approaches |rows|; totals come from a broadcast 1-row agg, and
    # the argmax value falls out of max(struct(d, -v)) with no window
    from .scale import dist_cumsum
    totn = per_v.groupBy().agg(F.sum("ca").cast("long").alias("n_a"),
                               F.sum("cb").cast("long").alias("n_b"))
    cum = (dist_cumsum(per_v, "v", {"cum_a": "ca", "cum_b": "cb"})
           .crossJoin(F.broadcast(totn)))
    gap = cum.select(
        "v", "n_a", "n_b",
        F.abs(F.col("cum_a") * F.col("n_b")
              - F.col("cum_b") * F.col("n_a")).alias("d"))
    best = F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv")))
    return (gap.groupBy()
            .agg(F.max("n_a").cast("long").alias("n_a"),
                 F.max("n_b").cast("long").alias("n_b"),
                 F.floor(F.max("d") * F.lit(1_000_000)
                         / (F.max("n_a") * F.max("n_b")))
                  .cast("long").alias("ks_e6"),
                 (-best.getField("nv"))
                  .cast("long").alias("ks_value_c")))


def mann_whitney_u(df: DataFrame, cond_a, cond_b,
                   val_col: str = "value") -> DataFrame:
    """Two-sample Mann-Whitney U (rank-sum) test statistic, EXACT:
    tie midranks are fractional halves, so everything runs on the
    DOUBLED-rank grid — ``2·midrank(v) = 2·c_before + c_v + 1`` is an
    integer, ``2R_A`` accumulates as a BIGINT sum, and
    ``2U_A = 2R_A − n_A(n_A+1)`` never sees a float. The companion
    effect size is the probability-of-superiority AUC
    ``U_A/(n_A·n_B)`` floored at e6 — the statistic behind "are
    purchase amounts stochastically larger than view amounts".

    Shape: one distinct-value agg + one |values|-row window + a 1-row
    rollup (the KS plan with different arithmetic).
    """
    from pyspark.sql import Window
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    tagged = df.select(
        v_c.alias("v"),
        cond_a.cast("long").alias("ia"),
        cond_b.cast("long").alias("ib")).where(
        F.col("ia") + F.col("ib") > 0)
    per_v = tagged.groupBy("v").agg(
        F.sum("ia").cast("long").alias("ca"),
        F.sum("ib").cast("long").alias("cb"))
    # bucketed EXCLUSIVE prefix sum over the value grid + broadcast
    # totals — no single-task value-domain sort (operators.scale)
    from .scale import dist_cumsum
    totn = per_v.groupBy().agg(F.sum("ca").cast("long").alias("n_a"),
                               F.sum("cb").cast("long").alias("n_b"))
    pv = per_v.withColumn("cab", F.col("ca") + F.col("cb"))
    cum = (dist_cumsum(pv, "v", {"c_before": "cab"}, inclusive=False)
           .crossJoin(F.broadcast(totn))
           .select("ca", "cb", "c_before",
                   F.col("cab").alias("c_v"), "n_a", "n_b"))
    r2a = F.sum(F.col("ca")
                * (2 * F.col("c_before") + F.col("c_v") + 1))
    out = cum.groupBy().agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        r2a.cast("long").alias("r2_a"))
    u2a = (F.col("r2_a")
           - F.col("n_a") * (F.col("n_a") + 1)).cast("long")
    return out.select(
        "n_a", "n_b", u2a.alias("u2_a"),
        (2 * F.col("n_a") * F.col("n_b") - u2a).cast("long")
         .alias("u2_b"),
        F.floor(u2a * F.lit(1_000_000)
                / (2 * F.col("n_a") * F.col("n_b"))).cast("long")
         .alias("auc_e6"))


def ab_conversion_ztest(df: DataFrame, user_col: str = "user_id",
                        type_col: str = "event_type",
                        convert_type: str = "purchase") -> DataFrame:
    """Two-proportion z-test of conversion between an A/B split
    (deterministic: user id parity): exact per-arm user and converter
    counts, then the pooled-variance z statistic computed ONCE on a
    pinned double tree, e6-floored — the experiment readout every
    event pipeline serves.

    One groupBy(user) pass (conversion flag = max over the user's
    events), one 2-row arm rollup, one scalar combine. Degenerate
    arms (zero users or zero variance) emit z = 0.
    """
    per_user = (df.select(F.col(user_col).alias("u"),
                          (F.col(type_col) == convert_type)
                          .cast("long").alias("cv"))
                .groupBy("u")
                .agg(F.max("cv").alias("converted")))
    arms = (per_user.select(
        (F.col("u") % 2 == 0).cast("int").alias("arm_a"),
        "converted")
        .groupBy().agg(
            F.sum(F.when(F.col("arm_a") == 1, 1).otherwise(0))
             .cast("long").alias("n_a"),
            F.sum(F.when(F.col("arm_a") == 1, F.col("converted"))
                  .otherwise(0)).cast("long").alias("x_a"),
            F.sum(F.when(F.col("arm_a") == 0, 1).otherwise(0))
             .cast("long").alias("n_b"),
            F.sum(F.when(F.col("arm_a") == 0, F.col("converted"))
                  .otherwise(0)).cast("long").alias("x_b")))
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    p = (xa + xb) / (na + nb)
    var = (p * (1.0 - p)) * ((1.0 / na) + (1.0 / nb))
    z = ((xa / na) - (xb / nb)) / F.sqrt(var)
    return arms.select(
        "n_a", "x_a", "n_b", "x_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0.0),
               F.floor(z * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("z_e6"))


def spearman_by_group(df: DataFrame, group_col: str, x, y) -> DataFrame:
    """Tie-correct Spearman rank correlation per group, EXACT until
    the last division: midranks are computed on the DOUBLED grid
    (``2·midrank(v) = 2·c_before + c_v + 1`` — the Mann-Whitney
    identity, always an integer), each row joins back to its two rank
    tables, and Pearson's closed form runs on exact decimal(38)
    moments of the doubled ranks (Pearson is scale-invariant, so the
    ×2 cancels). One pinned double tree at the end, floored at e6 —
    the same contract as ``pearson_qty_price``.

    Plan shape: two per-(group, value) hash-aggs, two group-partitioned
    rank windows (parallel across groups — never a global sort), two
    shuffle joins back on (group, value), one tiny moments agg.
    Headroom: doubled ranks ≤ 2n, so n·Σr⁴-scale moments fit
    decimal(38) to ~3·10⁹ rows per group; beyond, pre-center ranks on
    a broadcast first-pass mean.
    """
    from pyspark.sql import Window
    d = df.select(F.col(group_col).alias("g"),
                  x.cast("long").alias("x"), y.cast("long").alias("y"))

    def ranks(col: str) -> DataFrame:
        per_v = d.groupBy("g", col).agg(F.count("*").alias("c_v"))
        w = (Window.partitionBy("g").orderBy(col)
             .rowsBetween(Window.unboundedPreceding, 0))
        return per_v.select(
            "g", col,
            (2 * (F.sum("c_v").over(w) - F.col("c_v"))
             + F.col("c_v") + 1).alias(f"r{col}"))

    j = (d.join(ranks("x"), ["g", "x"]).join(ranks("y"), ["g", "y"]))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    agg = j.groupBy("g").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("rx").cast(dec)).alias("sx"),
        F.sum(F.col("ry").cast(dec)).alias("sy"),
        F.sum(F.col("rx").cast(d19) * F.col("rx").cast(d19)).alias("sxx"),
        F.sum(F.col("ry").cast(d19) * F.col("ry").cast(d19)).alias("syy"),
        F.sum(F.col("rx").cast(d19) * F.col("ry").cast(d19)).alias("sxy"))
    n, sx, sy, sxx, syy, sxy = [
        F.col(c).cast("double")
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.when(den > 0.0, F.floor(num / den * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("spearman_e6"))


PSI_SPLIT_TS = "2024-01-16 00:00:00"   # reference | actual boundary
_PSI_BINS = 10


def psi_value_drift(df: DataFrame, split_ts: str = PSI_SPLIT_TS,
                    val_col: str = "value",
                    ts_col: str = "ts") -> DataFrame:
    """Population Stability Index of the value distribution across a
    time split — the drift audit every scoring pipeline runs before
    trusting a model on this week's data.

    Bin edges are the REFERENCE half's exact nearest-rank deciles
    (cumulative distinct-value counts, k = ceil(p·n) — never an
    interpolated percentile), so both engines derive identical cuts
    from identical integer arithmetic. Counts per bin are exact
    BIGINTs with Laplace +1 smoothing (an empty actual-side bin stays
    finite and deterministic); each bin's (pa−pb)·ln(pa/pb) term runs
    ONCE on a pinned double tree and floors at e6; the headline PSI is
    the exact integer sum of the floored terms.

    Plan shape: one cents-quantized scan, one per-value agg + ordered
    window on the reference's DISTINCT values (the only unpartitioned
    window — |distinct cents| rows, not |rows|; range-partition the
    rank for a wider domain), a 1-row broadcast of the 9 cuts, one
    10-bin agg. No shuffle carries more than |distinct| rows.
    """
    from pyspark.sql import Window
    v = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    ev = df.select(v.alias("v"),
                   (F.col(ts_col) < F.lit(split_ts).cast("timestamp"))
                   .cast("long").alias("is_ref"))
    ref = ev.where(F.col("is_ref") == 1)
    per_v = ref.groupBy("v").agg(F.count("*").alias("c_v"))
    # bucketed prefix sum + broadcast total over the reference value
    # grid (operators.scale) — no single-task value-domain sort
    from .scale import dist_cumsum
    nr = per_v.groupBy().agg(F.sum("c_v").cast("long").alias("n_ref"))
    cum = (dist_cumsum(per_v, "v", {"cum": "c_v"})
           .crossJoin(F.broadcast(nr)).select("v", "cum", "n_ref"))
    cuts = cum.groupBy().agg(*[
        F.min(F.when(F.col("cum") * 10 >= k * F.col("n_ref"),
                     F.col("v"))).alias(f"c{k}")
        for k in range(1, _PSI_BINS)])
    binned = ev.crossJoin(F.broadcast(cuts)).select(
        "is_ref",
        sum((F.col("v") > F.col(f"c{k}")).cast("long")
            for k in range(1, _PSI_BINS)).alias("bin"))
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("ca"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("cb"))
    bins = df.sparkSession.range(_PSI_BINS).select(
        F.col("id").cast("long").alias("bin"))
    full = (bins.join(counts, "bin", "left")
            .select("bin", F.coalesce("ca", F.lit(0)).alias("ca"),
                    F.coalesce("cb", F.lit(0)).alias("cb")))
    tot = Window.partitionBy()
    t = full.select(
        "bin", "ca", "cb",
        F.sum("ca").over(tot).alias("na"),
        F.sum("cb").over(tot).alias("nb"))
    pa = ((F.col("ca") + 1).cast("double")
          / (F.col("na") + _PSI_BINS).cast("double"))
    pb = ((F.col("cb") + 1).cast("double")
          / (F.col("nb") + _PSI_BINS).cast("double"))
    term = F.floor((pa - pb) * F.log(pa / pb) * 1e6).cast("long")
    out = t.select("bin", "ca", "cb", term.alias("psi_term_e6"))
    return out.select(
        "bin", "ca", "cb", "psi_term_e6",
        F.sum("psi_term_e6").over(Window.partitionBy())
         .cast("long").alias("psi_total_e6")).orderBy("bin")


def hourly_profile(df: DataFrame, val_col: str = "value",
                   ts_col: str = "ts") -> DataFrame:
    """Hour-of-day seasonality profile: exact event counts, exact
    cents sums, and the truncating-integer-division mean — the
    all-BIGINT baseline a deviation detector subtracts. One map-side
    combinable 24-group agg; trivially parallel at any scale."""
    v = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    return (df.select(F.hour(ts_col).alias("hour"), v.alias("v"))
            .groupBy("hour")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("v").cast("long").alias("sum_cents"),
                 F.expr("CAST(sum(v) DIV count(*) AS LONG)")
                  .alias("avg_cents"))
            .orderBy("hour"))


def seasonal_deviation_topk(df: DataFrame, k: int = 20,
                            val_col: str = "value",
                            ts_col: str = "ts") -> DataFrame:
    """Top-k events by absolute deviation from their hour-of-day mean
    (the seasonality-adjusted anomaly list). The 24-row profile
    broadcasts; the global top-k is orderBy+limit — Spark's
    TakeOrdered, a per-partition heap + driver merge, NEVER a
    single-partition rank window over all rows."""
    prof = hourly_profile(df, val_col, ts_col).select("hour", "avg_cents")
    v = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    ev = df.select("event_id", "event_type",
                   F.hour(ts_col).alias("hour"), v.alias("v"))
    return (ev.join(F.broadcast(prof), "hour")
            .select("event_id", "event_type", "hour", "v",
                    F.abs(F.col("v") - F.col("avg_cents"))
                     .cast("long").alias("deviation_cents"))
            .orderBy(F.col("deviation_cents").desc(), "event_id")
            .limit(k))


def kaplan_meier(df: DataFrame, target: str = "purchase",
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Kaplan-Meier survival curve of time-to-first-``target`` per
    user — the censoring-aware estimator behind every churn /
    conversion-latency analysis. A user's clock starts at their first
    observed event; users who never reach the target are right-censored
    at their last observed event (the standard convention: a user
    censored at exactly t is still at risk at t, i.e. censoring is
    processed after events at ties).

    Exactness: durations, at-risk counts and event counts are all
    BIGINTs derived from one ordered window over the DISTINCT duration
    grid (|distinct seconds| rows, not |users|). Each hazard term
    ln((n−d)/n) runs ONCE per event time on a pinned double tree and
    floors at e9; the cumulative log-survival is the EXACT integer sum
    of floored terms, and the final S(t) = exp(log/1e9) is one more
    pinned op floored at e6. An all-events-at-risk tail (n == d) pins
    the term to -1e11 → S underflows to exactly 0 in both engines.

    Plan shape: one per-user agg (the only |rows|-scale shuffle), one
    per-duration agg, one ordered window over the duration grid —
    range-partition that window's sort at a wider duration domain.
    """
    from pyspark.sql import Window
    per_user = df.groupBy(user_col).agg(
        F.min(_ts_s(ts_col)).alias("first_s"),
        F.min(F.when(F.col(type_col) == target,
                     _ts_s(ts_col))).alias("ev_s"),
        F.max(_ts_s(ts_col)).alias("last_s"))
    dur = per_user.select(
        F.coalesce(F.col("ev_s") - F.col("first_s"),
                   F.col("last_s") - F.col("first_s")).alias("t"),
        F.col("ev_s").isNotNull().cast("long").alias("is_event"))
    pts = dur.groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.sum(1 - F.col("is_event")).cast("long").alias("c"))
    # both duration-grid running sums go through the bucketed two-phase
    # helper (operators.scale): n_risk = total − exclusive-cumsum, and
    # the log-survival accumulation — no single-task sort of the
    # duration domain
    from .scale import dist_cumsum
    ntot = pts.groupBy().agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_tot"))
    risk = (dist_cumsum(pts.withColumn("dc", F.col("d") + F.col("c")),
                        "t", {"dc_before": "dc"}, inclusive=False)
            .crossJoin(F.broadcast(ntot))
            .select("t", "d", "c",
                    (F.col("n_tot") - F.col("dc_before")).cast("long")
                    .alias("n_risk")))
    ev = risk.where(F.col("d") >= 1)
    n_d, d_d = F.col("n_risk").cast("double"), F.col("d").cast("double")
    term = (F.when(F.col("d") >= F.col("n_risk"),
                   F.lit(-100_000_000_000))
            .otherwise(F.floor(F.log((n_d - d_d) / n_d) * 1e9))
            .cast("long"))
    with_log = dist_cumsum(
        ev.select("t", "n_risk", "d", "c", term.alias("term_e9")),
        "t", {"log_surv_e9": "term_e9"}) \
        .select("t", "n_risk", "d", "c", "log_surv_e9")
    surv = F.floor(
        F.exp(F.col("log_surv_e9").cast("double") / 1e9) * 1e6)
    return with_log.select(
        "t", "n_risk", F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"), "log_surv_e9",
        surv.cast("long").alias("surv_e6")).orderBy("t")


def wmape_seasonal_naive(df: DataFrame, val_col: str = "value",
                         type_col: str = "event_type",
                         ts_col: str = "ts") -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict each (type,
    day, hour) bucket's total with the PREVIOUS OBSERVED day's same
    hour) scored by WMAPE = Σ|actual − pred| / Σ|actual| — the
    denominator-stable variant of MAPE (a zero-actual bucket
    contributes error mass instead of dividing by zero).

    All-integer until the end: bucket totals are exact cents sums, the
    lag runs over a (type, hour)-PARTITIONED window ordered by day
    (parallel across 24·|types| series — never a global sort), both
    error sums are exact BIGINTs, and the single WMAPE division runs
    once per type, floored at e6."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    g = (df.select(F.col(type_col).alias("event_type"),
                   F.to_date(ts_col).alias("day"),
                   F.hour(ts_col).alias("hour"), cents.alias("v"))
         .groupBy("event_type", "day", "hour")
         .agg(F.sum("v").cast("long").alias("actual")))
    w = Window.partitionBy("event_type", "hour").orderBy("day")
    scored = (g.withColumn("pred", F.lag("actual").over(w))
              .where(F.col("pred").isNotNull()))
    agg = scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_periods"),
        F.sum(F.abs(F.col("actual") - F.col("pred")))
         .cast("long").alias("sum_abs_err"),
        F.sum(F.abs("actual")).cast("long").alias("sum_abs_actual"))
    wmape = F.floor(F.col("sum_abs_err").cast("double")
                    / F.col("sum_abs_actual").cast("double") * 1e6)
    return agg.select(
        "event_type", "n_periods", "sum_abs_err", "sum_abs_actual",
        F.when(F.col("sum_abs_actual") > 0, wmape)
         .otherwise(F.lit(0)).cast("long").alias("wmape_e6")
    ).orderBy("event_type")


def max_concurrency_by_type(df: DataFrame, duration_s: int = 300,
                            ts_col: str = "ts") -> DataFrame:
    """Peak concurrency per event type, treating each event as a
    half-open interval [ts, ts+duration): the classic sweep-line as
    pure SQL. Collapsing to per-DISTINCT-instant net deltas (starts −
    ends) makes the running sum tie-proof — an end at instant t
    releases its slot before a start at t claims one, exactly the
    half-open semantics — and deterministic regardless of row order
    within a tie. Windows are partitioned BY TYPE, so the sort
    parallelizes across types; per-type instant counts are what
    shuffles, not raw events."""
    from pyspark.sql import Window
    s = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    starts = df.select("event_type", s.alias("t"),
                       F.lit(1).alias("d"))
    ends = df.select("event_type", (s + duration_s).alias("t"),
                     F.lit(-1).alias("d"))
    net = (starts.unionAll(ends)
           .groupBy("event_type", "t")
           .agg(F.sum("d").cast("long").alias("net")))
    w = (Window.partitionBy("event_type").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    run = net.select("event_type", "t",
                     F.sum("net").over(w).alias("running"))
    peak = run.groupBy("event_type").agg(
        F.max("running").cast("long").alias("max_concurrent"))
    first = (run.join(peak, "event_type")
             .where(F.col("running") == F.col("max_concurrent"))
             .groupBy("event_type", "max_concurrent")
             .agg(F.min("t").cast("long").alias("peak_epoch_s")))
    return first.orderBy("event_type")


_LORENZ_BINS = 10


def lorenz_deciles(df: DataFrame, user_col: str = "user_id",
                   val_col: str = "value") -> DataFrame:
    """Lorenz concentration curve of per-user spend: users bucketed
    into deciles by total cents (exact nearest-rank cuts over the
    DISTINCT total grid — the PSI binning pattern), cumulative share
    of total value per decile — the curve behind the exact-Gini
    profiler, answering "the top 10% of users carry what share?".

    All-integer: totals are exact cents sums; the decile cuts come
    from cumulative DISTINCT-total counts (k·n ≤ 10·cum comparisons,
    never an interpolated percentile); per-bin sums are exact BIGINTs
    and the share divisions floor at e6 on the 10-row frame. Ties on
    a cut value land in one deterministic bin (bin = #cuts strictly
    below), so engines can't disagree on boundary users.

    Plan: one |users| agg, one |distinct totals| agg + ordered window
    on that grid (range-partition it at wider domains), a 1-row
    broadcast of 9 cuts, one 10-row agg + windows."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    totals = (df.select(F.col(user_col).alias("u"), cents.alias("v"))
              .groupBy("u").agg(F.sum("v").cast("long").alias("tot")))
    per_v = totals.groupBy("tot").agg(F.count("*").alias("c_v"))
    # bucketed prefix sum + broadcast total over the distinct-totals
    # grid (operators.scale) — no single-task sort
    from .scale import dist_cumsum
    nu = per_v.groupBy().agg(
        F.sum("c_v").cast("long").alias("n_users"))
    cum = (dist_cumsum(per_v, "tot", {"cum": "c_v"})
           .crossJoin(F.broadcast(nu))
           .select("tot", "cum", "n_users"))
    cuts = cum.groupBy().agg(*[
        F.min(F.when(F.col("cum") * _LORENZ_BINS
                     >= kk * F.col("n_users"), F.col("tot")))
         .alias(f"c{kk}") for kk in range(1, _LORENZ_BINS)])
    binned = totals.crossJoin(F.broadcast(cuts)).select(
        "tot",
        sum((F.col("tot") > F.col(f"c{kk}")).cast("long")
            for kk in range(1, _LORENZ_BINS)).alias("decile"))
    agg = binned.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("tot").cast("long").alias("sum_cents"))
    bins = df.sparkSession.range(_LORENZ_BINS).select(
        F.col("id").cast("long").alias("decile"))
    full = (bins.join(agg, "decile", "left")
            .select("decile",
                    F.coalesce("n_users", F.lit(0)).alias("n_users"),
                    F.coalesce("sum_cents", F.lit(0)).alias("sum_cents")))
    cumw = (Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, 0))
    tot_w = Window.partitionBy()
    t = full.select(
        "decile", "n_users", "sum_cents",
        F.sum("sum_cents").over(cumw).alias("cum_cents"),
        F.sum("sum_cents").over(tot_w).alias("all_cents"))
    share = F.floor(F.col("cum_cents").cast("double")
                    / F.col("all_cents").cast("double") * 1e6)
    return t.select(
        "decile", "n_users", "sum_cents",
        F.col("cum_cents").cast("long").alias("cum_cents"),
        F.when(F.col("all_cents") > 0, share)
         .otherwise(F.lit(0)).cast("long").alias("cum_share_e6")
    ).orderBy("decile")


HOLT_TAIL = 64


def holt_trend(df: DataFrame, tail: int = HOLT_TAIL,
               user_col: str = "user_id", ts_col: str = "ts",
               val_col: str = "value",
               id_col: str = "event_id") -> DataFrame:
    """Per-user Holt double exponential smoothing (level + trend,
    α = β = 1/2) over the LAST ``tail`` event values — the
    one-step-ahead forecaster that extends :func:`ewma_recent` with a
    trend component:

        l' = (v·64 + l + b) div 2        b' = (b + (l' − l)) div 2

    both folds on the ×64 cents grid, integer-exact on any engine
    (halving keeps everything in BIGINT through a pinned
    floor(x/2)). The fold INITIALIZES from the first tail element
    (l₀ = v₀·64, b₀ = 0) — exactly DuckDB's list_reduce convention,
    so the oracle needs no separate seed. Forecast = l + b.

    Bounded-tail collect keeps per-user memory at ≤ tail structs by
    construction; one key shuffle total."""
    v_c = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(F.col(user_col).alias("u"),
                     F.struct(F.col(ts_col).alias("ts"),
                              F.col(id_col).alias("eid"),
                              v_c.alias("v_c")).alias("rec"))
    tl = (base.groupBy("u")
          .agg(F.array_sort(F.collect_list("rec")).alias("arr"))
          .select("u", F.slice(
              F.col("arr"),
              F.greatest(F.lit(1), F.size("arr") - F.lit(tail - 1)),
              tail).alias("tl")))

    def step(acc, x):
        l2 = F.floor((x.getField("v_c") * F.lit(64)
                      + acc.getField("l") + acc.getField("b"))
                     / F.lit(2)).cast("long")
        b2 = F.floor((acc.getField("b") + (l2 - acc.getField("l")))
                     / F.lit(2)).cast("long")
        return F.struct(l2.alias("l"), b2.alias("b"))

    init = F.struct(
        (F.element_at("tl", 1).getField("v_c") * F.lit(64))
        .cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"))
    rest = F.slice("tl", 2, F.greatest(F.size("tl") - 1, F.lit(0)))
    folded = tl.select(
        "u", F.size("tl").alias("n_tail"),
        F.aggregate(rest, init, step).alias("st"))
    return folded.select(
        F.col("u").alias(user_col),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.col("st").getField("l").cast("long").alias("level_c64"),
        F.col("st").getField("b").cast("long").alias("trend_c64"),
        (F.col("st").getField("l") + F.col("st").getField("b"))
        .cast("long").alias("forecast_c64"))


def fano_factor(df: DataFrame, bucket_s: int = 3600,
                type_col: str = "event_type",
                ts_col: str = "ts") -> DataFrame:
    """Burstiness per event type: the Fano factor (variance / mean of
    per-hour-bucket counts) over OBSERVED buckets — ≈1 for a Poisson
    arrival process, >1 for bursty traffic, <1 for regular/paced.
    The dispersion screen that separates organic from scripted
    activity.

    Exact to the last op: bucket counts are BIGINTs, the moment sums
    accumulate as decimal(38), and F = (n·Σc² − S²)/(n·S) runs ONCE
    per type on a pinned double tree, floored at e6. Two small
    aggs — per-(type, bucket), then per-type."""
    b = df.select(F.col(type_col).alias("event_type"),
                  F.floor(_ts_s(ts_col) / bucket_s).cast("long")
                   .alias("bucket"))
    counts = b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("c"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    agg = counts.groupBy("event_type").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("c").cast(dec)).alias("s"),
        F.sum(F.col("c").cast(d19) * F.col("c").cast(d19)).alias("q"))
    n, s, q = [F.col(c).cast("double") for c in ("n", "s", "q")]
    fano = F.floor((n * q - s * s) / (n * s) * 1e6)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_buckets"),
        F.col("s").cast("long").alias("n_events"),
        F.when(F.col("s") > 0, fano).otherwise(F.lit(0))
         .cast("long").alias("fano_e6")).orderBy("event_type")


def cohort_ltv(df: DataFrame, user_col: str = "user_id",
               type_col: str = "event_type", val_col: str = "value",
               ts_col: str = "ts", target: str = "purchase") -> DataFrame:
    """Cohort lifetime-value triangle: users cohorted by first-event
    epoch day, cumulative purchase revenue per (cohort, day offset),
    and average LTV per cohort user — the revenue twin of
    :func:`retention_cohorts`, ALL-INTEGER end to end (the per-user
    average is cents·100 integer division, no FP anywhere).

    Offsets are the OBSERVED purchase days (sparse triangle); the
    cumulative window is cohort-partitioned — parallel across
    cohorts. Plan: one |users| agg for cohort day, one purchase
    rollup, a cohort-size join, one partitioned window."""
    from pyspark.sql import Window
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    e = df.select(F.col(user_col).alias("u"), day.alias("day"),
                  F.col(type_col).alias("et"),
                  F.floor(F.col(val_col) * 100 + F.lit(0.5))
                   .cast("long").alias("cents"))
    cohorts = e.groupBy("u").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("n_cohort_users"))
    rev = (e.where(F.col("et") == target)
           .join(cohorts, "u")
           .groupBy("cohort_day",
                    (F.col("day") - F.col("cohort_day"))
                    .alias("day_offset"))
           .agg(F.sum("cents").cast("long").alias("rev_cents")))
    w = (Window.partitionBy("cohort_day").orderBy("day_offset")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = rev.select("cohort_day", "day_offset", "rev_cents",
                     F.sum("rev_cents").over(w).cast("long")
                      .alias("cum_rev_cents"))
    return (cum.join(sizes, "cohort_day")
            .select("cohort_day", "day_offset", "rev_cents",
                    "cum_rev_cents", "n_cohort_users",
                    F.expr("(cum_rev_cents * 100) div n_cohort_users")
                     .cast("long").alias("avg_ltv_c100"))
            .orderBy("cohort_day", "day_offset"))


_STL_HALF = 12  # centered trend window: ±12 observed hourly buckets


def stl_lite(df: DataFrame, type_col: str = "event_type",
             val_col: str = "value", ts_col: str = "ts") -> DataFrame:
    """Additive seasonal-trend decomposition (STL-lite) of the hourly
    value series per event type: y = trend + seasonal + residual.

    * trend: centered moving average over ±12 OBSERVED hourly buckets
      (one pinned floor(sum/count) per row — never an FP running
      mean), type-partitioned window;
    * seasonal: per (type, hour-of-day) pinned-floored mean of the
      detrended series;
    * residual: the exact integer remainder.

    Deterministic: bucket totals are exact cents BIGINTs and each
    division is a single pinned floor. Windows and aggs are all
    type-partitioned — the sort parallelizes across types, and the
    seasonal join is a 24·|types|-row broadcast."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    g = (df.select(F.col(type_col).alias("event_type"),
                   F.floor(_ts_s(ts_col) / 3600).cast("long")
                    .alias("bucket"), cents.alias("v"))
         .groupBy("event_type", "bucket")
         .agg(F.sum("v").cast("long").alias("y")))
    wt = (Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(-_STL_HALF, _STL_HALF))
    trend = F.floor(F.sum("y").over(wt).cast("double")
                    / F.count("y").over(wt).cast("double")).cast("long")
    t = g.select("event_type", "bucket", "y", trend.alias("trend"),
                 F.pmod(F.col("bucket"), F.lit(24)).cast("long")
                  .alias("hod"))
    t = t.withColumn("detr", F.col("y") - F.col("trend"))
    seas = (t.groupBy("event_type", "hod")
            .agg(F.floor(F.sum("detr").cast("double")
                         / F.count("*").cast("double"))
                 .cast("long").alias("seasonal")))
    out = (t.join(F.broadcast(seas), ["event_type", "hod"])
           .select("event_type", "bucket", "y", "trend", "seasonal",
                   (F.col("y") - F.col("trend") - F.col("seasonal"))
                   .cast("long").alias("residual")))
    return out.orderBy("event_type", "bucket")


def stage_transition_medians(df: DataFrame,
                             stages: tuple[str, ...] = FUNNEL_STAGES,
                             within_s: int = FUNNEL_WINDOW_S,
                             user_col: str = "user_id",
                             type_col: str = "event_type",
                             ts_col: str = "ts") -> DataFrame:
    """Median seconds between consecutive funnel stages over
    converting users — the latency profile behind the funnel counts
    ("users click a median of N s after viewing"). Composes
    :func:`stage_times` (same single-exchange gather as the funnel).

    Medians are the exact LOW median (rank (n+1) div 2 in the sorted
    deltas — the nearest-rank convention every exact-median operator
    in this package uses), selected by a stage-PARTITIONED rank
    window; ties on the delta value make the selected VALUE
    deterministic regardless of row order. All-integer end to end."""
    from pyspark.sql import Window
    st = stage_times(df, stages, within_s, user_col, type_col, ts_col)
    deltas = None
    for i in range(1, len(stages)):
        d = st.where(F.col(f"t{i}").isNotNull()).select(
            F.lit(f"{stages[i - 1]}_to_{stages[i]}").alias("transition"),
            (F.col(f"t{i}") - F.col(f"t{i - 1}")).cast("long")
            .alias("delta_s"))
        deltas = d if deltas is None else deltas.unionAll(d)
    w = Window.partitionBy("transition").orderBy("delta_s")
    ranked = deltas.select(
        "transition", "delta_s",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("transition")).alias("n"))
    return (ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("transition",
                    F.col("n").cast("long").alias("n_converted"),
                    F.col("delta_s").alias("median_delta_s"))
            .orderBy("transition"))


def logrank_test(df: DataFrame, target: str = "purchase",
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Log-rank test between the two A/B arms' time-to-first-target
    survival curves (arm = user_id parity, matching
    :func:`ab_conversion_ztest`) — the censoring-aware significance
    companion to :func:`kaplan_meier`: is arm B's conversion latency
    distribution actually different?

    Exactness: the risk grid (per-arm at-risk and event counts at
    every pooled distinct duration) is pure BIGINT window arithmetic;
    each time's observed-minus-expected term (d1 − d·n1/n) and
    hypergeometric variance term run ONCE on pinned double trees
    floored at e9; the sums are exact integer sums of floored terms,
    and the final z combines once, floored at e6.

    One |users| agg, one |distinct durations| agg + ONE ordered
    window carrying four cumulative counters, a 1-row rollup."""
    from pyspark.sql import Window
    per_user = df.groupBy(user_col).agg(
        F.min(_ts_s(ts_col)).alias("first_s"),
        F.min(F.when(F.col(type_col) == target,
                     _ts_s(ts_col))).alias("ev_s"),
        F.max(_ts_s(ts_col)).alias("last_s"))
    dur = per_user.select(
        F.coalesce(F.col("ev_s") - F.col("first_s"),
                   F.col("last_s") - F.col("first_s")).alias("t"),
        F.col("ev_s").isNotNull().cast("long").alias("is_event"),
        F.pmod(F.col(user_col), F.lit(2)).cast("long").alias("arm"))
    pts = dur.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("is_event"))
               .otherwise(F.lit(0))).cast("long").alias("d1"),
        F.sum(F.when(F.col("arm") == 0, 1 - F.col("is_event"))
               .otherwise(F.lit(0))).cast("long").alias("c1"),
        F.sum(F.when(F.col("arm") == 1, F.col("is_event"))
               .otherwise(F.lit(0))).cast("long").alias("d2"),
        F.sum(F.when(F.col("arm") == 1, 1 - F.col("is_event"))
               .otherwise(F.lit(0))).cast("long").alias("c2"))
    # per-arm at-risk censuses via bucketed exclusive prefix sums +
    # broadcast totals (operators.scale) — no single-task sort of the
    # duration domain
    from .scale import dist_cumsum
    ntot = pts.groupBy().agg(
        F.sum(F.col("d1") + F.col("c1")).cast("long").alias("t1"),
        F.sum(F.col("d2") + F.col("c2")).cast("long").alias("t2"))
    pre = dist_cumsum(
        pts.withColumn("a1", F.col("d1") + F.col("c1"))
           .withColumn("a2", F.col("d2") + F.col("c2")),
        "t", {"b1": "a1", "b2": "a2"}, inclusive=False)
    risk = (pre.crossJoin(F.broadcast(ntot))
            .select("t", "d1", "d2",
                    (F.col("t1") - F.col("b1")).cast("long").alias("n1"),
                    (F.col("t2") - F.col("b2")).cast("long").alias("n2")))
    ev = risk.where((F.col("d1") + F.col("d2")) >= 1)
    n = (F.col("n1") + F.col("n2")).cast("double")
    d = (F.col("d1") + F.col("d2")).cast("double")
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    oe = F.floor((F.col("d1").cast("double") - d * n1d / n) * 1e9)
    v = F.when(
        n > 1.0,
        F.floor(d * (n1d / n) * (n2d / n)
                * ((n - d) / (n - F.lit(1.0))) * 1e9)
    ).otherwise(F.lit(0))
    agg = ev.select(oe.cast("long").alias("oe_e9"),
                    v.cast("long").alias("v_e9")).groupBy().agg(
        F.count("*").cast("long").alias("n_times"),
        F.sum("oe_e9").cast("long").alias("o_minus_e_e9"),
        F.sum("v_e9").cast("long").alias("var_e9"))
    z = ((F.col("o_minus_e_e9").cast("double") / 1e9)
         / F.sqrt(F.col("var_e9").cast("double") / 1e9))
    return agg.select(
        "n_times", "o_minus_e_e9", "var_e9",
        F.when(F.col("var_e9") > 0, F.floor(z * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("z_e6"))


def interevent_gap_histogram(df: DataFrame, user_col: str = "user_id",
                             ts_col: str = "ts",
                             id_col: str = "event_id") -> DataFrame:
    """Log2-bucketed histogram of per-user inter-event gaps — the
    burst/idle-time profile behind sessionization-gap tuning (pick
    the session gap where the histogram's bimodal valley sits).

    The log2 bucket is INTEGER arithmetic on both engines:
    ``length(bin(gap)) − 1`` = floor(log2(gap)) for gap ≥ 1 — no FP
    log anywhere; zero-second gaps (same-second events) get bucket
    −1 explicitly. One lag window partitioned by user, one tiny
    agg."""
    from pyspark.sql import Window
    e = df.select(F.col(user_col).alias("u"),
                  _ts_s(ts_col).alias("s"),
                  F.col(id_col).alias("eid"))
    w = Window.partitionBy("u").orderBy("s", "eid")
    gaps = (e.select((F.col("s") - F.lag("s").over(w)).alias("gap"))
            .where(F.col("gap").isNotNull()))
    bucket = (F.when(F.col("gap") <= 0, F.lit(-1))
              .otherwise(F.length(F.bin(F.col("gap"))) - 1)
              .cast("long"))
    return (gaps.select(bucket.alias("log2_bucket"))
            .groupBy("log2_bucket")
            .agg(F.count("*").cast("long").alias("n_gaps"))
            .orderBy("log2_bucket"))


def top_trigram_journeys(df: DataFrame, k: int = 20,
                         user_col: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts",
                         id_col: str = "event_id") -> DataFrame:
    """Most common 3-step behavior sequences: per user, events order
    by (ts, id), each type encodes as its first letter, and every
    consecutive triple counts once — the sequence-mining rollup one
    step beyond the pairwise transition matrix.

    Plan: ONE user-partitioned window carrying two leads (no
    journey-string materialization, no self-joins), a trigram count
    agg, TakeOrdered top-k with a deterministic trigram tie-break."""
    from pyspark.sql import Window
    e = df.select(F.col(user_col).alias("u"),
                  _ts_s(ts_col).alias("s"), F.col(id_col).alias("eid"),
                  F.substring(F.col(type_col), 1, 1).alias("c"))
    w = Window.partitionBy("u").orderBy("s", "eid")
    tri = (e.select(F.concat(F.col("c"), F.lead("c", 1).over(w),
                             F.lead("c", 2).over(w)).alias("trigram"))
           .where(F.col("trigram").isNotNull()))
    return (tri.groupBy("trigram")
            .agg(F.count("*").cast("long").alias("n_journeys"))
            .orderBy(F.col("n_journeys").desc(), F.col("trigram").asc())
            .limit(k))


def dau_wau_stickiness(df: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per observed day — the
    engagement dashboard headline. Exact distinct counts at any
    scale: each distinct (user, active day) row fans out to the ≤7
    future days whose WAU window contains it (a bounded explode —
    never a distinct-over-range-window, which Spark cannot do
    exactly), then one distinct count per day. Stickiness is the
    all-integer (DAU·1e6) div WAU.

    Output rows are the OBSERVED activity days (a day with zero
    events has no DAU row to report)."""
    ud = (df.select(F.col(user_col).alias("u"),
                    F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
                     .alias("day"))
          .distinct())
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    fanned = ud.select(
        "u", F.explode(F.sequence(
            F.col("day"), F.col("day") + F.lit(6))).alias("wday"))
    wau = (fanned.distinct()
           .groupBy("wday").agg(F.count("*").cast("long").alias("wau")))
    return (dau.join(wau, dau.day == wau.wday)
            .select("day", "dau", "wau",
                    F.expr("(dau * 1000000) div wau").cast("long")
                    .alias("stickiness_e6"))
            .orderBy("day"))


def conformal_forecast_intervals(df: DataFrame,
                                 alpha_num: int = 1,
                                 alpha_den: int = 10,
                                 val_col: str = "value",
                                 type_col: str = "event_type",
                                 ts_col: str = "ts") -> DataFrame:
    """Split-conformal prediction interval for the seasonal-naive
    forecaster: the per-type calibration quantile q̂ = the
    ⌈(1−α)(n+1)⌉-th smallest absolute residual — the
    distribution-free coverage guarantee (P(|err| ≤ q̂) ≥ 1−α) every
    modern forecasting service attaches to its point predictions.

    Residuals come from the same lag-over-(type,hour) grid as
    :func:`wmape_seasonal_naive`; the quantile is exact nearest-rank
    selection over a type-PARTITIONED rank window (never an
    interpolated percentile); everything stays BIGINT."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    g = (df.select(F.col(type_col).alias("event_type"),
                   F.to_date(ts_col).alias("day"),
                   F.hour(ts_col).alias("hour"), cents.alias("v"))
         .groupBy("event_type", "day", "hour")
         .agg(F.sum("v").cast("long").alias("actual")))
    w = Window.partitionBy("event_type", "hour").orderBy("day")
    scored = (g.withColumn("pred", F.lag("actual").over(w))
              .where(F.col("pred").isNotNull())
              .select("event_type",
                      F.abs(F.col("actual") - F.col("pred"))
                      .cast("long").alias("absr")))
    rw = Window.partitionBy("event_type").orderBy("absr")
    ranked = scored.select(
        "event_type", "absr",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"))
    # ceil((1-alpha)(n+1)) clamped to n — POSITIVE-operand integer
    # arithmetic only: ceil(a/b) = (a + b - 1) div b. (The negated
    # form -((-a) div b) is a cross-engine trap: Spark's div
    # TRUNCATES toward zero while DuckDB's // FLOORS, so they
    # disagree on every non-divisible negative intermediate.)
    num = alpha_den - alpha_num
    target = F.least(
        F.col("n"),
        F.expr(f"({num} * (n + 1) + {alpha_den - 1})"
               f" div {alpha_den}"))
    return (ranked.where(F.col("rn") == target)
            .select("event_type", F.col("n").cast("long")
                    .alias("n_calibration"),
                    F.col("absr").alias("qhat_cents"))
            .orderBy("event_type"))


def churn_labels(df: DataFrame, inactive_days: int = 7,
                 user_col: str = "user_id",
                 ts_col: str = "ts") -> DataFrame:
    """Churn label generation: a user is churned when their last
    observed activity is ≥ ``inactive_days`` epoch days before the
    corpus's last day — the label every retention model trains on,
    derived relationally (the corpus horizon is a 1-row broadcast,
    never a driver-side collect). Output: per-user label plus
    per-arm (user parity) churn rates in the same frame shape as the
    A/B tooling."""
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    per_user = df.groupBy(user_col).agg(F.max(day).alias("last_day"))
    horizon = per_user.groupBy().agg(
        F.max("last_day").alias("max_day"))
    lab = (per_user.crossJoin(F.broadcast(horizon))
           .select(F.col(user_col),
                   F.pmod(F.col(user_col), F.lit(2)).cast("long")
                    .alias("arm"),
                   (F.col("max_day") - F.col("last_day"))
                   .cast("long").alias("idle_days"),
                   ((F.col("max_day") - F.col("last_day"))
                    >= inactive_days).cast("long").alias("churned")))
    return (lab.groupBy("arm")
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.sum("churned").cast("long").alias("n_churned"))
            .select("arm", "n_users", "n_churned",
                    F.expr("(n_churned * 1000000) div n_users")
                    .cast("long").alias("churn_rate_e6"))
            .orderBy("arm"))


def first_touch_attribution(df: DataFrame,
                            within_s: int = ATTRIBUTION_WINDOW_S,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id") -> DataFrame:
    """First-touch attribution: each purchase credits the EARLIEST
    view inside the trailing ``within_s`` window — the acquisition-
    oriented twin of :func:`purchase_attribution` (last-touch). Same
    one-ordered-window shape, but "earliest within a bounded look-
    back" needs a min over the in-window view structs, so the frame
    gathers the candidate structs with ``min`` over a ROWS frame and
    the window bound applies as a post-filter on the min's timestamp
    — still no self-join, still O(sorted run) per user.

    Caveat vs last-touch (documented, deliberate): ``min`` over the
    unbounded-preceding frame finds the earliest view EVER; views
    older than the window are then rejected, which matches "first
    touch within window" only when touches are contiguous — the
    standard approximation when the alternative is a range self-join.
    The exact-window variant is the range join
    (`range_join_price_bands` machinery) if a user needs it."""
    from pyspark.sql import Window
    base = df.select(F.col(user_col).alias("u"),
                     _ts_s(ts_col).alias("ts_s"),
                     F.col(id_col).alias("eid"),
                     F.col(type_col).alias("et"))
    w = (Window.partitionBy("u").orderBy("ts_s", "eid")
         .rowsBetween(Window.unboundedPreceding, -1))
    firstview = F.min(
        F.when(F.col("et") == "view",
               F.struct(F.col("ts_s").alias("vts"),
                        F.col("eid").alias("vid")))).over(w)
    scored = (base.withColumn("fv", firstview)
              .where(F.col("et") == "purchase"))
    ok = (F.col("fv").isNotNull()
          & ((F.col("ts_s") - F.col("fv.vts")) <= within_s))
    return scored.select(
        F.col("eid").alias("purchase_id"),
        F.col("u").alias(user_col),
        F.when(ok, F.col("fv.vid")).otherwise(F.lit(-1)).cast("long")
         .alias("attributed_view_id"),
        F.when(ok, F.col("ts_s") - F.col("fv.vts")).otherwise(F.lit(-1))
         .cast("long").alias("view_to_purchase_s"))


def session_duration_histogram(df: DataFrame, gap_s: int = 1800,
                               user_col: str = "user_id",
                               ts_col: str = "ts",
                               id_col: str = "event_id") -> DataFrame:
    """Log2-bucketed histogram of session durations (last event −
    first event per gap-session) plus the count of single-event
    sessions (bucket −1) — the dashboard twin of
    :func:`interevent_gap_histogram`, composed on the verified
    sessionizer's cumulative-flag machinery."""
    from pyspark.sql import Window
    w = Window.partitionBy("u").orderBy("ts_s", "eid")
    base = df.select(F.col(user_col).alias("u"),
                     _ts_s(ts_col).alias("ts_s"),
                     F.col(id_col).alias("eid"))
    flagged = base.select(
        "u", "ts_s", "eid",
        F.when(F.lag("ts_s").over(w).isNull()
               | ((F.col("ts_s") - F.lag("ts_s").over(w)) > gap_s),
               F.lit(1)).otherwise(F.lit(0)).alias("ns"))
    cum = (Window.partitionBy("u").orderBy("ts_s", "eid")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = flagged.select(
        "u", "ts_s", F.sum("ns").over(cum).alias("sid"))
    per_sess = sess.groupBy("u", "sid").agg(
        (F.max("ts_s") - F.min("ts_s")).cast("long").alias("dur"))
    bucket = (F.when(F.col("dur") <= 0, F.lit(-1))
              .otherwise(F.length(F.bin(F.col("dur"))) - 1)
              .cast("long"))
    return (per_sess.select(bucket.alias("log2_bucket"))
            .groupBy("log2_bucket")
            .agg(F.count("*").cast("long").alias("n_sessions"))
            .orderBy("log2_bucket"))


def rolling_corr_daily(df: DataFrame, type_a: str = "view",
                       type_b: str = "purchase", window_days: int = 14,
                       val_col: str = "value", type_col: str = "event_type",
                       ts_col: str = "ts") -> DataFrame:
    """Trailing ``window_days`` correlation between two event types'
    daily cents totals — the co-movement monitor ("do purchases still
    track views this fortnight?"). The moment sums (n, Σx, Σy, Σx²,
    Σy², Σxy) accumulate through SIX value-based RANGE frames over
    the integer day axis — exact BIGINTs, merge-order-proof — and
    Pearson's closed form runs ONCE per output day on a pinned double
    tree floored at e6 (zero-variance windows pin to 0).

    One |days|-row frame after the daily rollup; range-partition the
    ordered window at a wider date domain."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.where(F.col(type_col).isin(type_a, type_b))
             .select(day.alias("day"), F.col(type_col).alias("et"),
                     cents.alias("v"))
             .groupBy("day")
             .agg(F.sum(F.when(F.col("et") == type_a, F.col("v"))
                         .otherwise(F.lit(0))).cast("long").alias("x"),
                  F.sum(F.when(F.col("et") == type_b, F.col("v"))
                         .otherwise(F.lit(0))).cast("long").alias("y")))
    w = Window.orderBy("day").rangeBetween(-(window_days - 1), 0)
    m = daily.select(
        "day", "x", "y",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"), F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"))
    n, sx, sy, sxx, syy, sxy = [
        F.col(c).cast("double")
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        "day", "x", "y", F.col("n").cast("long").alias("n_window"),
        F.when(den > 0.0, F.floor(num / den * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("corr_e6")
    ).orderBy("day")


def session_type_pmi(df: DataFrame, gap_s: int = 1800,
                     min_pair: int = 3,
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id") -> DataFrame:
    """PMI between event types CO-OCCURRING IN A SESSION — "which
    behaviors happen together within one visit" (the session-level
    association signal, stronger than global co-occurrence because
    the session bounds the time scale). Sessions come from the
    verified gap sessionizer; each session contributes its DISTINCT
    type set; pair/singleton counts are exact, and each surviving
    pair's ln(n·c_ab/(c_a·c_b)) runs once, pinned, floored at e6.

    Fan-out is bounded by |event-type vocabulary|² per session —
    single digits here, and the min_pair prune drops noise pairs
    before the ln."""
    from pyspark.sql import Window
    w = Window.partitionBy("u").orderBy("ts_s", "eid")
    base = df.select(F.col(user_col).alias("u"),
                     _ts_s(ts_col).alias("ts_s"),
                     F.col(id_col).alias("eid"),
                     F.col(type_col).alias("et"))
    flagged = base.select(
        "u", "ts_s", "eid", "et",
        F.when(F.lag("ts_s").over(w).isNull()
               | ((F.col("ts_s") - F.lag("ts_s").over(w)) > gap_s),
               F.lit(1)).otherwise(F.lit(0)).alias("ns"))
    cum = (Window.partitionBy("u").orderBy("ts_s", "eid")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = flagged.select(
        "u", "et", F.sum("ns").over(cum).alias("sid"))
    # st feeds FOUR consumers (both pair-join sides, the session
    # count, the singles agg) — left lazy the sessionize window
    # subtree ran once per consumer (the round-8 multi-consumer
    # sweep; narrow 3-col rows)
    st = materialize(sess.select("u", "sid", "et").distinct(),
                     "pmi_session_types", prefer="local")
    n_sess = st.select("u", "sid").distinct().groupBy().agg(
        F.count("*").cast("long").alias("n"))
    singles = st.groupBy("et").agg(F.count("*").alias("c"))
    a = st.select("u", "sid", F.col("et").alias("ta"))
    b = st.select("u", "sid", F.col("et").alias("tb"))
    pairs = (a.join(b, ["u", "sid"]).where(F.col("ta") < F.col("tb"))
             .groupBy("ta", "tb").agg(F.count("*").alias("c_ab"))
             .where(F.col("c_ab") >= min_pair))
    j = (pairs
         .join(singles.select(F.col("et").alias("ta"),
                              F.col("c").alias("c_a")), "ta")
         .join(singles.select(F.col("et").alias("tb"),
                              F.col("c").alias("c_b")), "tb")
         .crossJoin(F.broadcast(n_sess)))
    pmi = F.floor(F.log(
        F.col("n").cast("double") * F.col("c_ab").cast("double")
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double")))
        * 1e6)
    return (j.select("ta", "tb",
                     F.col("c_ab").cast("long").alias("n_cooccur"),
                     F.col("c_a").cast("long").alias("n_a"),
                     F.col("c_b").cast("long").alias("n_b"),
                     pmi.cast("long").alias("pmi_e6"))
            .orderBy("ta", "tb"))


def welch_t_value(df: DataFrame, user_col: str = "user_id",
                  val_col: str = "value") -> DataFrame:
    """Welch's unequal-variance t statistic between the A/B arms'
    event values — the mean-difference companion to the conversion
    z-test (which compares rates) and the Mann-Whitney U (which
    compares ranks): exact decimal moments per arm, one pinned
    t = (m₁−m₂)/√(s₁²/n₁ + s₂²/n₂) floored at e6, plus the
    Welch-Satterthwaite degrees of freedom floored at e3."""
    d = df.select(
        F.pmod(F.col(user_col), F.lit(2)).cast("long").alias("arm"),
        F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
         .alias("v"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    per = d.groupBy("arm").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum(F.col("v").cast(d19) * F.col("v").cast(d19)).alias("q"))
    a = per.where(F.col("arm") == 0).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("q").alias("q1"))
    b = per.where(F.col("arm") == 1).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"),
        F.col("q").alias("q2"))
    j = a.crossJoin(F.broadcast(b))
    n1, s1, q1, n2, s2, q2 = [F.col(c).cast("double") for c in
                              ("n1", "s1", "q1", "n2", "s2", "q2")]
    var1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - F.lit(1.0)))
    var2 = (n2 * q2 - s2 * s2) / (n2 * (n2 - F.lit(1.0)))
    se1, se2 = var1 / n1, var2 / n2
    t = (s1 / n1 - s2 / n2) / F.sqrt(se1 + se2)
    dof = ((se1 + se2) * (se1 + se2)
           / (se1 * se1 / (n1 - F.lit(1.0))
              + se2 * se2 / (n2 - F.lit(1.0))))
    ok = (F.col("n1").cast("long") > 1) & (F.col("n2").cast("long") > 1)
    return j.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.when(ok, F.floor(t * 1e6)).otherwise(F.lit(0))
         .cast("long").alias("t_e6"),
        F.when(ok, F.floor(dof * 1e3)).otherwise(F.lit(0))
         .cast("long").alias("dof_e3"))


def brown_forsythe(df: DataFrame, group_col: str = "event_type",
                   val_col: str = "value") -> DataFrame:
    """Brown-Forsythe variance-homogeneity test: one-way ANOVA F over
    z = |x − group LOW MEDIAN| — the robust Levene variant (median
    center, not mean) that guards the equal-variance assumption
    behind pooled tests. Medians are exact nearest-rank selections
    (group-partitioned windows); z is an exact BIGINT; the F combine
    reuses the exact-moment ANOVA machinery."""
    from pyspark.sql import Window
    from .. operators.aggregations import anova_oneway
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    d = df.select(F.col(group_col).alias("g"), cents.alias("v"))
    w = Window.partitionBy("g").orderBy("v")
    ranked = d.select(
        "g", "v", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"))
    med = (ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("g", F.col("v").alias("med")))
    z = (d.join(med, "g")
         .select("g", F.abs(F.col("v") - F.col("med")).alias("z")))
    return anova_oneway(z, "g", F.col("z")).withColumnRenamed(
        "f_e3", "bf_f_e3")


def runs_test_daily(df: DataFrame, type_col: str = "event_type",
                    val_col: str = "value",
                    ts_col: str = "ts") -> DataFrame:
    """Wald-Wolfowitz runs test on each type's daily-total series:
    are above/below-median days RANDOMLY ordered, or do they streak
    (trend / regime persistence)? Signs compare exact cents totals to
    the exact per-type LOW median (ties side with "below", both
    engines identically); the run count is 1 + Σ sign-changes via a
    type-partitioned lag; E[R] and Var[R] combine once per type on a
    pinned double tree, z floored at e6."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(F.col(type_col).alias("g"), day.alias("day"),
                       cents.alias("v"))
             .groupBy("g", "day").agg(F.sum("v").cast("long").alias("t")))
    wv = Window.partitionBy("g").orderBy("t")
    ranked = daily.select(
        "g", "day", "t", F.row_number().over(wv).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"))
    med = (ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("g", F.col("t").alias("med")))
    signed = (daily.join(med, "g")
              .select("g", "day",
                      (F.col("t") > F.col("med")).cast("long")
                      .alias("s")))
    wd = Window.partitionBy("g").orderBy("day")
    runs = signed.select(
        "g", "s",
        F.when(F.lag("s").over(wd).isNull()
               | (F.lag("s").over(wd) != F.col("s")), F.lit(1))
         .otherwise(F.lit(0)).alias("new_run"))
    agg = runs.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        F.sum("new_run").cast("long").alias("r"))
    n, n1 = F.col("n").cast("double"), F.col("n1").cast("double")
    n2 = n - n1
    e_r = F.lit(1.0) + 2.0 * n1 * n2 / n
    var_r = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
             / (n * n * (n - F.lit(1.0))))
    z = (F.col("r").cast("double") - e_r) / F.sqrt(var_r)
    ok = ((F.col("n1") > 0) & (F.col("n1") < F.col("n"))
          & (F.col("n") > 1))
    return agg.select(
        F.col("g").alias(type_col),
        F.col("n").alias("n_days"), F.col("n1").alias("n_above"),
        F.col("r").alias("n_runs"),
        F.when(ok & (var_r > 0.0), F.floor(z * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("z_e6")
    ).orderBy(type_col)


def kruskal_wallis(df: DataFrame, group_col: str = "event_type",
                   val_col: str = "value") -> DataFrame:
    """Kruskal-Wallis H across groups with the tie correction — the
    rank-based k-group test (ANOVA's nonparametric sibling, the
    k-group Mann-Whitney): global DOUBLED midranks (the integer MWU
    grid) from one per-distinct-value agg + ordered window, exact
    decimal rank sums per group, H and the tie factor
    C = 1 − Σ(t³−t)/(n³−n) each combined ONCE on pinned double trees,
    H/C floored at e3.

    The only unpartitioned window runs over |distinct cents| rows —
    range-partition it at a wider value domain."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    d = df.select(F.col(group_col).alias("g"), cents.alias("v"))
    per_v = d.groupBy("v").agg(F.count("*").alias("c_v"))
    # bucketed exclusive prefix sum over the value grid
    # (operators.scale) — the doubled-midrank census with no
    # single-task value-domain sort
    from .scale import dist_cumsum
    ranks = (dist_cumsum(per_v, "v", {"c_before": "c_v"},
                         inclusive=False)
             .select("v", "c_v",
                     (2 * F.col("c_before") + F.col("c_v") + 1)
                     .alias("r2")))                # doubled midrank
    dec = "decimal(38,0)"
    j = d.join(ranks.select("v", "r2"), "v")
    per_g = j.groupBy("g").agg(
        F.count("*").cast(dec).alias("n_g"),
        F.sum(F.col("r2").cast(dec)).alias("s_r2"))
    ties = per_v.groupBy().agg(
        F.sum(F.col("c_v").cast(dec) * F.col("c_v").cast(dec)
              * F.col("c_v").cast(dec)
              - F.col("c_v").cast(dec)).alias("tie_sum"))
    tot = per_g.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast(dec).alias("n"))
    jj = per_g.crossJoin(F.broadcast(tot))
    n_d = F.col("n").cast("double")
    # H on the doubled grid: r̄_g = s_r2/(2 n_g); H = 12/(n(n+1)) Σ
    # n_g (r̄_g − (n+1)/2)² — expand with the /2 factored out once
    mean_g = F.col("s_r2").cast("double") / (2.0 * F.col("n_g")
                                             .cast("double"))
    dev = mean_g - (n_d + F.lit(1.0)) / F.lit(2.0)
    term = F.floor(F.col("n_g").cast("double") * dev * dev * 1e6)
    hsum = (jj.select("k", "n", term.cast("long").alias("t"))
            .groupBy("k", "n").agg(F.sum("t").cast("long").alias("hs")))
    out = hsum.crossJoin(F.broadcast(ties))
    n2 = F.col("n").cast("double")
    h = (F.lit(12.0) * (F.col("hs").cast("double") / 1e6)
         / (n2 * (n2 + F.lit(1.0))))
    c = (F.lit(1.0) - F.col("tie_sum").cast("double")
         / (n2 * n2 * n2 - n2))
    ok = (F.col("k") > 1) & (c > 0.0)
    return out.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.when(ok, F.floor(h / c * 1e3)).otherwise(F.lit(0))
         .cast("long").alias("h_e3"))


def cohens_d_arms(df: DataFrame, user_col: str = "user_id",
                  val_col: str = "value") -> DataFrame:
    """Cohen's d effect size between the A/B arms' event values —
    the magnitude companion to Welch's t (significance without size
    is a dashboard trap): exact moments per arm, pooled sample
    variance and the final d each one pinned combine, floored e6."""
    d = df.select(
        F.pmod(F.col(user_col), F.lit(2)).cast("long").alias("arm"),
        F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
         .alias("v"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    per = d.groupBy("arm").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum(F.col("v").cast(d19) * F.col("v").cast(d19)).alias("q"))
    a = per.where(F.col("arm") == 0).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("q").alias("q1"))
    b = per.where(F.col("arm") == 1).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"),
        F.col("q").alias("q2"))
    j = a.crossJoin(F.broadcast(b))
    n1, s1, q1, n2, s2, q2 = [F.col(c).cast("double") for c in
                              ("n1", "s1", "q1", "n2", "s2", "q2")]
    ss1 = q1 - s1 * s1 / n1
    ss2 = q2 - s2 * s2 / n2
    pooled = (ss1 + ss2) / (n1 + n2 - F.lit(2.0))
    dd = (s1 / n1 - s2 / n2) / F.sqrt(pooled)
    ok = ((F.col("n1").cast("long") > 1)
          & (F.col("n2").cast("long") > 1))
    return j.select(
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.when(ok, F.floor(dd * 1e6)).otherwise(F.lit(0))
         .cast("long").alias("cohens_d_e6"))


# --- Jarque-Bera: shared double-combine strings (embedded verbatim in
# both the Spark plan via F.expr and the DuckDB oracle — the OLS
# cross-engine-parity-by-construction trick).  Inputs are doubles
# n_, s1, q2, q3, q4 (count and raw power sums of the cents grid).
JB_M2 = "((q2 / n_) - ((s1 / n_) * (s1 / n_)))"
JB_M3 = ("(((q3 / n_) - ((3.0 * (s1 / n_)) * (q2 / n_))) "
         "+ ((2.0 * (s1 / n_)) * ((s1 / n_) * (s1 / n_))))")
JB_M4 = ("((((q4 / n_) - ((4.0 * (s1 / n_)) * (q3 / n_))) "
         "+ (((6.0 * (s1 / n_)) * (s1 / n_)) * (q2 / n_))) "
         "- (((3.0 * (s1 / n_)) * (s1 / n_)) "
         "* ((s1 / n_) * (s1 / n_))))")
JB_SKEW = f"({JB_M3} / ({JB_M2} * sqrt({JB_M2})))"
JB_KURT = f"(({JB_M4} / ({JB_M2} * {JB_M2})) - 3.0)"
JB_STAT = (f"((n_ / 6.0) * (({JB_SKEW} * {JB_SKEW}) "
           f"+ (({JB_KURT} * {JB_KURT}) / 4.0)))")


def jarque_bera_by_type(df: DataFrame, group_col: str = "event_type",
                        val_col: str = "value") -> DataFrame:
    """Jarque-Bera normality test per group — skewness and excess
    kurtosis from EXACT raw power sums (count, Σv, Σv², Σv³, Σv⁴ on
    the cents grid, decimal(38,0) — merge-order-proof), combined into
    central moments ONCE per group on pinned double trees shared
    verbatim with the oracle; m2^1.5 is written ``m2·sqrt(m2)``
    because sqrt is correctly rounded on both engines while pow is
    libm-dependent.  One narrow hash agg over the scan — no shuffle
    wider than one row per group at any scale."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    d = df.select(F.col(group_col).alias("g"), cents.alias("v"),
                  (cents * cents).alias("v2"))
    agg = d.groupBy("g").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s1"),
        F.sum(F.col("v2").cast(dec)).alias("q2"),
        F.sum(F.col("v2").cast(d19) * F.col("v").cast(d19)).alias("q3"),
        F.sum(F.col("v2").cast(d19) * F.col("v2").cast(d19)).alias("q4"))
    dbl = agg.select(
        "g", F.col("n").cast("long").alias("n_rows"),
        F.col("n").cast("double").alias("n_"),
        *[F.col(c).cast("double").alias(c)
          for c in ("s1", "q2", "q3", "q4")])
    ok = (F.col("n_rows") > 3) & (F.expr(JB_M2) > 0.0)
    return dbl.select(
        F.col("g").alias(group_col), "n_rows",
        F.when(ok, F.floor(F.expr(JB_SKEW) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("skew_e6"),
        F.when(ok, F.floor(F.expr(JB_KURT) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("kurt_e6"),
        F.when(ok, F.floor(F.expr(JB_STAT) * F.lit(1_000)))
         .otherwise(F.lit(0)).cast("long").alias("jb_e3"),
    ).orderBy(group_col)


KENDALL_TAU = "((c_ - d_) / sqrt((p_ - tx_) * (p_ - ty_)))"


def kendall_tau_daily(df: DataFrame, ts_col: str = "ts",
                      type_col: str = "event_type",
                      x_type: str = "view",
                      y_type: str = "purchase") -> DataFrame:
    """Kendall tau-b between two event types' DAILY counts: do days
    with more views also see more purchases, rank-wise?  The O(rows)
    work is the daily aggregation; the exact concordant/discordant
    census then runs all-pairs on the tiny per-day series (b days →
    b(b-1)/2 pairs — broadcast self-join, never a shuffle).  C, D and
    the tie counts are exact integers; tau-b's single sqrt combine is
    a pinned shared-string double, floored at e6."""
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), F.col(type_col).alias("t"))
             .groupBy("day")
             .agg(F.sum((F.col("t") == x_type).cast("long"))
                   .alias("x"),
                  F.sum((F.col("t") == y_type).cast("long"))
                   .alias("y")))
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"),
                     F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"),
                     F.col("y").alias("yb"))
    dx = F.signum((F.col("xa") - F.col("xb")).cast("double")).cast("long")
    dy = F.signum((F.col("ya") - F.col("yb")).cast("double")).cast("long")
    pairs = (a.join(F.broadcast(b), F.col("da") < F.col("db"))
             .select(dx.alias("dx"), dy.alias("dy")))
    agg = pairs.groupBy().agg(
        F.count("*").alias("p"),
        F.sum((F.col("dx") * F.col("dy") == 1).cast("long")).alias("c"),
        F.sum((F.col("dx") * F.col("dy") == -1).cast("long")).alias("d"),
        F.sum((F.col("dx") == 0).cast("long")).alias("tx"),
        F.sum((F.col("dy") == 0).cast("long")).alias("ty"))
    n_days = daily.groupBy().agg(F.count("*").alias("n_days"))
    j = agg.crossJoin(F.broadcast(n_days))
    dbl = j.select(
        "n_days", F.col("c").alias("n_conc"), F.col("d").alias("n_disc"),
        *[F.col(c).cast("double").alias(f"{c}_")
          for c in ("p", "c", "d", "tx", "ty")])
    ok = (F.col("p_") > F.col("tx_")) & (F.col("p_") > F.col("ty_"))
    return dbl.select(
        "n_days", "n_conc", "n_disc",
        F.when(ok, F.floor(F.expr(KENDALL_TAU) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("tau_b_e6"))


def friedman_daily_types(df: DataFrame, ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """Tie-corrected Friedman test: blocks = days, treatments = event
    types, observations = daily counts on the COMPLETE day×type grid
    (absent cells count 0 — a type with no events that day ranks
    lowest, which is the question being asked).  With doubled midranks
    r2 the Conover tie-corrected statistic collapses to a ratio of
    two INTEGERS — the /4 factors cancel:

        chi2 = (k-1)·Σ_j (R2_j - b(k+1))² / (Σ_ij r2² - b·k·(k+1)²)

    so the whole test is exact integer arithmetic; only the final e6
    quotient is a decimal division.  Ranking runs per-day (partitioned
    window over k cells); every aggregate is one narrow hash agg."""
    from pyspark.sql import Window
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    d = df.select(day.alias("day"), F.col(type_col).alias("t"))
    cnt = d.groupBy("day", "t").agg(F.count("*").alias("c"))
    days = d.select("day").distinct()
    types = d.select("t").distinct()
    grid = (days.crossJoin(F.broadcast(types))
            .join(cnt, ["day", "t"], "left")
            .select("day", "t", F.coalesce("c", F.lit(0)).alias("c")))
    # doubled midranks of c within each day (ties share the midrank)
    per_c = grid.groupBy("day", "c").agg(F.count("*").alias("m"))
    wd = (Window.partitionBy("day").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, 0))
    r2tab = per_c.select(
        "day", "c",
        (2 * (F.sum("m").over(wd) - F.col("m")) + F.col("m") + 1)
        .alias("r2"))
    cells = grid.join(r2tab, ["day", "c"]).select("day", "t", "r2")
    dec = "decimal(38,0)"
    per_t = cells.groupBy("t").agg(
        F.sum(F.col("r2").cast(dec)).alias("r2_sum"))
    glob = cells.groupBy().agg(
        F.countDistinct("day").cast(dec).alias("b"),
        F.countDistinct("t").cast(dec).alias("k"),
        F.sum(F.col("r2").cast(dec) * F.col("r2").cast(dec))
         .alias("sq"))
    jj = per_t.crossJoin(F.broadcast(glob))
    dev = F.col("r2_sum") - F.col("b") * (F.col("k") + 1)
    nd = (jj.groupBy("b", "k", "sq")
            .agg(F.sum(dev * dev).alias("devsq"))
            .select(
                F.col("b").cast("long").alias("b_days"),
                F.col("k").cast("long").alias("k_types"),
                ((F.col("k") - 1) * F.col("devsq")).cast(dec)
                .alias("num"),
                (F.col("sq") - F.col("b") * F.col("k")
                 * (F.col("k") + 1) * (F.col("k") + 1)).cast(dec)
                .alias("den")))
    return nd.select(
        "b_days", "k_types",
        F.when(F.col("den") > 0,
               F.expr("(num * 1000000) div den"))
         .otherwise(F.lit(0)).cast("long").alias("chi2_e6"))


STUMP_GINI = ("(((2.0 * (pl_ * ql_)) / nl_) "
              "+ ((2.0 * (pr_ * qr_)) / nr_))")


def decision_stump(df: DataFrame, label_cond,
                   val_col: str = "value") -> DataFrame:
    """Best single-threshold split (a depth-1 decision tree) of a
    binary label on one numeric feature by weighted Gini impurity —
    the greedy-split primitive under every tree ensemble, run as one
    declarative plan: per-distinct-value (count, positives) hash agg,
    cumulative (n_left, pos_left) via an ordered window, the impurity
    of each candidate threshold as ONE pinned shared-string double
    floored at e9, argmin via TakeOrdered (score, then threshold —
    deterministic under floored-score ties).

    The only unpartitioned window runs over |distinct cents| rows —
    range-partition the candidate grid at a wider value domain.
    Emits the best split: threshold (left = v <= thr), its scaled
    impurity, and the left-branch census."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    d = df.select(cents.alias("v"),
                  label_cond.cast("long").alias("y"))
    per_v = d.groupBy("v").agg(F.count("*").alias("c"),
                               F.sum("y").alias("pos"))
    # bucketed prefix sums over the candidate-threshold grid
    # (operators.scale) — no single-task value-domain sort
    from .scale import dist_cumsum
    cum = (dist_cumsum(per_v, "v", {"nl": "c", "pl": "pos"})
           .select("v", "nl", "pl"))
    tot = per_v.groupBy().agg(F.sum("c").alias("n"),
                              F.sum("pos").alias("p"))
    cand = (cum.crossJoin(F.broadcast(tot))
            .where(F.col("nl") < F.col("n"))
            .select(
                "v", "nl", "pl",
                F.col("n").alias("n_rows"),
                (F.col("nl") - F.col("pl")).alias("ql"),
                (F.col("n") - F.col("nl")).alias("nr"),
                (F.col("p") - F.col("pl")).alias("pr")))
    dbl = cand.select(
        "v", "nl", "pl", "n_rows",
        F.col("nl").cast("double").alias("nl_"),
        F.col("pl").cast("double").alias("pl_"),
        F.col("ql").cast("double").alias("ql_"),
        F.col("nr").cast("double").alias("nr_"),
        F.col("pr").cast("double").alias("pr_"),
        (F.col("nr") - F.col("pr")).cast("double").alias("qr_"))
    scored = dbl.select(
        F.col("v").alias("thr_cents"),
        F.floor(F.expr(STUMP_GINI) * F.lit(1_000_000_000))
         .cast("long").alias("gini_e9"),
        F.col("nl").alias("n_left"), F.col("pl").alias("pos_left"),
        "n_rows")
    return scored.orderBy("gini_e9", "thr_cents").limit(1)


def max_drawdown_daily(orders: DataFrame, customer: DataFrame,
                       nation: DataFrame) -> DataFrame:
    """Worst peak-to-trough drop of each nation's DAILY revenue
    series — the classic running-max window identity
    ``dd_t = max_{s<=t}(rev_s) - rev_t`` on exact cents.  The heavy
    work is the orders⋈customer shuffle join on custkey and the
    (nation, day) hash agg; the drawdown itself is two windows
    partitioned by nation over one row per day — O(days) state, any
    scale.  All-integer output."""
    from pyspark.sql import Window
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) \
           .cast("long")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) \
             .cast("long")
    cust = customer.select("c_custkey", "c_nationkey")
    nat = nation.select("n_nationkey", "n_name")
    daily = (orders
             .select(F.col("o_custkey").alias("c_custkey"),
                     day.alias("day"), cents.alias("v"))
             .join(cust, "c_custkey")
             .join(F.broadcast(nat),
                   F.col("c_nationkey") == F.col("n_nationkey"))
             .groupBy("n_name", "day")
             .agg(F.sum("v").alias("rev")))
    wpk = (Window.partitionBy("n_name").orderBy("day")
           .rowsBetween(Window.unboundedPreceding, 0))
    dd = daily.select(
        "n_name",
        (F.max("rev").over(wpk) - F.col("rev")).alias("dd"))
    return (dd.groupBy("n_name")
            .agg(F.max("dd").alias("max_drawdown_cents"),
                 F.count("*").alias("n_days"))
            .orderBy("n_name"))


ACF_R = ("(((n_ * sxy) - (sx * sy)) "
         "/ (sqrt((n_ * sxx) - (sx * sx)) "
         "* sqrt((n_ * syy) - (sy * sy))))")


def acf_daily_totals(df: DataFrame, max_lag: int = 7,
                     ts_col: str = "ts",
                     val_col: str = "value") -> DataFrame:
    """Autocorrelation of the daily-total series at lags 1..max_lag
    in ONE plan — the correlogram behind seasonality/PACF eyeballing.
    The O(rows) work is the daily cents aggregation; the lag fan-out
    is a broadcast theta-join of the tiny series against itself
    (day_a = day_b + lag), one row per (lag, aligned pair).  Each
    lag's Pearson r then combines exact decimal moments once on the
    shared pinned string, floored at e6.  Gaps in the calendar pair
    only genuinely lag-separated days — missing days drop out instead
    of faking zeros."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), cents.alias("v"))
             .groupBy("day").agg(F.sum("v").alias("t")))
    lags = daily.sparkSession.range(1, max_lag + 1) \
                .select(F.col("id").alias("lag"))
    a = daily.select(F.col("day").alias("da"), F.col("t").alias("x"))
    b = daily.select(F.col("day").alias("db"), F.col("t").alias("y"))
    # precompute the partner day on the left so the lag join carries a
    # one-sided equi key (match_day == db) — BroadcastHashJoin, not a
    # nested-loop theta join
    pairs = (a.crossJoin(F.broadcast(lags))
             .select("lag", "x",
                     (F.col("da") - F.col("lag")).alias("match_day"))
             .join(F.broadcast(b),
                   F.col("match_day") == F.col("db")))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    x, y = F.col("x").cast(d19), F.col("y").cast(d19)
    agg = pairs.groupBy("lag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"))
    dbl = agg.select(
        "lag", F.col("n").cast("long").alias("n_pairs"),
        F.col("n").cast("double").alias("n_"),
        *[F.col(c).cast("double").alias(c)
          for c in ("sx", "sy", "sxx", "syy", "sxy")])
    ok = ((F.col("n_pairs") > 1)
          & (F.col("n_") * F.col("sxx") > F.col("sx") * F.col("sx"))
          & (F.col("n_") * F.col("syy") > F.col("sy") * F.col("sy")))
    return dbl.select(
        "lag", "n_pairs",
        F.when(ok, F.floor(F.expr(ACF_R) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("acf_e6")
    ).orderBy("lag")


def theil_sen_daily(df: DataFrame, ts_col: str = "ts",
                    val_col: str = "value") -> DataFrame:
    """Theil-Sen robust trend of the daily-total series: the LOW
    median of all pairwise slopes — outlier days move OLS, not this.
    Slopes are quantized to e6 with FLOOR division made cross-engine
    safe by the shift identity floor((a + K·b)/b) = floor(a/b) + K:
    adding K·denominator makes every operand positive, where Spark's
    ``div`` (truncate) and DuckDB's ``//`` agree, then K comes back
    off.  The pair fan-out is the tiny daily series self-joined
    broadcast (b(b-1)/2 rows); the median is the runs-test
    nearest-rank pattern — no doubles anywhere."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), cents.alias("v"))
             .groupBy("day").agg(F.sum("v").alias("t")))
    a = daily.select(F.col("day").alias("da"), F.col("t").alias("ta"))
    b = daily.select(F.col("day").alias("db"), F.col("t").alias("tb"))
    K = 1 << 40
    num = ((F.col("tb") - F.col("ta")) * 1_000_000
           + F.lit(K) * (F.col("db") - F.col("da")))
    slopes = (a.join(F.broadcast(b), F.col("da") < F.col("db"))
              .select(num.alias("num"),
                      (F.col("db") - F.col("da")).alias("den")))
    slopes = slopes.select(
        (F.expr("num div den") - F.lit(K)).alias("slope_e6"))
    # low median via the distinct-slope cumulative grid (bucketed
    # prefix sum, operators.scale) — replaces a global row_number sort
    # of all b(b-1)/2 pair slopes with a parallel census
    from .scale import dist_cumsum
    grid = slopes.groupBy("slope_e6").agg(F.count("*").alias("c"))
    n1 = grid.groupBy().agg(F.sum("c").cast("long").alias("n"))
    cum = (dist_cumsum(grid, "slope_e6", {"cum": "c"})
           .crossJoin(F.broadcast(n1)))
    return (cum.where(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("n")  # keyed agg: empty input stays empty
            .agg(F.min("slope_e6").cast("long").alias("sen_slope_e6"))
            .select(F.col("n").cast("long").alias("n_pairs"),
                    "sen_slope_e6"))


MK_Z = "((s_ - adj_) / sqrt(var_))"


def mann_kendall_trend(df: DataFrame, ts_col: str = "ts",
                       val_col: str = "value") -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily-total series:
    S = Σ_{i<j} sign(t_j - t_i) over the broadcast pair fan-out
    (exact integer), tie-corrected variance
    [n(n-1)(2n+5) - Σ t_g(t_g-1)(2t_g+5)] / 18 from one per-distinct-
    value agg, and the continuity-corrected z on a pinned shared
    double tree floored at e6."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), cents.alias("v"))
             .groupBy("day").agg(F.sum("v").alias("t")))
    a = daily.select(F.col("day").alias("da"), F.col("t").alias("ta"))
    b = daily.select(F.col("day").alias("db"), F.col("t").alias("tb"))
    s_agg = (a.join(F.broadcast(b), F.col("da") < F.col("db"))
             .groupBy()
             .agg(F.sum(F.signum((F.col("tb") - F.col("ta"))
                                 .cast("double")).cast("long"))
                   .alias("s")))
    ties = (daily.groupBy("t").agg(F.count("*").alias("m"))
            .groupBy()
            .agg(F.count("*").alias("n_distinct"),
                 F.sum(F.col("m") * (F.col("m") - 1)
                       * (2 * F.col("m") + 5)).alias("tie_sum"),
                 F.sum("m").alias("n")))
    j = s_agg.crossJoin(F.broadcast(ties))
    n_ = F.col("n").cast("double")
    var_ = ((n_ * (n_ - 1.0) * (2.0 * n_ + 5.0)
             - F.col("tie_sum").cast("double")) / F.lit(18.0))
    adj = F.when(F.col("s") > 0, F.lit(1.0)) \
           .when(F.col("s") < 0, F.lit(-1.0)).otherwise(F.lit(0.0))
    dbl = j.select(
        F.col("n").alias("n_days"), F.col("s").alias("s_stat"),
        F.col("s").cast("double").alias("s_"), adj.alias("adj_"),
        var_.alias("var_"))
    ok = (F.col("var_") > 0.0) & (F.col("s_stat") != 0)
    return dbl.select(
        "n_days", "s_stat",
        F.when(ok, F.floor(F.expr(MK_Z) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("z_e6"))


def chi2_gof_types(df: DataFrame,
                   type_col: str = "event_type") -> DataFrame:
    """Chi-square goodness of fit of the event-type histogram against
    uniform — via the exact identity chi2 = (k·ΣO² - n²)/n, so the
    whole statistic is one integer ratio (Cauchy-Schwarz keeps the
    numerator nonnegative; positive-operand div is floor on both
    engines).  One hash agg over the scan."""
    counts = (df.where(F.col(type_col).isNotNull())
              .groupBy(type_col).agg(F.count("*").alias("o")))
    dec = "decimal(38,0)"
    agg = counts.groupBy().agg(
        F.count("*").cast(dec).alias("k"),
        F.sum(F.col("o").cast(dec)).alias("n"),
        F.sum(F.col("o").cast(dec) * F.col("o").cast(dec))
         .alias("sq"))
    return agg.select(
        F.col("k").cast("long").alias("k_types"),
        F.col("n").cast("long").alias("n_rows"),
        F.when(F.col("n") > 0,
               F.expr("((k * sq - n * n) * 1000000) div n"))
         .otherwise(F.lit(0)).cast("long").alias("chi2_e6"))


def active_day_islands(df: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days
    (the streak feature under habit metrics).  The classic
    day - row_number() island key on the per-user distinct-day grid —
    one partitioned window, one reagg; every aggregate narrow.
    Output per user: active days, streak count, longest streak."""
    from pyspark.sql import Window
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    days = (df.select(F.col(user_col).alias("u"), day.alias("day"))
            .distinct())
    w = Window.partitionBy("u").orderBy("day")
    grouped = days.select(
        "u", "day",
        (F.col("day") - F.row_number().over(w)).alias("island"))
    islands = (grouped.groupBy("u", "island")
               .agg(F.count("*").alias("len")))
    return (islands.groupBy("u")
            .agg(F.sum("len").alias("n_active_days"),
                 F.count("*").alias("n_streaks"),
                 F.max("len").alias("longest_streak"))
            .select(F.col("u").alias(user_col), "n_active_days",
                    "n_streaks", "longest_streak")
            .orderBy(user_col))


def pairwise_welch_matrix(df: DataFrame,
                          group_col: str = "event_type",
                          val_col: str = "value") -> DataFrame:
    """Post-hoc pairwise Welch t after an ANOVA reject: which group
    pairs actually differ?  Exact decimal moments per group (one hash
    agg over the scan), then every (a < b) pair combines ONCE on a
    broadcast self-join of the k-row moment table — k(k-1)/2 output
    rows however large the fact table.  Same pinned t and
    Satterthwaite-dof trees as welch_t_value, floored e6/e3."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    per = (df.where(F.col(group_col).isNotNull())
           .select(F.col(group_col).alias("g"), cents.alias("v"))
           .groupBy("g").agg(
               F.count("*").cast(dec).alias("n"),
               F.sum(F.col("v").cast(dec)).alias("s"),
               F.sum(F.col("v").cast(d19) * F.col("v").cast(d19))
                .alias("q")))
    a = per.select(F.col("g").alias("type_a"), F.col("n").alias("n1"),
                   F.col("s").alias("s1"), F.col("q").alias("q1"))
    b = per.select(F.col("g").alias("type_b"), F.col("n").alias("n2"),
                   F.col("s").alias("s2"), F.col("q").alias("q2"))
    j = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    n1, s1, q1, n2, s2, q2 = [F.col(c).cast("double") for c in
                              ("n1", "s1", "q1", "n2", "s2", "q2")]
    var1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - F.lit(1.0)))
    var2 = (n2 * q2 - s2 * s2) / (n2 * (n2 - F.lit(1.0)))
    se1, se2 = var1 / n1, var2 / n2
    t = (s1 / n1 - s2 / n2) / F.sqrt(se1 + se2)
    dof = ((se1 + se2) * (se1 + se2)
           / (se1 * se1 / (n1 - F.lit(1.0))
              + se2 * se2 / (n2 - F.lit(1.0))))
    ok = ((F.col("n1").cast("long") > 1)
          & (F.col("n2").cast("long") > 1)
          & (se1 + se2 > 0.0))
    return j.select(
        "type_a", "type_b",
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.when(ok, F.floor(t * 1e6)).otherwise(F.lit(0))
         .cast("long").alias("t_e6"),
        F.when(ok, F.floor(dof * 1e3)).otherwise(F.lit(0))
         .cast("long").alias("dof_e3")
    ).orderBy("type_a", "type_b")


def linear_attribution(df: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts",
                       window_s: int = 3600) -> DataFrame:
    """Linear multi-touch attribution: every view in the hour before
    a purchase shares the credit equally — the complement of the
    first/last-touch single-winner models.  The view census per
    purchase is ONE per-user RANGE-frame window (value-based frame,
    no self-join); credit is integer basis points, 10000 div n, with
    the remainder noted so credits still sum to exactly 10000.
    Output: one row per attributed purchase."""
    from pyspark.sql import Window
    d = df.select(F.col(user_col).alias("u"),
                  F.col(type_col).alias("et"),
                  F.col("event_id"),
                  _ts_s(ts_col).alias("ts_s"))
    w = (Window.partitionBy("u").orderBy("ts_s")
         .rangeBetween(-window_s, 0))
    counted = d.select(
        "u", "et", "event_id", "ts_s",
        F.sum((F.col("et") == "view").cast("long")).over(w)
         .alias("n_views"))
    purchases = (counted.where((F.col("et") == "purchase")
                               & (F.col("n_views") > 0)))
    return (purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("u").alias(user_col),
        "n_views",
        F.expr("10000 div n_views").alias("credit_bp"),
        (F.lit(10000) - F.col("n_views")
         * F.expr("10000 div n_views")).alias("remainder_bp"))
        .orderBy("purchase_id"))


DID = ("(((mtpost - mtpre) - (mcpost - mcpre)))")


def diff_in_diff(df: DataFrame, user_col: str = "user_id",
                 val_col: str = "value", ts_col: str = "ts",
                 cutover_days: int = 15) -> DataFrame:
    """Difference-in-differences estimate of the treatment effect on
    event values: arms by user parity, periods split at
    min_day + cutover_days (derived relationally, so the operator is
    scale- and calendar-free).  Four exact (sum, count) cells → four
    means and the DiD contrast combined ONCE on a pinned double tree
    floored at e6.  One hash agg over the scan + a broadcast of the
    1-row min-day scalar."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    d = df.select(
        F.pmod(F.col(user_col), F.lit(2)).cast("long").alias("arm"),
        day.alias("day"), cents.alias("v"))
    d0 = d.groupBy().agg(F.min("day").alias("day0"))
    dec = "decimal(38,0)"
    cells = (d.crossJoin(F.broadcast(d0))
             .select("arm",
                     (F.col("day") >= F.col("day0")
                      + F.lit(cutover_days)).cast("long").alias("post"),
                     "v")
             .groupBy("arm", "post")
             .agg(F.count("*").cast(dec).alias("n"),
                  F.sum(F.col("v").cast(dec)).alias("s")))
    flat = cells.groupBy().agg(
        *[F.sum(F.when((F.col("arm") == a) & (F.col("post") == p),
                       F.col(c))).alias(f"{c}{a}{p}")
          for a in (0, 1) for p in (0, 1) for c in ("n", "s")])
    dbl = flat.select(
        *[F.col(f"n{a}{p}").cast("long").alias(f"n_{a}{p}")
          for a in (0, 1) for p in (0, 1)],
        (F.col("s10").cast("double") / F.col("n10").cast("double"))
        .alias("mtpre"),
        (F.col("s11").cast("double") / F.col("n11").cast("double"))
        .alias("mtpost"),
        (F.col("s00").cast("double") / F.col("n00").cast("double"))
        .alias("mcpre"),
        (F.col("s01").cast("double") / F.col("n01").cast("double"))
        .alias("mcpost"))
    ok = ((F.col("n_00") > 0) & (F.col("n_01") > 0)
          & (F.col("n_10") > 0) & (F.col("n_11") > 0))
    return dbl.select(
        "n_00", "n_01", "n_10", "n_11",
        F.when(ok, F.floor(F.expr(DID) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("did_e6"))


def nelson_aalen(df: DataFrame, target: str = "purchase",
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Nelson-Aalen cumulative hazard of time-to-first-``target`` —
    Kaplan-Meier's additive sibling, and here the FULLY INTEGER one:
    each increment d_i/n_i is floored at e9 by integer division (no
    doubles anywhere), and H(t) is their exact running sum.  Same
    censoring convention and duration-grid plan shape as
    kaplan_meier: one per-user agg, one per-duration agg, one ordered
    window over |distinct durations| rows."""
    from pyspark.sql import Window
    per_user = df.groupBy(user_col).agg(
        F.min(_ts_s(ts_col)).alias("first_s"),
        F.min(F.when(F.col(type_col) == target,
                     _ts_s(ts_col))).alias("ev_s"),
        F.max(_ts_s(ts_col)).alias("last_s"))
    dur = per_user.select(
        F.coalesce(F.col("ev_s") - F.col("first_s"),
                   F.col("last_s") - F.col("first_s")).alias("t"),
        F.col("ev_s").isNotNull().cast("long").alias("is_event"))
    pts = dur.groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.sum(1 - F.col("is_event")).cast("long").alias("c"))
    # duration-grid censuses via bucketed prefix sums
    # (operators.scale) — no single-task sort
    from .scale import dist_cumsum
    ntot = pts.groupBy().agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_tot"))
    at_risk = (dist_cumsum(
        pts.withColumn("dc", F.col("d") + F.col("c")),
        "t", {"dc_before": "dc"}, inclusive=False)
        .crossJoin(F.broadcast(ntot))
        .select("t", "d",
                (F.col("n_tot") - F.col("dc_before")).alias("n")))
    ev = at_risk.where(F.col("d") > 0)
    inc = ev.select(
        "t", "d", "n",
        F.expr("(d * 1000000000) div n").alias("inc_e9"))
    return (dist_cumsum(inc, "t", {"cum_hazard_e9": "inc_e9"})
            .select("t", "d", F.col("n").alias("n_at_risk"),
                    F.col("cum_hazard_e9").cast("long")
                    .alias("cum_hazard_e9"))
            .orderBy("t"))


CHANGEPOINT_SSE = ("(((ql - ((sl * sl) / nl)) "
                   "+ (qr - ((sr * sr) / nr))))")


def changepoint_daily(df: DataFrame, ts_col: str = "ts",
                      val_col: str = "value") -> DataFrame:
    """Single-changepoint detection on the daily-total series (binary
    segmentation, depth 1): the split minimizing left+right SSE.
    Prefix sums over the ordered day grid give each split's moments —
    exact decimal; each candidate's SSE combines once on the pinned
    shared string floored at whole cents² (argmin needs no finer
    resolution and the floor stays inside double-exact range at any
    scale); TakeOrdered argmin with a deterministic day tie-break."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), cents.alias("v"))
             .groupBy("day").agg(F.sum("v").alias("t")))
    dec = "decimal(38,0)"
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = daily.select(
        "day",
        F.count("*").over(w).cast("long").alias("nl"),
        F.sum(F.col("t").cast(dec)).over(w).alias("sl"),
        F.sum(F.col("t").cast(dec) * F.col("t").cast(dec)).over(w)
         .alias("ql"),
        F.count("*").over(tot).cast("long").alias("n"),
        F.sum(F.col("t").cast(dec)).over(tot).alias("s"),
        F.sum(F.col("t").cast(dec) * F.col("t").cast(dec)).over(tot)
         .alias("q"))
    cand = cum.where(F.col("nl") < F.col("n"))
    dbl = cand.select(
        F.col("day").alias("split_day"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        F.col("nl").cast("double").alias("nld"),
        F.col("sl").cast("double").alias("sld"),
        F.col("ql").cast("double").alias("qld"),
        (F.col("n") - F.col("nl")).cast("double").alias("nrd"),
        (F.col("s") - F.col("sl")).cast("double").alias("srd"),
        (F.col("q") - F.col("ql")).cast("double").alias("qrd"))
    sse_expr = (CHANGEPOINT_SSE
                .replace("ql", "qld").replace("sl", "sld")
                .replace("nl", "nld").replace("qr", "qrd")
                .replace("sr", "srd").replace("nr", "nrd"))
    sse = dbl.select(
        "split_day", "n_left", "n_right",
        F.floor(F.expr(sse_expr)).cast("long").alias("sse_floor"))
    return sse.orderBy("sse_floor", "split_day").limit(1)


UCB1 = "((k_ / n_) + sqrt((2.0 * ln(nn_)) / n_))"


def ucb_arm_scores(df: DataFrame, type_col: str = "event_type",
                   val_col: str = "value",
                   success_cents: int = 10000) -> DataFrame:
    """UCB1 bandit scores per arm (event type): empirical success
    rate (value above the threshold) plus the sqrt(2 ln N / n)
    exploration bonus — the allocation rule a serving layer would
    read off this table each round.  Exact (n, k) integers per arm
    from one hash agg; the bonus combines once per arm on the pinned
    shared string (ln and sqrt are correctly rounded on both
    engines), floored at e6; deterministic (score desc, arm) rank."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    per = (df.where(F.col(type_col).isNotNull())
           .select(F.col(type_col).alias("arm"), cents.alias("v"))
           .groupBy("arm")
           .agg(F.count("*").alias("n"),
                F.sum((F.col("v") >= success_cents).cast("long"))
                 .alias("k")))
    tot = per.groupBy().agg(F.sum("n").alias("nn"))
    j = per.crossJoin(F.broadcast(tot))
    dbl = j.select(
        "arm", F.col("n").alias("n_pulls"), F.col("k").alias("n_wins"),
        F.col("n").cast("double").alias("n_"),
        F.col("k").cast("double").alias("k_"),
        F.col("nn").cast("double").alias("nn_"))
    scored = dbl.select(
        "arm", "n_pulls", "n_wins",
        F.floor(F.expr(UCB1) * F.lit(1_000_000)).cast("long")
         .alias("ucb_e6"))
    w = Window.orderBy(F.col("ucb_e6").desc(), "arm")
    return scored.select("arm", "n_pulls", "n_wins", "ucb_e6",
                         F.row_number().over(w).alias("rank"))


POISSON_Z = "(k1t_ / sqrt(nt1t2_))"


def poisson_rate_test(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Two-sample event-rate comparison between the A/B arms, as the
    CONDITIONAL binomial test: given n = k1+k2 total events and
    exposures T1/T2 (active user-days per arm), k1 ~ Bin(n, T1/T) —
    z = (k1·T - n·T1) / sqrt(n·T1·T2), whose numerator and radicand
    are EXACT integers; only the final quotient is a pinned double,
    floored at e6.  Two hash aggs over the scan (events, exposures)."""
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    arm = F.pmod(F.col(user_col), F.lit(2)).cast("long")
    d = df.select(arm.alias("arm"), F.col(user_col).alias("u"),
                  day.alias("day"))
    ks = d.groupBy("arm").agg(F.count("*").alias("k"))
    exp_ = (d.select("arm", "u", "day").distinct()
            .groupBy("arm").agg(F.count("*").alias("t")))
    j = (ks.join(exp_, "arm")
         .groupBy()
         .agg(F.sum(F.when(F.col("arm") == 0, F.col("k"))).alias("k1"),
              F.sum(F.when(F.col("arm") == 1, F.col("k"))).alias("k2"),
              F.sum(F.when(F.col("arm") == 0, F.col("t"))).alias("t1"),
              F.sum(F.when(F.col("arm") == 1, F.col("t"))).alias("t2")))
    dec = "decimal(38,0)"
    ints = j.select(
        F.col("k1").cast("long").alias("n_events_a"),
        F.col("k2").cast("long").alias("n_events_b"),
        F.col("t1").cast("long").alias("exposure_a"),
        F.col("t2").cast("long").alias("exposure_b"),
        (F.col("k1").cast(dec) * (F.col("t1") + F.col("t2")).cast(dec)
         - (F.col("k1") + F.col("k2")).cast(dec)
         * F.col("t1").cast(dec)).cast("double").alias("k1t_"),
        F.lit(0.0).alias("nt1_"),
        ((F.col("k1") + F.col("k2")).cast(dec)
         * F.col("t1").cast(dec) * F.col("t2").cast(dec))
        .cast("double").alias("nt1t2_"))
    ok = (F.col("exposure_a") > 0) & (F.col("exposure_b") > 0) \
        & (F.col("nt1t2_") > 0.0)
    return ints.select(
        "n_events_a", "n_events_b", "exposure_a", "exposure_b",
        F.when(ok, F.floor(F.expr(POISSON_Z) * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("z_e6"))


def churn_hazard_by_tenure(df: DataFrame, user_col: str = "user_id",
                           ts_col: str = "ts",
                           week_days: int = 7) -> DataFrame:
    """Discrete churn hazard by tenure week: of the users who
    REACHED week w, what fraction stopped there?  Users whose last
    event falls inside the final observation week are right-censored
    — they hold a place in every at-risk denominator up to their
    tenure but never count as churned.  at-risk(w) is a suffix sum
    over the |weeks|-row histogram (one ordered window); the hazard
    is exact integer e6 division."""
    from pyspark.sql import Window
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    per_user = (df.select(F.col(user_col).alias("u"), day.alias("d"))
                .groupBy("u")
                .agg(F.min("d").alias("first_d"),
                     F.max("d").alias("last_d")))
    mx = per_user.groupBy().agg(F.max("last_d").alias("max_d"))
    tagged = (per_user.crossJoin(F.broadcast(mx))
              .select(
                  F.expr(f"(last_d - first_d) div {week_days}")
                   .alias("w"),
                  (F.col("last_d") > F.col("max_d") - week_days)
                  .cast("long").alias("censored")))
    hist = tagged.groupBy("w").agg(
        F.count("*").alias("n_ending"),
        F.sum("censored").alias("n_censored"))
    wdesc = (Window.orderBy(F.col("w").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    haz = hist.select(
        "w", "n_ending", "n_censored",
        F.sum("n_ending").over(wdesc).alias("at_risk"),
        (F.col("n_ending") - F.col("n_censored")).alias("churned"))
    return (haz.select(
        F.col("w").alias("tenure_week"), "at_risk", "churned",
        F.col("n_censored").cast("long").alias("censored"),
        F.expr("(churned * 1000000) div at_risk").cast("long")
         .alias("hazard_e6"))
        .orderBy("tenure_week"))


def rolling_median_daily(df: DataFrame, ts_col: str = "ts",
                         val_col: str = "value",
                         window_days: int = 7) -> DataFrame:
    """Rolling 7-day LOW median of the daily-total series — the
    robust smoother (a median never chases one spike the way a
    moving average does).  Medians aren't frame-expressible, so each
    center day joins its ≤7 window members via a broadcast offset
    fan-out over the tiny day grid and takes the nearest-rank
    element with one per-center window — O(days·window) rows total,
    all integer."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(day.alias("day"), cents.alias("v"))
             .groupBy("day").agg(F.sum("v").alias("t")))
    offs = daily.sparkSession.range(window_days) \
                .select(F.col("id").alias("off"))
    members = (daily.crossJoin(F.broadcast(offs))
               .select((F.col("day") + F.col("off")).alias("center"),
                       "t"))
    centers = daily.select(F.col("day").alias("center"))
    joined = members.join(centers, "center")
    w = Window.partitionBy("center").orderBy("t")
    ranked = joined.select(
        "center", "t", F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("center")).alias("m"))
    return (ranked.where(F.col("rn") == F.expr("(m + 1) div 2"))
            .select(F.col("center").alias("day"),
                    F.col("m").alias("n_window"),
                    F.col("t").alias("rolling_median"))
            .orderBy("day"))


def lognormal_gamma_fit(df: DataFrame,
                        val_col: str = "value") -> DataFrame:
    """Parametric distribution fitting of positive values by method
    of moments: lognormal (mu, sigma of ln v) and gamma
    (k = mean²/var, theta = var/mean) in one pass.  ln runs once per
    DISTINCT cent value and is immediately e6-quantized (the
    nb/zipf rule), so the log moments are exact integer sums; mu is
    an exact integer division and sigma/k/theta combine once each on
    pinned double trees.  One grid agg + one 1-row rollup."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    d = df.select(cents.alias("v")).where(F.col("v") > 0)
    grid = d.groupBy("v").agg(F.count("*").alias("c"))
    dec, d19 = "decimal(38,0)", "decimal(19,0)"
    q = grid.select(
        "v", "c",
        F.floor(F.log(F.col("v").cast("double") / F.lit(100.0))
                * 1e6).cast("long").alias("l"))
    m = q.agg(
        F.sum(F.col("c").cast(dec)).alias("n"),
        F.sum(F.col("c").cast(d19) * F.col("l").cast(d19)).alias("sl"),
        F.sum(F.col("c").cast(dec)
              * (F.col("l").cast(d19) * F.col("l").cast(d19))
              .cast(dec)).alias("ql"),
        F.sum(F.col("c").cast(d19) * F.col("v").cast(d19)).alias("sv"),
        F.sum(F.col("c").cast(dec)
              * (F.col("v").cast(d19) * F.col("v").cast(d19))
              .cast(dec)).alias("qv"))
    ints = m.select(
        F.col("n").cast("long").alias("n_rows"),
        # sl is negative when values sit below 1.0 — floor-div via the
        # +K·n shift so Spark's truncating div matches DuckDB's //
        F.expr("(sl + 30000000 * n) div n - 30000000").cast("long")
         .alias("mu_e6"),
        *[F.col(c).cast("double").alias(f"{c}_")
          for c in ("n", "sl", "ql", "sv", "qv")])
    sig = ("sqrt(((n_ * ql_) - (sl_ * sl_)) / (n_ * n_))")
    mean_v = "(sv_ / n_)"
    var_v = f"(((n_ * qv_) - (sv_ * sv_)) / (n_ * n_))"
    ok_v = F.expr(var_v) > 0.0
    return ints.select(
        "n_rows", "mu_e6",
        F.when(F.col("n_rows") > 1,
               F.floor(F.expr(sig))).otherwise(F.lit(0))
         .cast("long").alias("sigma_e6"),
        F.when(ok_v, F.floor(F.expr(
            f"(({mean_v} * {mean_v}) / {var_v})") * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("gamma_k_e6"),
        F.when(ok_v, F.floor(F.expr(
            f"({var_v} / {mean_v})") * F.lit(1_000_000)))
         .otherwise(F.lit(0)).cast("long").alias("gamma_theta_e6"))


def dow_hour_heatmap(df: DataFrame, ts_col: str = "ts",
                     val_col: str = "value") -> DataFrame:
    """Day-of-week × hour activity heatmap — the calendar-seasonality
    matrix, in pure epoch integer arithmetic (no timezone/date
    functions to disagree over): dow = (epoch_day + 3) mod 7 with
    0 = Monday (1970-01-01 was a Thursday), hour = epoch_hour mod
    24.  One hash agg over the scan."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    hour = F.pmod(F.floor(_ts_s(ts_col) / F.lit(3600)), F.lit(24)) \
            .cast("long")
    return (df.select(F.pmod(day + 3, F.lit(7)).cast("long")
                      .alias("dow"),
                      hour.alias("hour"), cents.alias("v"))
            .groupBy("dow", "hour")
            .agg(F.count("*").alias("n_events"),
                 F.sum("v").alias("sum_cents"))
            .orderBy("dow", "hour"))


def journey_edit_distance(df: DataFrame, user_col: str = "user_id",
                          type_col: str = "event_type",
                          ts_col: str = "ts",
                          max_len: int = 50) -> DataFrame:
    """Behavioral similarity between ADJACENT user ids: Levenshtein
    distance of their journey strings (first letters of the first
    ``max_len`` events, ordered by (ts, event_id) — a total order, so
    the string is deterministic).  The per-user cap bounds the edit
    DP at max_len², and the comparison joins each user to id+1 — a
    co-partitioned equi join, no pair explosion.  The session-journey
    twin of the trigram mining ops."""
    from pyspark.sql import Window
    d = df.select(F.col(user_col).alias("u"),
                  F.substring(F.col(type_col), 1, 1).alias("ch"),
                  _ts_s(ts_col).alias("ts_s"), F.col("event_id"))
    w = Window.partitionBy("u").orderBy("ts_s", "event_id")
    capped = (d.select("u", "ch", "ts_s", "event_id",
                       F.row_number().over(w).alias("rn"))
              .where(F.col("rn") <= max_len))
    js = (capped.groupBy("u")
          .agg(F.concat_ws(
              "", F.transform(
                  F.array_sort(F.collect_list(
                      F.struct("rn", "ch"))),
                  lambda s: s["ch"])).alias("j")))
    # js (the per-user journey-string collect) feeds both sides of
    # the successive-user join — materialized so the window + collect
    # subtree runs once (round-8 multi-consumer sweep)
    js = materialize(js, "journey_strings", prefer="local")
    a = js.select(F.col("u").alias("user_a"), F.col("j").alias("ja"))
    b = js.select((F.col("u") - 1).alias("user_a"),
                  F.col("u").alias("user_b"),
                  F.col("j").alias("jb"))
    return (a.join(b, "user_a")
            .select("user_a", "user_b",
                    F.length("ja").cast("long").alias("len_a"),
                    F.length("jb").cast("long").alias("len_b"),
                    F.levenshtein("ja", "jb").cast("long")
                     .alias("edit_distance"))
            .orderBy("user_a"))


def outlier_consensus(df: DataFrame,
                      val_col: str = "value") -> DataFrame:
    """Ensemble outlier census: three detectors vote on every event
    value — 3σ z-score, 3×MAD about the LOW median, and extreme
    Tukey fences (3·IQR/2 beyond the nearest-rank quartiles) — and
    the output is the vote histogram (how many rows got 0/1/2/3
    votes).  EVERY comparison is integer: the z test as
    (n·v - s)² > 9·(n·q - s²), MAD and the fences as scaled cent
    arithmetic.  One 1-row stats broadcast against the scan; no
    doubles anywhere."""
    from pyspark.sql import Window
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    d = df.select(cents.alias("v"))
    dec = "decimal(38,0)"
    mom = d.agg(F.count("*").cast(dec).alias("n"),
                F.sum(F.col("v").cast(dec)).alias("s"),
                F.sum(F.col("v").cast("decimal(19,0)")
                      * F.col("v").cast("decimal(19,0)")).alias("q"))
    grid = d.groupBy("v").agg(F.count("*").alias("c"))
    # both median lookups run on bucketed prefix sums
    # (operators.scale) — no single-task value-domain sorts
    from .scale import dist_cumsum
    nn1 = grid.groupBy().agg(F.sum("c").cast("long").alias("nn"))
    cum = (dist_cumsum(grid, "v", {"cum": "c"})
           .crossJoin(F.broadcast(nn1)).select("v", "cum", "nn"))
    med = (cum.where(F.col("cum") >= F.expr("(nn + 1) div 2"))
           .groupBy().agg(F.min("v").alias("med")))
    q1 = (cum.where(F.col("cum") * 4 >= F.col("nn"))
          .groupBy().agg(F.min("v").alias("q1")))
    q3 = (cum.where(F.col("cum") * 4 >= F.col("nn") * 3)
          .groupBy().agg(F.min("v").alias("q3")))
    dev = (d.crossJoin(F.broadcast(med))
           .select(F.abs(F.col("v") - F.col("med")).alias("a")))
    dgrid = dev.groupBy("a").agg(F.count("*").alias("c"))
    nn2 = dgrid.groupBy().agg(F.sum("c").cast("long").alias("nn"))
    dcum = (dist_cumsum(dgrid, "a", {"cum": "c"})
            .crossJoin(F.broadcast(nn2)).select("a", "cum", "nn"))
    mad = (dcum.where(F.col("cum") >= F.expr("(nn + 1) div 2"))
           .groupBy().agg(F.min("a").alias("mad")))
    stats = (mom.crossJoin(F.broadcast(med))
             .crossJoin(F.broadcast(mad))
             .crossJoin(F.broadcast(q1))
             .crossJoin(F.broadcast(q3)))
    j = d.crossJoin(F.broadcast(stats))
    nv_s = (F.col("n") * F.col("v").cast(dec) - F.col("s"))
    z_vote = ((nv_s * nv_s)
              > F.lit(9) * (F.col("n") * F.col("q")
                            - F.col("s") * F.col("s"))).cast("long")
    mad_vote = (F.abs(F.col("v") - F.col("med"))
                > 3 * F.col("mad")).cast("long")
    iqr = F.col("q3") - F.col("q1")
    iqr_vote = ((2 * F.col("v") < 2 * F.col("q1") - 3 * iqr)
                | (2 * F.col("v") > 2 * F.col("q3") + 3 * iqr)) \
        .cast("long")
    return (j.select((z_vote + mad_vote + iqr_vote).alias("votes"))
            .groupBy("votes").agg(F.count("*").alias("n_rows"))
            .orderBy("votes"))


# ---------------------------------------------------------------------------
# SAX symbolization of the per-type daily series
# ---------------------------------------------------------------------------

def sax_daily_symbols(df: DataFrame, type_col: str = "event_type",
                      val_col: str = "value",
                      ts_col: str = "ts") -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin et al. 2003) of each
    type's daily-cents-total series over a 4-letter alphabet: z-score
    every day against the type's own exact moments, then bucket at the
    standard-normal quartile breakpoints (±0.6745, 0) → a/b/c/d. The
    symbol string is the shape fingerprint motif-discovery and
    whole-series clustering run on.

    Exactness: with n, Σt, Σt² exact BIGINTs, z = (n·t − Σt) /
    sqrt(n·Σt² − (Σt)²) — an exact BIGINT numerator and ONE
    double-sqrt denominator (sums cast to double first: n·Σt² can
    pass 2^63 at large SF, and the cast-then-combine tree is the same
    fixed IEEE sequence on both engines), floored to e6 before the
    CASE. Constant series (D = 0) emit all-'b'.

    Scale shape: one map-side-combined groupBy(type, day); the per-type
    moment frame is type-cardinality (tiny) and joins back keyed by
    type; the string assembly sorts each type's days INSIDE an
    aggregated array (array_sort of ≤ series-length structs), never a
    global sort."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    day = F.floor(_ts_s(ts_col) / _DAY_S).cast("long")
    daily = (df.select(F.col(type_col).alias("g"), day.alias("day"),
                       cents.alias("v"))
             .groupBy("g", "day").agg(F.sum("v").cast("long").alias("t")))
    mom = daily.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("s1"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("s2"))
    dd = (F.col("n").cast("double") * F.col("s2").cast("double")
          - F.col("s1").cast("double") * F.col("s1").cast("double"))
    z = F.when(dd > 0,
               F.floor((F.col("n") * F.col("t") - F.col("s1"))
                       .cast("double") * F.lit(1000000.0)
                       / F.sqrt(dd)).cast("long")) \
         .otherwise(F.lit(0).cast("long"))
    sym = (F.when(F.col("z_e6") < -674500, F.lit("a"))
            .when(F.col("z_e6") < 0, F.lit("b"))
            .when(F.col("z_e6") < 674500, F.lit("c"))
            .otherwise(F.lit("d")))
    scored = (daily.join(mom, "g")
              .select("g", "day", z.alias("z_e6"))
              .select("g", "day", sym.alias("sym")))
    return (scored.groupBy("g")
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.concat_ws("", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("day", "sym"))),
                     lambda s: s.sym)).alias("sax"),
                 F.sum((F.col("sym") == "a").cast("long")).alias("n_a"),
                 F.sum((F.col("sym") == "b").cast("long")).alias("n_b"),
                 F.sum((F.col("sym") == "c").cast("long")).alias("n_c"),
                 F.sum((F.col("sym") == "d").cast("long")).alias("n_d"))
            .select(F.col("g").alias("event_type"), "n_days", "sax",
                    "n_a", "n_b", "n_c", "n_d"))
