"""Time-window aggregation (SURVEY §2.9 ST7).

The reference *declares* a per-user time-indexed engagement log
(readme.md:15, consumed at show.py:103-116) but never produces it. Here
it is a tumbling-window aggregate. Window starts are emitted as epoch
seconds (long) — cross-engine-stable (no timestamp/timezone coercion
between Spark and the DuckDB oracle) and directly usable as the
reference's string-keyed map keys (show.py:105 sorts keys as ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_s: int, tiebreak_col: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_s`` seconds.

    Classic lag + conditional-cumsum over one key-partitioned window —
    a single shuffle; whole-stage-codegen'd window exec. Timestamps are
    compared at whole-second resolution (unix_timestamp truncation) so
    the DuckDB oracle (floor(epoch)) agrees exactly.

    Output: one row per (key, session) with event count and session
    start/end epoch seconds.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col),
                                            F.col(tiebreak_col))
    ts_s = F.unix_timestamp(F.col(ts_col))
    # two projections: window functions can't nest in one expression
    flagged = df.select(
        F.col(key_col), F.col(ts_col), F.col(tiebreak_col),
        ts_s.alias("__ts_s"),
        F.lag(ts_s).over(w).alias("__prev_s"))
    new_sess = F.when(
        F.col("__prev_s").isNull()
        | ((F.col("__ts_s") - F.col("__prev_s")) > gap_s),
        F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)).rowsBetween(
        Window.unboundedPreceding, 0)
    with_sess = flagged.select(
        F.col(key_col), F.col("__ts_s"),
        F.sum(new_sess).over(cum).alias("session_id"))
    return (with_sess.groupBy(key_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("__ts_s").alias("session_start_s"),
                 F.max("__ts_s").alias("session_end_s")))


def tumbling_window_agg(df: DataFrame, ts_col: str, key_col: str,
                        window_s: int, aggs: list) -> DataFrame:
    """Tumbling window of ``window_s`` seconds per key.

    Bucketing by ``floor(epoch/window)*window`` is equivalent to
    ``F.window(ts, ...)`` for tumbling windows but exposes the start as
    a plain long. Aggregation is a single hash-agg shuffle on
    (key, bucket) — the same plan streaming uses, so batch and
    streaming variants share semantics.
    """
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / window_s)
              * window_s).cast("long").alias("window_start")
    return df.groupBy(F.col(key_col), bucket).agg(*aggs)


def gapfill_tumbling(df: DataFrame, ts_col: str, key_col: str,
                     window_s: int, value_col: str) -> DataFrame:
    """Hypertable-style gap-filled rollup: tumbling-window sums per key
    on a DENSE time grid — every ``window_s`` bucket between each key's
    first and last event exists, with both zero-fill and
    last-observation-carried-forward (LOCF) values plus an ``is_gap``
    flag. The operation dashboards/feature-pipelines need that a plain
    groupBy can't give (missing buckets simply don't exist there).

    Plan shape: one hash-agg (the rollup), a per-key span agg feeding
    ``sequence``+``explode`` to generate the grid map-side (grid rows
    are generated, never shuffled as input), a left join back to the
    sparse buckets (same key partitioning), and one LOCF window. Grid
    size is bounded by span/window_s per key — at 100 TB you bound the
    span (or partition by day) exactly like any hypertable rollup.
    """
    buckets = tumbling_window_agg(
        df, ts_col, key_col, window_s,
        [F.round(F.sum(F.coalesce(F.col(value_col), F.lit(0.0))), 2)
          .alias("__v")])
    spans = buckets.groupBy(key_col).agg(
        F.min("window_start").alias("__mn"), F.max("window_start").alias("__mx"))
    grid = spans.select(
        F.col(key_col),
        F.explode(F.sequence("__mn", "__mx", F.lit(window_s)))
         .alias("window_start"))
    j = grid.join(buckets, [key_col, "window_start"], "left")
    w = (Window.partitionBy(key_col).orderBy("window_start")
               .rowsBetween(Window.unboundedPreceding, 0))
    return j.select(
        F.col(key_col), F.col("window_start"),
        F.coalesce("__v", F.lit(0.0)).alias("value_zero_fill"),
        F.last("__v", ignorenulls=True).over(w).alias("value_locf"),
        F.col("__v").isNull().alias("is_gap"))


def engagement_change_log(df: DataFrame, ts_col: str, key_col: str,
                          window_s: int, metric_cols: list[str]) -> DataFrame:
    """ST7 sink shape: per-key map<window_start_str -> [m1, m2, ...]> —
    the exact engagementChangeLogs layout show.py:103-110 consumes
    (string unix-ts keys, fixed-position metric arrays)."""
    windowed = tumbling_window_agg(
        df, ts_col, key_col, window_s,
        [F.sum(F.coalesce(F.col(m), F.lit(0))).alias(m) for m in metric_cols])
    entry = F.struct(
        F.col("window_start").cast("string").alias("key"),
        F.array(*[F.col(m) for m in metric_cols]).alias("value"))
    return (windowed
            .groupBy(key_col)
            .agg(F.map_from_entries(
                F.array_sort(F.collect_list(entry))).alias("engagementChangeLogs")))


def scd2_history(df: DataFrame, key_col: str, attr_col: str,
                 ts_col: str, tiebreak_col: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse an event stream
    into per-key attribute-version intervals — one row per run of
    consecutive equal ``attr_col`` values, with ``valid_from`` /
    ``valid_to`` (next version's start; NULL while current),
    ``version`` (1-based per key), event count, and ``is_current``.

    The classic warehouse merge the reference's upsert sinks
    (consumer2.py keep-last semantics) approximate with destructive
    overwrites — SCD2 keeps the full history queryable. Spark shape:
    ONE shuffle on ``key_col``; change detection (lag), run numbering
    (conditional running sum), interval rollup (groupBy run), and
    valid_to stitching (lead) all reuse that same partitioning, so
    Exchange appears once in the plan. ``tiebreak_col`` makes the
    within-timestamp order total — without it, equal-``ts`` events
    would make version boundaries nondeterministic across runs.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.col(attr_col) != F.lag(attr_col).over(w))
    ).cast("long")
    runs = df.select(
        key_col, attr_col, ts_col, tiebreak_col,
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("version"))
    spans = (runs.groupBy(key_col, "version")
             .agg(F.min(attr_col).alias(attr_col),  # constant within run
                  F.min(ts_col).alias("valid_from"),
                  F.count("*").alias("n_events")))
    lead_w = Window.partitionBy(key_col).orderBy("version")
    return (spans
            .withColumn("valid_to", F.lead("valid_from").over(lead_w))
            .select(F.col(key_col), F.col("version").cast("long"),
                    F.col(attr_col), "valid_from", "valid_to",
                    F.col("n_events").cast("long"),
                    F.col("valid_to").isNull().cast("long")
                     .alias("is_current")))


def ohlc_resample(df: DataFrame, ts_col: str, key_col: str,
                  value_col: str, window_s: int,
                  tiebreak_col: str) -> DataFrame:
    """OHLC downsampling (the hypertable/candlestick resample): per
    (key, tumbling bucket), the Open (value at the earliest event),
    High, Low, Close (value at the latest event), and count.

    Open/Close are ``min_by``/``max_by`` over a (ts, tiebreak)
    struct — ONE hash-agg with full map-side combine (no sort, no
    window function), so the shuffle carries one row per (key,
    bucket) per map task regardless of raw event volume — the shape
    that makes continuous OHLC rollups cheap at 100 TB. The tiebreak
    column pins equal-timestamp events deterministically."""
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col))
                      / F.lit(window_s)) * window_s).cast("long")
    ordkey = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (df.groupBy(F.col(key_col), bucket.alias("bucket_start"))
              .agg(F.min_by(F.col(value_col), ordkey).alias("open"),
                   F.max(F.col(value_col)).alias("high"),
                   F.min(F.col(value_col)).alias("low"),
                   F.max_by(F.col(value_col), ordkey).alias("close"),
                   F.count("*").cast("long").alias("n_events")))
