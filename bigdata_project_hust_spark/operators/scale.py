"""Scale machinery: skew-salted joins and bucketed co-located joins.

The reference never needed these (its "join" was a driver-side dict,
reference consumer2.py:129-145). At 100 TB they are the difference
between a plan that finishes and one that doesn't:

* **Salted join** — a shuffle join's tasks are sized by key frequency;
  one hot key (a celebrity author, an empty-string URL) serializes the
  whole stage. Salting splits each hot left key across ``salt`` tasks
  and replicates the matching right rows to every split. AQE's skew
  join (on in session.py) handles moderate skew at runtime; explicit
  salting is the deterministic fallback for pathological keys and the
  only option when AQE is unavailable (streaming joins).

* **Bucketed join** — two tables bucketed by the join key into the same
  bucket count join with ZERO shuffle on every future query: each task
  reads matching buckets from both sides. For a fact table joined on
  the same key daily, the one-time bucketed write amortizes the shuffle
  away. (`spark.sql.sources.bucketing.enabled` is on by default.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with an n-way salt on the left (skewed)
    side; result is identical to ``left.join(right, key, how)``.

    Left rows get a per-row salt in [0, salt) (monotonic row id mod
    salt — uniform within every partition and independent of the key);
    right rows are replicated to all salt values via a tiny
    literal-range explode (narrow op, no shuffle of its own). The
    shuffle then hash-partitions on (key, salt), so a key carrying p%
    of all rows spreads over ``salt`` tasks instead of one. Supports
    'inner' and 'left' (replication never duplicates: each left row
    keeps exactly one salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    # the salt must be (pseudo)unique PER ROW, never a function of the
    # key — a key-derived salt maps every row of the hot key to the
    # same value and the skew is not split at all
    lsalt = F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    l_ = left.withColumn("__salt", lsalt)
    r_ = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l_.join(r_, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort_by: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed, bucket-sorted managed table. Joins and
    aggregations keyed on ``key`` between same-bucket-count tables
    then run shuffle-free (verified in tests by plan inspection).
    Thin alias of :func:`bigdata_project_hust_spark.io.
    write_bucketed_table` (name validation + orphaned-location
    cleanup live there); ``sort_by`` is accepted for source
    compatibility but the table is always bucket-sorted by ``key`` —
    a differently-sorted bucket layout would silently forfeit the
    sort-free merge join this helper exists to enable."""
    if sort_by is not None and sort_by != key:
        raise ValueError(
            f"write_bucketed sorts by the bucket key; got sort_by="
            f"{sort_by!r} != key={key!r}")
    from ..io import write_bucketed_table
    write_bucketed_table(df, table, key, buckets=buckets, mode=mode)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket key — Catalyst sees the
    matching hash-distribution on both sides and plans a sort-merge
    join with no Exchange."""
    return (spark.table(left_table)
                 .join(spark.table(right_table), key, how))


def morton2(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) code of two non-negative int columns: the low
    ``bits`` bits of each are interleaved (x even positions, y odd) —
    a pure bit-arithmetic column expression (5 mask/shift spreading
    rounds per input, classic magic-number Morton encoding), entirely
    inside whole-stage codegen.

    Locality property: points close in BOTH dimensions are close in
    z-value, so range-partitioning + sorting by z clusters every
    dimension at once — the layout trick behind Delta/Iceberg Z-order
    clustering."""
    def mask(v: int) -> Column:
        return F.lit(v).cast("long")

    def spread(c: Column) -> Column:
        c = c.cast("long").bitwiseAND(mask((1 << bits) - 1))
        for sh, m in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                      (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                      (1, 0x5555555555555555)):
            c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(mask(m))
        return c
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return (spread(cx).bitwiseOR(F.shiftleft(spread(cy), 1))
            .alias("zvalue"))


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_files: int = 16, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Z-order-clustered parquet layout: range-partition + sort by the
    Morton code of (x, y), one sorted run per output file.

    At 100 TB this is the multi-dimensional answer to sorted layout:
    a single-column sort gives perfect min/max file pruning on ONE
    column and none on the others; the z-order layout gives ~√-law
    pruning on BOTH columns at once, so point/range scans on either
    dimension skip most row groups (verified against parquet footer
    stats in tests/test_scale.py)."""
    z = df.withColumn("__z", morton2(x, y, bits))
    (z.repartitionByRange(n_files, "__z")
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path))


def write_partitioned(df: DataFrame, path: str, part_col: str) -> None:
    """Hive-style partitioned parquet layout (one directory per
    ``part_col`` value) — the physical layout that makes BOTH static
    partition pruning (literal filters skip directories at planning
    time) and DYNAMIC partition pruning work: when the fact side is
    partitioned on the join key and the dim side carries a selective
    filter, Spark injects a runtime subquery into the fact scan's
    PartitionFilters and never reads the pruned directories — at
    100 TB the difference between scanning one date/priority and all
    of them."""
    df.write.mode("overwrite").partitionBy(part_col).parquet(path)


def dpp_join(spark: SparkSession, fact_path: str, part_col: str,
             dim: DataFrame, dim_filter: Column) -> DataFrame:
    """Join a partitioned fact table with a filtered dimension on the
    partition column — shaped so Catalyst applies dynamic partition
    pruning (assert ``dynamicpruning`` in the scan's PartitionFilters;
    tests/test_round5.py gates it)."""
    fact = spark.read.parquet(fact_path)
    return fact.join(F.broadcast(dim.where(dim_filter)), part_col)


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew profiler — the diagnostic you run BEFORE picking
    a join strategy at 100 TB: per-key counts reduced to one row of
    n_rows, n_keys, the heaviest key and its count, the nearest-rank
    p99 key count, and an exact integer Gini coefficient of the key
    distribution (``(2·Σ rank·cnt − (K+1)·total)·1e6 // (K·total)``
    over counts ranked ascending — 0 = uniform, →1e6 = one hot key).

    Everything is rank/count arithmetic on BIGINTs. Plan: one key agg
    (map-side partials), one |keys|-row window rank, one 1-row rollup
    — the corpus is touched once.
    """
    from pyspark.sql import Window
    counts = df.groupBy(F.col(key_col).alias("k")) \
               .agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("c", "k")
    ranked = counts.select(
        "k", "c", F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("long")
         .alias("n_k"))
    agg = ranked.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max(F.struct("c", "k")).alias("top"),
        F.sum(F.col("rn") * F.col("c")).cast("long").alias("s_rank"),
        F.min(F.when(F.col("rn") * 100 >= F.col("n_k") * 99,
                     F.col("c"))).alias("p99_cnt"))
    return agg.select(
        "n_rows", "n_keys",
        F.col("top.k").alias("max_key"),
        F.col("top.c").cast("long").alias("max_cnt"),
        F.col("p99_cnt").cast("long").alias("p99_cnt"),
        F.floor((2 * F.col("s_rank")
                 - (F.col("n_keys") + 1) * F.col("n_rows"))
                * F.lit(1_000_000)
                / (F.col("n_keys") * F.col("n_rows")))
         .cast("long").alias("gini_e6"))


def shard_plan(df: DataFrame, size_col: Column | str,
               source_col: str = "source", id_col: str = "doc_id",
               target_bytes: int = 1 << 14) -> DataFrame:
    """Deterministic output-shard assignment by running byte total —
    the compaction/sharding planner that turns a skewed document set
    into ~target-sized output files (the small-files problem at the
    write edge).  Shard id = cumulative bytes BEFORE the row,
    integer-divided by the target: pure prefix arithmetic (exact
    ``div``, never a double), reproducible across engines and reruns,
    one per-source partitioned window (no global sort).  A row larger
    than the target gets its own shard by construction.  Emits the
    per-shard manifest (doc count + actual bytes) the writer would
    execute."""
    from pyspark.sql import Window
    c = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (Window.partitionBy(source_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    sized = df.select(F.col(source_col), F.col(id_col),
                      c.cast("long").alias("bytes"))
    planned = (sized
               .select(source_col, "bytes",
                       (F.sum("bytes").over(w) - F.col("bytes"))
                       .cast("long").alias("cum_before"))
               .select(source_col, "bytes",
                       F.expr(f"cum_before div {target_bytes}")
                        .alias("shard_id")))
    return (planned.groupBy(source_col, "shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("bytes").alias("shard_bytes"))
            .orderBy(source_col, "shard_id"))


def consistent_hash_routing(df: DataFrame, id_col: str = "doc_id",
                            n_nodes: int = 4,
                            vnodes: int = 8) -> DataFrame:
    """Consistent-hash ring routing with virtual nodes — the shard
    router every distributed KV/cache layer runs, expressed as one
    declarative plan: ring positions are stable_hash64("node:replica")
    (n_nodes × vnodes literals, identical on every engine), a key
    routes to the first vnode clockwise from its own hash, wrapping to
    the ring minimum.

    The successor lookup reuses the MERGE-STREAM window (keys and ring
    positions union-sorted; answer = min over the forward frame) with
    positions encoded pos·n_nodes + node — injective, order-preserving
    — so the argmin needs no struct comparison and no range join; the
    wraparound is one broadcast scalar.  Output: per-node key counts,
    the load-balance audit (with 8 vnodes expect visible imbalance —
    that IS the measurement)."""
    from pyspark.sql import Window
    from ..functions.scalar import stable_hash64
    ring = df.sparkSession.range(n_nodes * vnodes).select(
        (F.col("id") % n_nodes).cast("long").alias("node"),
        stable_hash64(F.concat(
            F.lit("ring:"), (F.col("id") % n_nodes).cast("string"),
            F.lit(":"), (F.col("id") / n_nodes).cast("long")
            .cast("string")), seed=17).alias("pos"))
    enc = ring.select(
        (F.col("pos") * n_nodes + F.col("node")).alias("epos"))
    keys = df.select(
        stable_hash64(F.col(id_col).cast("string"), seed=23)
        .alias("h"))
    wrap = enc.groupBy().agg(F.min("epos").alias("wrap_epos"))
    merged = (keys.select((F.col("h") * n_nodes).alias("spos"),
                          F.lit(0).alias("is_ring"),
                          F.lit(None).cast("long").alias("epos"))
              .unionByName(enc.select(
                  F.col("epos").alias("spos"),
                  F.lit(1).alias("is_ring"), "epos")))
    wm = (Window.orderBy("spos", "is_ring")
          .rowsBetween(0, Window.unboundedFollowing))
    routed = (merged
              .select("is_ring", F.min("epos").over(wm).alias("succ"))
              .where(F.col("is_ring") == 0)
              .crossJoin(F.broadcast(wrap))
              .select(F.pmod(F.coalesce("succ", "wrap_epos"),
                             F.lit(n_nodes)).alias("node")))
    return (routed.groupBy("node")
            .agg(F.count("*").alias("n_keys"))
            .orderBy("node"))


# ---------------------------------------------------------------------------
# Distributed running aggregates (no single-task global sorts)
# ---------------------------------------------------------------------------
#
# `Window.orderBy(col)` with no partitionBy funnels the WHOLE frame
# through one task — fine for an already-aggregated few-hundred-row
# frame, a straggler when the frame is a distinct-VALUE grid whose
# cardinality approaches the row count (continuous 100 TB columns).
# These helpers are the two-phase bucketed form proven in
# `curation.sequence_pack`: bucket the ordering key with a
# data-adaptive range (min/max come from a relational agg broadcast
# back — no driver collect), run the within-bucket window in parallel,
# and combine with per-bucket offsets from a tiny (`n_buckets`-row)
# totals table whose OWN global window is safe. Results are
# bit-identical to the naive global window (asserted in test_scale.py).

def _with_range_bucket(df: DataFrame, order_col: str,
                       n_buckets: int) -> DataFrame:
    """Adds ``__b``: an order-preserving integer bucket of
    ``order_col`` with ~``n_buckets`` buckets spanning [min, max].
    Integer-exact (width = ceil(range/n)); degenerate domains (all one
    value) collapse to one bucket, which is no worse than the naive
    plan.

    NULL ordering keys get the dedicated bucket ``-1``, which sorts
    before every real bucket — matching ``Window.orderBy``'s default
    NULLS FIRST, so NULL-key rows neither vanish in the ``__b`` join
    nor leak their totals into other buckets' base offsets.

    The ordering domain must span < 2^63 (``__mx - __mn`` is computed
    in BIGINT); a wider domain — e.g. raw full-range ``stable_hash64``
    values — raises rather than silently wrapping into wrong buckets.
    Rescale such keys (e.g. ``>> 1``) before bucketing."""
    rng = df.groupBy().agg(
        F.min(order_col).cast("long").alias("__mn"),
        F.max(order_col).cast("long").alias("__mx"))
    # integer `div` throughout — double division would lose exactness
    # for keys near 2^63 and could break bucket monotonicity.  The
    # if-guard catches BIGINT wrap when ANSI mode is off (ANSI on
    # throws ARITHMETIC_OVERFLOW on the subtraction itself).
    width = F.expr(
        "if(__mx is null or (__mx - __mn) >= 0, "
        f"(__mx - __mn) div {int(n_buckets)} + 1, "
        "raise_error('range_bucket: ordering domain spans >= 2^63; "
        "rescale the order key'))")
    return (df.crossJoin(F.broadcast(rng))
            .withColumn("__w", width.cast("long"))
            .withColumn("__b", F.expr(
                f"if({order_col} is null, -1L, "
                f"(cast({order_col} as bigint) - __mn) div __w)"))
            .drop("__mn", "__mx", "__w"))


def dist_cumsum(df: DataFrame, order_col: str, sums: dict[str, str],
                tie_cols: tuple[str, ...] = (),
                n_buckets: int = 256,
                inclusive: bool = True) -> DataFrame:
    """Running sums over a numeric ordering column WITHOUT a global
    single-task sort: for each ``out_col -> val_col`` in ``sums``,
    appends ``out_col`` = sum(val_col) over rows ordered by
    (order_col, *tie_cols) up to the current row (``inclusive``) or
    strictly before it. Two-phase: parallel within-bucket windows +
    an ``n_buckets``-row base-offset table joined back via broadcast.
    """
    from pyspark.sql import Window
    vals = list(dict.fromkeys(sums.values()))
    d = _with_range_bucket(df, order_col, n_buckets)
    end = 0 if inclusive else -1
    win = (Window.partitionBy("__b").orderBy(order_col, *tie_cols)
           .rowsBetween(Window.unboundedPreceding, end))
    for out, val in sums.items():
        d = d.withColumn(f"__in_{out}",
                         F.coalesce(F.sum(val).over(win),
                                    F.lit(0).cast("long")))
    btot = d.groupBy("__b").agg(
        *[F.sum(v).alias(f"__bt_{v}") for v in vals])
    base_w = (Window.orderBy("__b")
              .rowsBetween(Window.unboundedPreceding, -1))
    base = btot.select(
        "__b",
        *[F.coalesce(F.sum(f"__bt_{v}").over(base_w),
                     F.lit(0).cast("long")).alias(f"__base_{v}")
          for v in vals])
    d = d.join(F.broadcast(base), "__b")
    for out, val in sums.items():
        d = d.withColumn(out, (F.col(f"__base_{val}")
                               + F.col(f"__in_{out}")).cast("long"))
    drop = (["__b"] + [f"__in_{o}" for o in sums]
            + [f"__base_{v}" for v in vals])
    return d.drop(*drop)


def dist_suffix_min(df: DataFrame, order_col: str, val_col: str,
                    out_col: str, tie_cols: tuple[str, ...] = (),
                    n_buckets: int = 256) -> DataFrame:
    """Suffix minimum (min of ``val_col`` over [current row, end) in
    (order_col, *tie_cols) order) without a global sort — the
    merge-stream lookup shape (`quantile_normalize`,
    `consistent_hash_routing`). NULL ``val_col`` cells are ignored
    (same as ``F.min``). Per-bucket suffix mins run in parallel; the
    cross-bucket carry is a min over LATER buckets from the tiny
    per-bucket aggregate."""
    from pyspark.sql import Window
    d = _with_range_bucket(df, order_col, n_buckets)
    win = (Window.partitionBy("__b").orderBy(order_col, *tie_cols)
           .rowsBetween(0, Window.unboundedFollowing))
    d = d.withColumn("__in_min", F.min(val_col).over(win))
    bmin = d.groupBy("__b").agg(F.min(val_col).alias("__bm"))
    later_w = Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    carry = bmin.select("__b", F.min("__bm").over(later_w).alias("__carry"))
    d = d.join(F.broadcast(carry), "__b")
    return (d.withColumn(out_col, F.least("__in_min", "__carry"))
            .drop("__b", "__in_min", "__carry"))
