"""Join operators (SURVEY §2.3).

The reference's joins are driver-side dict probes
(consumer2.py:116-157) and a pandas merge (show.py:142). Here they are
declarative equi-joins: Catalyst picks broadcast-hash for the small
side automatically (verified in tests via the physical plan); at 100 TB
the dimension sides (nation/region/projects) stay broadcast while the
fact side never shuffles for the join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner",
              broadcast_right: bool = False) -> DataFrame:
    """J1/J2: plain equi-join; optionally force-broadcast the right side.

    At fixture scale Catalyst broadcasts either way; the explicit hint
    is for dimension tables we *know* stay small at any SF (region,
    nation), where relying on size estimates is fragile after joins.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def keep_last(df: DataFrame, key_cols: list[str], order_col: str,
              tiebreak_col: str | None = None) -> DataFrame:
    """J3: deterministic last-write-wins dedup.

    The reference deduplicates by dict insertion (last record per URL
    wins, consumer2.py:131,141) — arrival-order-dependent. We make it
    deterministic: latest ``order_col`` wins, ties broken by
    ``tiebreak_col`` (SURVEY §4.3.2). One shuffle on the key; at scale
    this is the same shuffle the downstream join would need, so the
    window adds no extra exchange when keys align.
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__rn"))


def keep_last_agg(df: DataFrame, key_cols: list[str], order_col: str,
                  tiebreak_col: str) -> DataFrame:
    """J3 as an AGGREGATION: max_by(row-struct, (order, tiebreak)) per
    key. Same result as keep_last()'s window, different physical plan:
    a hash aggregate with MAP-SIDE partial combine — the shuffle
    carries one candidate row per (partition, key) instead of every
    row, and no sort happens at all. At 100 TB with few duplicates
    per key the window variant is fine; with heavy duplication (every
    key re-emitted constantly — the reference's upsert stream) this
    plan shuffles a fraction of the data. Requires a total order, so
    the tiebreak is mandatory here.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    order = F.struct(F.col(order_col), F.col(tiebreak_col))
    agg = (df.groupBy(*[F.col(k).alias(f"__k_{k}") for k in key_cols])
             .agg(F.max_by(payload, order).alias("__row")))
    return agg.select(F.col("__row.*"))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              payload: list[str]) -> DataFrame:
    """As-of join: each left row gets the payload of the latest right
    row with ``right_ts <= left_ts`` for the same key (left outer).

    Spark has no native as-of join. The scalable idiom: tag and union
    both sides, then one window pass per key ordered by (time, side) —
    right rows sort before left rows at equal timestamps so `<=`
    semantics hold — carrying the last non-null payload forward.
    Cost: ONE shuffle on the key + an in-partition sort, the same cost
    class as a sort-merge join; no per-key loops, no broadcast of the
    big side (contrast pd.merge_asof-per-group, which would bottleneck
    on the largest key).

    ``right`` must be unique per (on, right_ts) — pre-dedupe with
    keep_last() for deterministic results.
    """
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    # the payload travels as ONE struct, filled atomically: per-column
    # last(ignorenulls) fills would TEAR rows when a payload field is
    # legitimately null (o_orderkey from row A + o_totalprice from an
    # older row B — a row that never existed)
    r_struct = F.struct(*[F.col(c) for c in payload])
    lhs = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"), l_struct.alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload) + ">").alias("__p"))
    rhs = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
        r_struct.alias("__p"))
    w = (Window.partitionBy("__k").orderBy("__t", "__is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    # null keys: equi-join semantics say null never matches null, but
    # the window would happily group all null-__k rows together — so
    # the fill is voided for null keys (left rows keep null payload)
    filled = lhs.unionByName(rhs).select(
        "__is_left", "__l",
        F.when(F.col("__k").isNotNull(),
               F.last("__p", ignorenulls=True).over(w)).alias("__p"))
    return (filled.where(F.col("__is_left") == 1)
                  .select(F.col("__l.*"),
                          *[F.col(f"__p.{c}").alias(c) for c in payload]))


def range_join(left: DataFrame, bands: DataFrame, value_col: str,
               lo_col: str, hi_col: str) -> DataFrame:
    """Range (interval) join: left rows matched to band rows where
    ``lo <= value < hi``. The band side is broadcast (bands are small
    by construction); Catalyst executes a broadcast nested-loop join —
    the right physical plan for interval predicates with a tiny
    build side. For band tables too big to broadcast, bucketize the
    value to an equi-join key first."""
    cond = ((F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col)))
    return left.join(F.broadcast(bands), cond, "inner")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — left rows with a match (SURVEY §2.6 extension)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — the reference's ``not in processed_files`` batch
    eligibility check (consumer2.py:322-323) expressed relationally."""
    return left.join(right, on, "left_anti")


def incremental_join_view(view: DataFrame, delta: DataFrame,
                          dim: DataFrame, key_left: str,
                          key_right: str) -> DataFrame:
    """Incremental JOIN-view maintenance (the join counterpart of the
    A2 merge-aggregate): for insert-only fact deltas,
    Δ(fact ⋈ dim) = Δfact ⋈ dim, so the refreshed view is the old
    materialization UNION the delta join — the delta (a micro-batch)
    joins broadcast-style against the dimension without touching the
    existing view's data at all.

    100 TB shape: the stored view is append-only parquet; each refresh
    appends |Δfact ⋈ dim| rows — no rescan of the base fact. (Updates/
    deletes need keyed upserts — that path is the KeyedParquetStore
    sinks; this operator is the insert-only fast path.) The
    incremental == full-recompute property is the oracle contract."""
    dv = (delta.join(dim, delta[key_left] == dim[key_right])
               .select(*[F.col(c) for c in view.columns]))
    return view.unionByName(dv)


def grid_radius_join(df: DataFrame, id_col: str, x_col: str,
                     y_col: str, radius: int) -> DataFrame:
    """Planar radius self-join via GRID BUCKETING (the geohash /
    uniform-grid spatial-join pattern): points land in cells of side
    ``radius``; a pair within ``radius`` must sit in the same or an
    adjacent cell, so each point probes its 3×3 neighborhood and the
    exact distance check runs only inside those buckets — O(Σ cell²)
    instead of O(n²), the standard spatial pruning that also serves
    embedding spaces and time-bucket joins.

    Coordinates are INTEGERS (fixed-point, e.g. micro-degrees) and
    the verify is squared Euclidean ``dx² + dy² <= radius²`` — all
    BIGINT, no trig, so results hash identically cross-engine.
    Each point is REPLICATED into its 9 neighbor cells on the build
    side only once (explode), the probe side keeps one cell — the
    half-replication trick that avoids emitting each pair twice.

    Overflow: |coord| < 2^30 ⇒ dx² + dy² < 2^61. Output: (id_a <
    id_b, dist2)."""
    cell_x = F.floor(F.col(x_col) / radius).cast("long")
    cell_y = F.floor(F.col(y_col) / radius).cast("long")
    base = df.select(F.col(id_col), F.col(x_col).alias("__x"),
                     F.col(y_col).alias("__y"),
                     cell_x.alias("__cx"), cell_y.alias("__cy"))
    neigh = F.explode(F.array(*[
        F.struct((F.col("__cx") + dx).alias("nx"),
                 (F.col("__cy") + dy).alias("ny"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("n")
    a = (base.select(F.col(id_col).alias("id_a"),
                     F.col("__x").alias("xa"), F.col("__y").alias("ya"),
                     neigh)
             .select("id_a", "xa", "ya",
                     F.col("n.nx").alias("cx"), F.col("n.ny").alias("cy")))
    b = base.select(F.col(id_col).alias("id_b"),
                    F.col("__x").alias("xb"), F.col("__y").alias("yb"),
                    F.col("__cx").alias("cx"), F.col("__cy").alias("cy"))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (a.join(b, ["cx", "cy"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", d2.alias("dist2"))
             .where(F.col("dist2") <= radius * radius)
             .distinct())


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  cmp_cols: list[str]) -> DataFrame:
    """Keyed table diff — derive the change-data feed between two
    snapshots of the same table: one row per changed key with
    change_type ``I`` (insert: key only in new), ``D`` (delete: key
    only in old), ``U`` (update: key in both, compared columns
    differ). Unchanged keys are dropped.

    Comparison is a 60-bit stable fingerprint of the compared columns
    (``stable_hash64`` over a '|'-joined cast-to-string tuple) so the
    shuffle carries key + 8 bytes per side, not the full row — the
    same width regardless of table width. One full-outer join on the
    key (both snapshots shuffle-partition by key; at 100 TB with both
    snapshots bucketed on the key it becomes a zero-shuffle zip).

    Each column is length-prefixed (``<len>:<value>``, NULL → the bare
    token ``N``) before joining on '|', so the encoding is prefix-free:
    values containing '|' cannot alias across column boundaries
    (('a|b','c') → ``3:a|b|1:c`` vs ('a','b|c') → ``1:a|3:b|c``), and a
    literal string 'N' (→ ``1:N``) cannot collide with the NULL token.
    """
    from ..functions.scalar import stable_hash64

    def fp(df: DataFrame, side: str) -> DataFrame:
        def enc(c: str):
            s = F.col(c).cast("string")
            return F.coalesce(
                F.concat(F.length(s).cast("string"), F.lit(":"), s),
                F.lit("N"))
        parts = [enc(c) for c in cmp_cols]
        return df.select(F.col(key_col).alias("k"),
                         stable_hash64(F.concat_ws("|", *parts))
                         .alias(f"fp_{side}"))

    o, n = fp(old, "o"), fp(new, "n")
    joined = o.join(n, "k", "full_outer")
    ct = (F.when(F.col("fp_o").isNull(), F.lit("I"))
           .when(F.col("fp_n").isNull(), F.lit("D"))
           .when(F.col("fp_o") != F.col("fp_n"), F.lit("U")))
    return (joined.select(F.col("k").alias(key_col), ct.alias("change_type"))
            .where(F.col("change_type").isNotNull()))


def nearest_in_time(left: DataFrame, right: DataFrame,
                    key: str, left_ts: str, right_ts: str,
                    left_id: str, right_id: str) -> DataFrame:
    """Nearest-neighbor-in-time join per key: each left row pairs
    with the right row minimizing |Δt| — the two-sided sibling of the
    as-of join (which only looks backward). Same scale-safe union +
    single-key-shuffle idiom: one PRECEDING pass (latest right ≤ t,
    via last ignorenulls) and one FOLLOWING pass (earliest right ≥ t,
    reversed frame), then a per-row pick of the closer side
    (tie → the earlier right row, deterministically).

    No per-key loops, no range self-join; two ordered windows over
    the same (key, ts) shuffle — AQE reuses the exchange."""
    from pyspark.sql import Window
    l = left.select(F.col(key).alias("k"),
                    F.col(left_ts).alias("t"),
                    F.col(left_id).alias("lid"),
                    F.lit(1).alias("is_l"))
    r = right.select(F.col(key).alias("k"),
                     F.col(right_ts).alias("t"),
                     F.col(right_id).alias("rid"),
                     F.lit(0).alias("is_l"))
    lu = l.select("k", "t", F.col("lid"),
                  F.lit(None).cast("long").alias("rid"), "is_l")
    ru = r.select("k", "t", F.lit(None).cast("long").alias("lid"),
                  F.col("rid"), "is_l")
    uni = lu.unionByName(ru)
    # right rows sort BEFORE left rows at the same timestamp so an
    # equal-ts right row is visible to both directional passes
    wb = (Window.partitionBy("k").orderBy("t", "is_l", "rid")
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("k").orderBy("t", "is_l", "rid")
          .rowsBetween(0, Window.unboundedFollowing))
    rstruct = F.when(F.col("is_l") == 0,
                     F.struct(F.col("t").alias("rt"),
                              F.col("rid").alias("rrid")))
    prev = F.last(rstruct, ignorenulls=True).over(wb)
    nxt = F.first(rstruct, ignorenulls=True).over(wf)
    cand = (uni.withColumn("pv", prev).withColumn("nx", nxt)
            .where(F.col("is_l") == 1))
    d_prev = F.col("t") - F.col("pv.rt")
    d_next = F.col("nx.rt") - F.col("t")
    pick_prev = (F.col("pv").isNotNull()
                 & (F.col("nx").isNull() | (d_prev <= d_next)))
    chosen_id = (F.when(pick_prev, F.col("pv.rrid"))
                 .when(F.col("nx").isNotNull(), F.col("nx.rrid")))
    chosen_dt = (F.when(pick_prev, d_prev)
                 .when(F.col("nx").isNotNull(), d_next))
    return cand.select(
        F.col("lid").alias(left_id), F.col("k").alias(key),
        F.coalesce(chosen_id, F.lit(-1)).cast("long")
         .alias(f"nearest_{right_id}"),
        F.coalesce(chosen_dt, F.lit(-1)).cast("long")
         .alias("abs_delta_s"))
