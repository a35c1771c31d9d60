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

import math

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


# linear-counting estimates m*ln(m/V) for V = 1..m-1, computed ONCE
# here and embedded as literals in both engines — the correction needs
# ln(), whose 1-ulp licence differs between libm implementations, but
# there are only m-1 possible inputs so the table sidesteps it
_LC_TABLE = {v: HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M)}


def _lc_estimate(v_zero: Column) -> Column:
    expr = F.lit(0.0)
    for v, e in _LC_TABLE.items():
        expr = F.when(v_zero == F.lit(v), F.lit(e)).otherwise(expr)
    return expr


def _lc_estimate_sql(v_zero: str) -> str:
    branches = "".join(f" WHEN {v} THEN {e!r}"
                       for v, e in _LC_TABLE.items())
    return f"(CASE {v_zero}{branches} ELSE 0.0 END)"


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The (idx, reg) register table of ``col``'s HLL sketch — the
    mergeable representation: sketches of disjoint shards (or
    different columns) union by register-wise max, which is exactly
    how a 1000-executor job combines per-partition sketches."""
    h = stable_hash64(F.col(col).cast("string"))
    return (df.select((h % HLL_M).alias("idx"),
                      _rho(F.shiftrightunsigned(h, 8)).alias("rho"))
              .groupBy("idx").agg(F.max("rho").alias("reg")))


def hll_merge(*reg_tables: DataFrame) -> DataFrame:
    """Union HLL register tables by register-wise max — the sketch
    merge operation (associative, commutative, idempotent)."""
    out = reg_tables[0]
    for t in reg_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("idx").agg(F.max("reg").alias("reg"))


def _estimate_from_registers(regs: DataFrame,
                             exact: DataFrame) -> DataFrame:
    """Shared registers -> one-row summary: order-pinned 2^-reg fold,
    raw estimate, linear-counting branch, and the rel-error assert.

    The empty set is handled explicitly: v_zero == m short-circuits to
    estimate 0 (the LC table only covers V in 1..m-1), and the
    rel-error contract becomes "estimate must be 0" instead of a 0/0
    division that would kill the job under ANSI mode."""
    folded = regs.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "reg"))),
                lambda s: s.getField("reg")),
            F.lit(0.0),
            lambda acc, r: acc + _pow2neg(r))
         .alias("s_present"),
        F.count("*").alias("n_present"),
        F.coalesce(F.sum(F.col("reg") * (F.col("idx") + 1)), F.lit(0))
         .cast("long").alias("reg_checksum"))
    raw = (F.lit(HLL_ALPHA_M2)
           / (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present"))))
    v_zero = F.lit(HLL_M) - F.col("n_present")
    est = F.when(v_zero == F.lit(HLL_M), F.lit(0.0)) \
           .when((raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
                 _lc_estimate(v_zero)) \
           .otherwise(raw)
    out = folded.crossJoin(F.broadcast(exact)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.floor(est).cast("long").alias("hll_estimate"),
        v_zero.cast("long").alias("n_zero_registers"),
        F.col("reg_checksum"))
    # m=256 -> rsd ~ 1.04/sqrt(256) = 6.5%; assert at ~3 sigma.
    # n_exact=0 divides nowhere: the empty sketch must estimate 0.
    rel_err = F.when(F.col("n_exact") == 0,
                     F.when(F.col("hll_estimate") == 0, F.lit(0.0))
                      .otherwise(F.lit(1.0))) \
               .otherwise(F.abs(F.col("hll_estimate") - F.col("n_exact"))
                          / F.col("n_exact"))
    return out.where(F.assert_true(
        rel_err <= 0.20,
        F.lit("deterministic HLL estimate outside 20% of exact")).isNull())


def hll_sketch(df: DataFrame, col: str) -> DataFrame:
    """One-row HLL summary of ``count(distinct col)``: the estimate
    (with the standard small-range linear-counting branch — its ln()
    comes from a Python-side literal table over the 255 possible
    zero-register counts, so no engine libm is ever consulted), the
    exact count for reference, the empty-register count, and an
    order-pinned register checksum so a single flipped register fails
    the value hash.

    The S = sum of 2^-reg fold runs sequentially over registers sorted
    by index — powers of two are exact doubles and the addition order
    is pinned, so S (and the estimate) is bit-identical everywhere.
    """
    regs = hll_registers(df, col)
    # exact count rides the same scan for the error contract
    exact = df.select(F.count_distinct(col).alias("n_exact"))
    return _estimate_from_registers(regs, exact)


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
  exact AS (SELECT count(DISTINCT {col})::BIGINT AS n_exact FROM {table}),
  est AS (
    SELECT *,
           {HLL_ALPHA_M2!r} / (s_present + ({HLL_M} - n_present)) AS raw,
           ({HLL_M} - n_present) AS v_zero
    FROM folded
  )
  SELECT n_exact,
         floor(CASE WHEN raw <= {2.5 * HLL_M!r} AND v_zero > 0
                    THEN {_lc_estimate_sql("v_zero")}
                    ELSE raw END)::BIGINT AS hll_estimate,
         v_zero::BIGINT AS n_zero_registers,
         reg_checksum
  FROM est, exact
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005), deterministic
# ---------------------------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 256    # counters per row


def _cms_cells(col: str) -> list[Column]:
    return [(stable_hash64(F.col(col).cast("string"), seed=100 + r)
             % CMS_W).alias(f"c{r}") for r in range(CMS_D)]


def cms_grid(df: DataFrame, col: str) -> DataFrame:
    """The (row, cw) -> count cell grid — a plain groupBy-count, so it
    runs unchanged over a STREAMING DataFrame (outputMode update/
    complete): the sketch state is the aggregation state, bounded at
    d*w cells forever. Works as the incremental build path; the batch
    grid over the same rows is bit-identical."""
    hashed = df.select(*_cms_cells(col))
    return (hashed
            .select(F.explode(F.array(*[
                F.struct(F.lit(r).alias("row"), F.col(f"c{r}").alias("cw"))
                for r in range(CMS_D)])).alias("cell"))
            .groupBy("cell.row", "cell.cw")
            .agg(F.count("*").cast("long").alias("cnt")))


def cms_counts(df: DataFrame, col: str) -> DataFrame:
    """Count-min frequency estimates for every distinct value of
    ``col``, next to the exact count: one (row, counter) grid
    aggregate over the corpus (d·w = 1024 cells regardless of data
    size, collapsed map-side), then each distinct value reads its d
    cells back via a broadcast of the tiny grid and takes the min.

    CMS guarantees estimate >= exact (asserted in-query per value) and
    overshoot <= 2n/w with prob 1 - 2^-d (not asserted — it is
    probabilistic); every cell is an integer sum of integer
    increments, so the whole sketch is value-hash verifiable.
    """
    nn = df.where(F.col(col).isNotNull())
    hashed = nn.select(F.col(col).alias("v"), *_cms_cells(col))
    grid = cms_grid(nn, col)
    exact = hashed.groupBy("v").agg(
        F.count("*").cast("long").alias("n_exact"),
        *[F.first(f"c{r}").alias(f"c{r}") for r in range(CMS_D)])
    est = exact
    for r in range(CMS_D):
        g = grid.where(F.col("row") == r) \
                .select(F.col("cw").alias(f"c{r}"),
                        F.col("cnt").alias(f"e{r}"))
        est = est.join(F.broadcast(g), f"c{r}")
    estimate = F.least(*[F.col(f"e{r}") for r in range(CMS_D)])
    out = est.select(
        F.col("v"), F.col("n_exact"), estimate.alias("cms_estimate"))
    return out.where(F.assert_true(
        F.col("cms_estimate") >= F.col("n_exact"),
        F.lit("CMS underestimated — sketch is broken")).isNull())


def cms_counts_oracle(table: str, col: str) -> str:
    hs = [f"({stable_hash64_sql(f'{col}::VARCHAR', seed=100 + r)}"
          f" % {CMS_W})" for r in range(CMS_D)]
    grid_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {hs[r]} AS cw FROM {table}"
        for r in range(CMS_D))
    joins = " ".join(
        f"JOIN grid g{r} ON g{r}.row = {r} AND g{r}.cw = e.c{r}"
        for r in range(CMS_D))
    least = ", ".join(f"g{r}.cnt" for r in range(CMS_D))
    cdefs = ", ".join(f"{hs[r]} AS c{r}" for r in range(CMS_D))
    return f"""
  WITH grid AS (
    SELECT row, cw, count(*)::BIGINT AS cnt
    FROM ({grid_rows}) GROUP BY row, cw
  ),
  e AS (
    SELECT {col} AS v, count(*)::BIGINT AS n_exact, {cdefs}
    FROM {table} GROUP BY {col}
  )
  SELECT e.v, e.n_exact, least({least})::BIGINT AS cms_estimate
  FROM e {joins}
"""


# ---------------------------------------------------------------------------
# Bloom filter, deterministic (bit_or word aggregate)
# ---------------------------------------------------------------------------

BLOOM_K = 5          # hash functions
BLOOM_LOG2_M = 17    # 2^17 bits
BLOOM_WORD_BITS = 62  # bits packed per BIGINT word: offsets 0..61 only,
                      # so neither engine ever shifts into (or past) the
                      # sign bit — DuckDB's checked << errors on 1<<63


def _bloom_bit_cols(col_expr: Column,
                    hash_fn: str = "stable") -> list[Column]:
    """The k bit positions of a key via Kirsch–Mitzenmacher double
    hashing ("Less Hashing, Same Performance", 2006): ONE hash per
    key, split into h1 (low index bits) and h2 (next index bits,
    forced odd), then bit_i = (h1 + i·h2) mod m. The naive
    k-independent-hashes layout costs k hashes per probed row — the
    dominant term of the whole semi-join prune at sf0.1 (measured
    2.6 s of md5 alone vs 0.3 s for everything else); KM keeps the
    FP asymptotics and cuts hashing 5×.

    ``hash_fn``: 'stable' = the md5-based cross-engine hash — needed
    when the BITS themselves are the verified output (the
    bloom_customer_orders sketch contract). 'native' = xxhash64
    (codegen JVM, ~10× cheaper) — correct for RUNTIME-FILTER use
    (bloom_prune before an exact join), where bit layout is invisible
    to results and only probe throughput matters."""
    m_mask = (1 << BLOOM_LOG2_M) - 1
    if hash_fn == "native":
        h = F.abs(F.xxhash64(col_expr, F.lit(200)))
    else:
        h = stable_hash64(col_expr.cast("string"), seed=200)
    h1 = h.bitwiseAND(F.lit(m_mask))
    h2 = (F.shiftright(h, BLOOM_LOG2_M).bitwiseAND(F.lit(m_mask))
          .bitwiseOR(F.lit(1)))
    return [(h1 + F.lit(i) * h2).bitwiseAND(F.lit(m_mask))
            for i in range(BLOOM_K)]


def bloom_bits_sql(expr: str) -> str:
    """DuckDB twin of :func:`_bloom_bit_cols` — returns a SQL list
    literal of the k bit positions (oracle helper)."""
    m_mask = (1 << BLOOM_LOG2_M) - 1
    h = stable_hash64_sql(expr, seed=200)
    h1 = f"({h} & {m_mask})"
    h2 = f"((({h} >> {BLOOM_LOG2_M}) & {m_mask}) | 1)"
    items = ", ".join(f"(({h1} + {i} * {h2}) & {m_mask})"
                      for i in range(BLOOM_K))
    return f"[{items}]"


def bloom_build(df: DataFrame, col: str,
                hash_fn: str = "stable") -> DataFrame:
    """Deterministic Bloom filter over ``col``: k=5 double-hashed bit
    positions (one md5 per key) set bits in an m=2^17 array stored as
    64-bit words; the build is one (word index → bit_or) aggregate —
    at most k·2048 groups survive map-side combine per task, whatever
    the corpus size. Returns the word table (word_idx, word)."""
    bits = F.array(*_bloom_bit_cols(F.col(col), hash_fn))
    # shiftleft takes a literal count in the python API; the
    # variable-distance shift goes through expr
    words = (df.select(F.explode(bits).alias("bit"))
               .select(F.floor(F.col("bit") / BLOOM_WORD_BITS).cast("long")
                        .alias("word_idx"),
                       F.expr(f"shiftleft(1L, cast(bit % {BLOOM_WORD_BITS}"
                              " AS int))").alias("w")))
    return (words.groupBy("word_idx")
                 .agg(F.expr("bit_or(w)").cast("long").alias("word")))


def bloom_probe(words: DataFrame, probes: DataFrame,
                col: str) -> DataFrame:
    """Membership test: a key is 'present' iff all k bit words have
    its bit set. The packed 2048-word map broadcasts as ONE row (one
    build agg — joining the word table per hash would re-aggregate it
    k times); the probe is pure map-side arithmetic — the serving-path
    shape for 100 TB build / point-lookup probe."""
    packed = bloom_pack(words)
    bit_cols = [f"__bb{i}" for i in range(BLOOM_K)]
    p = probes.select(
        F.col(col).alias("key"),
        *[b.alias(n) for b, n in zip(_bloom_bit_cols(F.col(col)),
                                     bit_cols)])
    return (p.crossJoin(F.broadcast(packed))
             .select("key",
                     _bloom_hit_from_bits(F.col("__bloom"), bit_cols)
                     .cast("long").alias("maybe_present")))


def hll_union_estimate(a: DataFrame, col_a: str,
                       b: DataFrame, col_b: str) -> DataFrame:
    """Distinct count of the UNION of two key sets, estimated by
    merging their HLL sketches register-wise — no row-level union or
    re-scan of either input's values; the exact union count rides
    along for the error contract. This is the property that makes
    sketches worth having at 100 TB: per-shard sketches combine in
    O(m), not O(data)."""
    merged = hll_merge(hll_registers(a, col_a), hll_registers(b, col_b))
    exact = (a.select(F.col(col_a).cast("string").alias("k"))
              .unionByName(b.select(F.col(col_b).cast("string").alias("k")))
              .agg(F.count_distinct("k").alias("n_exact")))
    return _estimate_from_registers(merged, exact)


def hll_union_oracle(table_a: str, col_a: str,
                     table_b: str, col_b: str) -> str:
    ha = stable_hash64_sql(f"{col_a}::VARCHAR")
    hb = stable_hash64_sql(f"{col_b}::VARCHAR")
    rho = _rho_sql("(h >> 8)")
    return f"""
  WITH hashed AS (
    SELECT {ha} AS h FROM {table_a}
    UNION ALL
    SELECT {hb} AS h FROM {table_b}
  ),
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
  exact AS (
    SELECT count(DISTINCT k)::BIGINT AS n_exact FROM (
      SELECT {col_a}::VARCHAR AS k FROM {table_a}
      UNION ALL SELECT {col_b}::VARCHAR FROM {table_b})
  ),
  est AS (
    SELECT *,
           {HLL_ALPHA_M2!r} / (s_present + ({HLL_M} - n_present)) AS raw,
           ({HLL_M} - n_present) AS v_zero
    FROM folded
  )
  SELECT n_exact,
         floor(CASE WHEN raw <= {2.5 * HLL_M!r} AND v_zero > 0
                    THEN {_lc_estimate_sql("v_zero")}
                    ELSE raw END)::BIGINT AS hll_estimate,
         v_zero::BIGINT AS n_zero_registers,
         reg_checksum
  FROM est, exact
"""


def bloom_pack(words: DataFrame) -> DataFrame:
    """Pack the :func:`bloom_build` word table into ONE row holding a
    DENSE ``array<long>`` over every word slot (missing → 0) — ~17 KB.
    Joining k times against the word table re-aggregates (and
    re-broadcasts) it k times in the static plan; the packed form is
    built by a single agg and every probe is an O(1) array
    ``element_at`` inside whole-stage codegen. (A map<idx, word> pack
    probes in O(n) — Spark's MapData lookup is a linear scan, which
    measured 7.7 s vs sub-second on the sf0.1 fact prune.)"""
    n_words = ((1 << BLOOM_LOG2_M) + BLOOM_WORD_BITS - 1) \
        // BLOOM_WORD_BITS
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda j: F.coalesce(F.element_at(m, j.cast("long")), F.lit(0)))
    return words.agg(dense.alias("__bloom"))


def _bloom_hit_from_bits(wm: Column, bit_cols: list[str]) -> Column:
    """All-k-bits-set membership predicate against the packed dense
    array, reading bit positions from ALREADY-PROJECTED columns (the
    md5 evaluates once in the projection; inlining it here would
    re-evaluate it per use — filter-side subexpression sharing is not
    guaranteed). The python-API shiftleft takes only literal
    distances, so the variable-distance bit mask is an element_at
    over a 62-entry power-of-two literal array (constant-folded)."""
    pow2 = F.array(*[F.lit(1 << j).cast("long")
                     for j in range(BLOOM_WORD_BITS)])
    hit = None
    for c in bit_cols:
        b = F.col(c)
        # dense-array pack: word slot j lives at 1-based position j+1
        word = F.element_at(
            wm, (F.floor(b / BLOOM_WORD_BITS) + 1).cast("int"))
        mask = F.element_at(pow2,
                            (F.pmod(b, F.lit(BLOOM_WORD_BITS)) + 1)
                            .cast("int"))
        this = word.bitwiseAND(mask) != 0
        hit = this if hit is None else (hit & this)
    return hit


def bloom_prune(words: DataFrame, df: DataFrame, col: str,
                hash_fn: str = "stable") -> DataFrame:
    """Row-preserving Bloom pre-filter: keep only rows of ``df`` whose
    ``col`` MIGHT be in the key set behind ``words`` (the
    :func:`bloom_build` word table). No false negatives — composing
    this before an exact join never changes the result, it only
    shrinks the rows that reach the shuffle: the semi-join-reduction
    pattern (a runtime filter made explicit and deterministic).

    The packed 2048-word map broadcasts as ONE row; the probe is pure
    map-side arithmetic per input row — at 100 TB this runs inside the
    scan stage and the join shuffle then carries only probable matches
    (dim-selectivity × fact rows + the ~1.5% FP tail) instead of
    every fact row."""
    # k broadcast EQUI-joins on word_idx, NOT a crossJoin with a
    # packed row: the where() on a cross join is pushed into the
    # BroadcastNestedLoopJoin condition, which evaluates INTERPRETED
    # per row (measured 3.4 s of pure filter at sf0.1); equi-joins
    # stay BroadcastHashJoin inside whole-stage codegen, and AQE
    # reuses the single word-table build across the k probes.
    bit_cols = [f"__bb{i}" for i in range(BLOOM_K)]
    p = df.select(
        "*", *[b.alias(n)
               for b, n in zip(_bloom_bit_cols(F.col(col), hash_fn),
                               bit_cols)])
    pow2 = F.array(*[F.lit(1 << j).cast("long")
                     for j in range(BLOOM_WORD_BITS)])
    hit = None
    for i, c in enumerate(bit_cols):
        w = words.select(F.col("word_idx").alias(f"__wi{i}"),
                         F.col("word").alias(f"__wd{i}"))
        p = p.join(F.broadcast(w),
                   F.floor(F.col(c) / BLOOM_WORD_BITS).cast("long")
                   == F.col(f"__wi{i}"), "left")
        mask = F.element_at(
            pow2, (F.pmod(F.col(c), F.lit(BLOOM_WORD_BITS)) + 1)
            .cast("int"))
        this = F.coalesce(F.col(f"__wd{i}"), F.lit(0)) \
                .bitwiseAND(mask) != 0
        hit = this if hit is None else (hit & this)
    drop = bit_cols + [n for i in range(BLOOM_K)
                       for n in (f"__wi{i}", f"__wd{i}")]
    return p.where(hit).drop(*drop)


def hll_registers_by(df: DataFrame, col: str,
                     group_col: str) -> DataFrame:
    """Per-group HLL register tables — the sketch-cube building block:
    one (group, idx, reg) table supports per-group estimates AND any
    rollup (register-wise max across groups == the sketch of the
    union, asserted by the hll_group_rollup query). At 100 TB this is
    how distinct-count cubes are maintained: group-level sketches are
    m=256 longs each, mergeable up every hierarchy level in O(m)."""
    h = stable_hash64(F.col(col).cast("string"))
    return (df.select(F.col(group_col),
                      (h % HLL_M).alias("idx"),
                      _rho(F.shiftrightunsigned(h, 8)).alias("rho"))
              .groupBy(group_col, "idx")
              .agg(F.max("rho").alias("reg")))


AMS_BUCKETS = 128


def ams_join_size(a: DataFrame, a_key: str, b: DataFrame, b_key: str,
                  buckets: int = AMS_BUCKETS) -> DataFrame:
    """Equi-join cardinality estimation by AMS sketch inner product
    (Alon-Matias-Szegedy 1996): each side folds to a ``buckets``-row
    signed-count sketch — S[h(k) mod B] += sign(k) per ROW — and
    ``Σ_b S_A[b]·S_B[b]`` is an unbiased estimate of
    ``|A ⋈ B| = Σ_k c_A(k)·c_B(k)``. This is how an optimizer prices
    a join without touching the other table's rows: the sketches are
    mergeable (bucket-wise sum over shards) and 1 KB regardless of
    table size.

    Both the estimate AND the exact join size are emitted (the exact
    side is the per-key count join) so every run shows its own error.
    Hash/sign come from the shared ``stable_hash64`` bit pattern —
    deterministic, mirrored in the oracle. One 1-row output.

    Scale: each sketch is one map-side-collapsed grid agg (B cells);
    the exact twin is the only key shuffle, and a production use drops
    it. ``buckets`` must be a power of two (bit ops only — division
    would round above 2^53).
    """
    if buckets & (buckets - 1):
        raise ValueError("buckets must be a power of two")
    shift = buckets.bit_length() - 1

    def sketch(df: DataFrame, key: str) -> DataFrame:
        h = stable_hash64(F.col(key).cast("string"))
        sign = F.lit(1) - 2 * F.shiftright(h, shift).bitwiseAND(F.lit(1))
        return (df.select(h.bitwiseAND(F.lit(buckets - 1)).alias("b"),
                          sign.cast("long").alias("s"))
                .groupBy("b").agg(F.sum("s").cast("long").alias("s")))

    sa = sketch(a, a_key).select(F.col("b"), F.col("s").alias("sa"))
    sb = sketch(b, b_key).select(F.col("b"), F.col("s").alias("sb"))
    est = (sa.join(sb, "b")
           .agg(F.sum(F.col("sa") * F.col("sb")).cast("long")
                .alias("est_join_size")))
    ca = a.groupBy(F.col(a_key).alias("k")) \
          .agg(F.count("*").cast("long").alias("ca"))
    cb = b.groupBy(F.col(b_key).alias("k")) \
          .agg(F.count("*").cast("long").alias("cb"))
    exact = (ca.join(cb, "k")
             .agg(F.sum(F.col("ca") * F.col("cb")).cast("long")
                  .alias("exact_join_size")))
    return (est.crossJoin(exact)
            .select(F.coalesce("est_join_size", F.lit(0))
                     .alias("est_join_size"),
                    F.coalesce("exact_join_size", F.lit(0))
                     .alias("exact_join_size"),
                    F.lit(buckets).cast("long").alias("n_buckets")))


def source_vocab_jaccard(df: DataFrame, k: int = 16,
                         text_col: str = "text",
                         source_col: str = "source") -> DataFrame:
    """MinHash Jaccard ESTIMATES between every pair of sources'
    vocabularies, side-by-side with the exact Jaccard — the
    estimator-quality audit for the signature machinery itself
    (k matching components / k ≈ J; both columns deterministic, so
    the driver hashes the estimator's error too).

    Signatures reuse the dedup family's xor-salt permutations: one
    md5 per distinct (source, token), k cheap xors, one k-column min
    agg per source — a |sources|-row sketch table; the 45-pair
    comparison is a trivial self-join. The exact side shuffles
    (token → source-pair) with per-token fan-out ≤ C(|sources|, 2).
    """
    from .dedup import xor_salts
    from .text import tokens
    salts = xor_salts(k)
    st = (df.select(F.col(source_col).alias("src"),
                    F.explode(tokens(F.col(text_col))).alias("tok"))
          .distinct())
    h = stable_hash64(F.col("tok"), seed=0)
    bound = st.select("src", h.alias("b"))
    sig = bound.groupBy("src").agg(
        *[F.min(F.col("b").bitwiseXOR(F.lit(salts[i])))
           .alias(f"h{i}") for i in range(k)])
    a = sig.select(F.col("src").alias("source_a"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(k)])
    b2 = sig.select(F.col("src").alias("source_b"),
                    *[F.col(f"h{i}").alias(f"b{i}") for i in range(k)])
    pairs = a.crossJoin(b2).where(F.col("source_a") < F.col("source_b"))
    n_match = None
    for i in range(k):
        m = (F.col(f"a{i}") == F.col(f"b{i}")).cast("long")
        n_match = m if n_match is None else n_match + m
    est = pairs.select("source_a", "source_b",
                       n_match.alias("n_match"))
    sizes = st.groupBy("src").agg(F.count("*").alias("n_tok"))
    ta = st.select(F.col("src").alias("source_a"), "tok")
    tb = st.select(F.col("src").alias("source_b"), "tok")
    inter = (ta.join(tb, "tok")
             .where(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count("*").alias("inter")))
    na = sizes.select(F.col("src").alias("source_a"),
                      F.col("n_tok").alias("n_a"))
    nb = sizes.select(F.col("src").alias("source_b"),
                      F.col("n_tok").alias("n_b"))
    j = (est.join(inter, ["source_a", "source_b"], "left")
         .join(na, "source_a").join(nb, "source_b")
         .select("source_a", "source_b",
                 F.coalesce("inter", F.lit(0)).cast("long")
                 .alias("inter"),
                 F.col("n_a").cast("long"), F.col("n_b").cast("long"),
                 F.col("n_match").cast("long")))
    return (j.select(
        "source_a", "source_b", "inter", "n_a", "n_b", "n_match",
        F.expr("(inter * 1000000) div (n_a + n_b - inter)")
         .cast("long").alias("exact_j_e6"),
        F.expr(f"(n_match * 1000000) div {k}").cast("long")
         .alias("est_j_e6"))
        .orderBy("source_a", "source_b"))


def sliding_hll_wau(df: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Sliding-window sketch maintenance proof for WAU: per observed
    day, the trailing-7-day HLL built by MERGING the seven daily
    sketches (register-wise max over the fan-out) must equal the HLL
    built DIRECTLY from the window's users, register for register —
    the property that lets a warehouse keep one m=256 sketch per day
    and answer any trailing window in O(7·m), never rescanning users.

    Output per observed day: exact WAU (ground truth), both register
    checksums, and the merged==direct flag (1 everywhere). All
    integers; the day fan-out is the same bounded ×7 explode as the
    exact DAU/WAU operator."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long")
    ud = (df.select(F.col(user_col).alias("u"), day.alias("day"))
          .distinct())
    by_day = hll_registers_by(ud, "u", "day")
    fan_reg = by_day.select(
        "idx", "reg",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6)))
         .alias("wday"))
    merged = (fan_reg.groupBy("wday", "idx")
              .agg(F.max("reg").alias("reg")))
    chk = F.sum(F.col("reg") * (F.col("idx") + 1)).cast("long")
    merged_chk = merged.groupBy("wday").agg(chk.alias("merged_chk"))
    fan_u = (ud.select(
        "u", F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6)))
        .alias("wday")).distinct())
    direct = hll_registers_by(fan_u, "u", "wday")
    direct_chk = direct.groupBy("wday").agg(chk.alias("direct_chk"))
    wau = fan_u.groupBy("wday").agg(
        F.count("*").cast("long").alias("exact_wau"))
    days = ud.select("day").distinct()
    return (days.join(wau, days.day == wau.wday)
            .join(merged_chk, "wday").join(direct_chk, "wday")
            .select(F.col("day"), "exact_wau", "merged_chk",
                    "direct_chk",
                    (F.col("merged_chk") == F.col("direct_chk"))
                    .cast("long").alias("merge_matches_direct"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------
#
# Keep the k smallest distinct hash values; the k-th smallest h_k
# estimates distinct cardinality as (k-1)·M/h_k (M = 2^60, our hash
# space).  Unlike HLL the whole state is k longs and every step —
# hash, distinct, k-smallest, the final division — is exact integer
# arithmetic, so Spark and the DuckDB oracle agree bit-for-bit with
# NO pinned-double anywhere.  Reference capability: approximate
# distinct counts at bounded memory (the Mongo-side count audit),
# re-expressed as a mergeable sketch.

_KMV_M = 1 << 60  # stable_hash64 draws uniformly from [0, 2^60)


def kmv_distinct(df: DataFrame, col: str, k: int = 64,
                 seed: int = 31) -> DataFrame:
    """KMV cardinality estimate next to the exact count (the audit
    shape).  Plan: hash projection → distinct (one shuffle on the
    hash) → TakeOrdered k (per-partition top-k, merged on the driver
    — k longs over the wire) + one exact distinct agg.  With fewer
    than k distinct values the sketch IS the exact set and the
    estimate equals the exact count."""
    h = stable_hash64(F.col(col).cast("string"), seed)
    hashes = df.select(h.alias("h")).distinct()
    smallest = hashes.orderBy("h").limit(k)
    dec = "decimal(38,0)"
    sk = (smallest.groupBy()
          .agg(F.count("*").alias("k_used"),
               F.max("h").alias("h_k")))
    exact = hashes.groupBy().agg(F.count("*").alias("n_exact"))
    j = sk.crossJoin(F.broadcast(exact))
    est = F.expr(f"(CAST(k_used - 1 AS DECIMAL(38,0)) * "
                 f"CAST({_KMV_M} AS DECIMAL(38,0))) div "
                 f"CAST(h_k AS DECIMAL(38,0))").cast("long")
    return j.select(
        "k_used", "h_k", "n_exact",
        F.when(F.col("k_used") < F.lit(k), F.col("n_exact"))
         .otherwise(est).cast("long").alias("est_distinct"))


def kmv_distinct_oracle(table: str, col: str, k: int = 64,
                        seed: int = 31) -> str:
    hexpr = stable_hash64_sql(f"{col}::VARCHAR", seed)
    return f"""
  WITH hashes AS (SELECT DISTINCT {hexpr} AS h FROM {table}),
  smallest AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
  sk AS (SELECT count(*)::BIGINT AS k_used, max(h)::BIGINT AS h_k
         FROM smallest),
  ex AS (SELECT count(*)::BIGINT AS n_exact FROM hashes)
  SELECT k_used, h_k, n_exact,
         (CASE WHEN k_used < {k} THEN n_exact
               ELSE ((k_used - 1)::HUGEINT * {_KMV_M}::HUGEINT)
                    // h_k::HUGEINT END)::BIGINT AS est_distinct
  FROM sk, ex
"""


def kmv_jaccard(a: DataFrame, col_a: str, b: DataFrame, col_b: str,
                k: int = 64, seed: int = 31) -> DataFrame:
    """KMV set-similarity: the k smallest hashes of the UNION are an
    unbiased sample of it; the fraction also present in both sides
    estimates Jaccard.  Membership flags come from two hash-key left
    semi joins against the k-row union sketch (broadcast — k longs),
    so nothing wider than the two distinct projections ever
    shuffles.  Output in basis points, exact integer division."""
    ha = a.select(stable_hash64(F.col(col_a).cast("string"), seed)
                  .alias("h")).distinct()
    hb = b.select(stable_hash64(F.col(col_b).cast("string"), seed)
                  .alias("h")).distinct()
    union_sketch = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    in_a = union_sketch.join(ha, "h", "left_semi")
    in_b = union_sketch.join(hb, "h", "left_semi")
    both = in_a.join(in_b, "h", "left_semi")
    cnt = union_sketch.groupBy().agg(F.count("*").alias("k_used"))
    m = both.groupBy().agg(F.count("*").alias("n_both"))
    j = cnt.crossJoin(F.broadcast(m))
    return j.select(
        "k_used", "n_both",
        F.expr("(CAST(n_both AS DECIMAL(38,0)) * 10000) div "
               "CAST(k_used AS DECIMAL(38,0))").cast("long")
         .alias("jaccard_bp"))


def kmv_jaccard_oracle(table_a: str, col_a: str,
                       table_b: str, col_b: str,
                       k: int = 64, seed: int = 31) -> str:
    hx_a = stable_hash64_sql(f"{col_a}::VARCHAR", seed)
    hx_b = stable_hash64_sql(f"{col_b}::VARCHAR", seed)
    return f"""
  WITH ha AS (SELECT DISTINCT {hx_a} AS h FROM {table_a}),
  hb AS (SELECT DISTINCT {hx_b} AS h FROM {table_b}),
  u AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
        ORDER BY h LIMIT {k}),
  cnt AS (SELECT count(*)::BIGINT AS k_used FROM u),
  m AS (SELECT count(*)::BIGINT AS n_both FROM u
        WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb))
  SELECT k_used, n_both,
         ((n_both::HUGEINT * 10000) // k_used::HUGEINT)::BIGINT
           AS jaccard_bp
  FROM cnt, m
"""
