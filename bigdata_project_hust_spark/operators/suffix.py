"""Distributed suffix ranking by prefix doubling, and the repeated-
substring analyses built on it — the exact machinery behind
suffix-array substring dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better": their exact-substring pass is a
suffix array over the corpus; ``span_duplicates`` approximates it
with positional token shingles, this module computes the real
character-level suffix order).

Suffixes never cross document boundaries (the dedup-relevant
semantics: a repeat that straddles two unrelated documents is an
artifact of concatenation, not a duplicate), so every rank compares
``substring(text, p)`` strings.

Scale design: prefix doubling is O(log L) rounds (L = max document
length, NOT corpus size — each round doubles the compared depth), and
each round is three narrow-row shuffles of the position table (a join
to fetch the rank k positions ahead, a distinct over (rank, next)
pairs, and the dense re-rank via :func:`~.dedup.dense_ids`, itself a
single range exchange since r10). No task ever sorts the corpus; no
suffix string longer than the report window is ever materialized.
Per-round frames are materialized — multiplicative lineage, the
k_core lesson — and the loop exits early once ranks are all-distinct
(natural text separates in ~8-32 chars, so the typical round count is
4-6, not log2(max_len))."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..checkpoint import materialize
from .dedup import dense_ids

REPEAT_WINDOW = 64
#: depth of the direct initial ranking: one dense_ids range exchange
#: over length-INIT_DEPTH prefixes (two longs' worth of key bytes)
#: replaces the first log2(INIT_DEPTH) doubling rounds outright —
#: natural text mostly separates within 16 chars, so the typical
#: doubling-loop count drops from ~8 to 0-2. A pure constant-factor
#: knob: any value gives the same ranks.
INIT_DEPTH = 16


def suffix_ranks(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Dense rank of EVERY suffix of every document under full
    lexicographic order — ties are exactly the identical-suffix
    groups. Returns ``(doc, p, r)`` with ``p`` 1-indexed and ``r``
    dense 1..#distinct-suffixes; the frame is materialized.

    Prefix doubling: depth-``INIT_DEPTH`` ranks are the dense ids of
    the length-INIT_DEPTH prefixes (truncated prefixes of suffixes
    near the document end sort shorter-first, exactly the suffix
    order restricted to that depth); at each round the
    (rank, rank-k-positions-ahead) pair — with 0 as the "suffix
    ended" sentinel, which sorts before every real rank exactly as
    the shorter string sorts first — is densely re-ranked, doubling
    the compared depth. A suffix whose neighbor pair is unique is
    fully ordered; once ALL ranks are distinct (max rank == row
    count — dense makes this one aggregate) the order equals the
    full suffix order and the loop stops."""
    pos = (df
           .select(F.col(id_col).alias("doc"),
                   F.col(text_col).alias("__t"))
           # empty docs have no suffixes — and sequence(1, 0) would
           # otherwise emit a DESCENDING [1, 0] (Spark's sequence
           # direction follows its arguments), i.e. two phantom rows
           .where(F.length("__t") > 0)
           .select("doc", "__t",
                   F.explode(F.sequence(F.lit(1), F.length("__t")))
                    .alias("p"))
           .select("doc", "p",
                   F.expr(f"substring(__t, p, {INIT_DEPTH})")
                    .alias("__k")))
    init = dense_ids(pos.select("__k").distinct(), "__k")
    cur = materialize(
        pos.join(init, "__k")
           .select("doc", "p", F.col("__sid").cast("long").alias("r")),
        f"suffix_depth{INIT_DEPTH}", prefer="local")
    head = cur.agg(F.count("*"), F.max("r")).collect()[0]
    n_total = head[0]
    if head[1] == n_total:          # all prefixes unique — done
        return cur
    max_len = df.agg(F.max(F.length(text_col))).collect()[0][0] or 0
    k, n_classes = INIT_DEPTH, head[1]
    by_doc = Window.partitionBy("doc").orderBy("p")
    while k < max_len:
        # the rank k positions ahead is lead(r, k) within the document
        # — one window instead of a two-sided self-join; 0 = "suffix
        # ended" sentinel (sorts before every real rank, as the
        # shorter string sorts first)
        j = cur.withColumn(
            "rn", F.coalesce(F.lead("r", k).over(by_doc), F.lit(0)))
        ids = dense_ids(j.select("r", "rn").distinct(), ["r", "rn"])
        cur = materialize(
            j.join(ids, ["r", "rn"])
             .select("doc", "p", F.col("__sid").cast("long").alias("r")),
            f"suffix_depth{2 * k}", prefer="local")
        k *= 2
        prev, n_classes = n_classes, cur.agg(F.max("r")).collect()[0][0]
        if n_classes == n_total:
            break                   # all distinct — fully ordered
        if n_classes == prev:
            # fixpoint: a round that refines NOTHING can never refine
            # again (a,b tied at 2k ⟹ a+k,b+k tied at k ⟹ by
            # induction tied at every depth), so remaining ties are
            # genuinely identical suffixes
            break
    return cur


def suffix_rank_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document aggregate of the full suffix-rank table
    (count / min / max / sum of ranks) — a corpus-sized value-hash of
    the entire rank assignment in |docs| rows."""
    ranks = suffix_ranks(df, text_col, id_col)
    return (ranks.groupBy(F.col("doc").alias(id_col))
            .agg(F.count("*").cast("long").alias("n_sfx"),
                 F.min("r").cast("long").alias("min_rank"),
                 F.max("r").cast("long").alias("max_rank"),
                 F.sum("r").cast("long").alias("sum_rank"))
            .orderBy(id_col))


def longest_repeats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 10,
                    min_len: int = 4) -> DataFrame:
    """Top-``k`` longest repeated substrings in the corpus (reported
    at ``REPEAT_WINDOW``-char granularity): any substring occurring
    ≥ 2 times is the common prefix of ≥ 2 suffixes, and the maximal
    ones appear either as an identical-suffix rank group (repeat =
    the suffix itself) or as the LCP of two ADJACENT distinct ranks
    (the suffix-array adjacency property: the max LCP over all pairs
    is attained by an adjacent pair). Output: ``(repeat_len,
    repeat_str)``, longest first, ties by string; deterministic
    because strings are distinct after the dedup projection.

    The LCP of two bounded strings: prefix-equality at length L is
    monotone in L (equal length-(L+1) prefixes are equal strings, so
    their length-L prefixes are too), hence LCP = the SUM of the 64
    INDEPENDENT ``substring(a,1,L) = substring(b,1,L)`` indicators —
    a flat, fully codegen'd expression (a sequential binary walk
    nests each step's column into the next and the collapsed
    projection grows exponentially past Janino's 64 KB method limit —
    measured, not theoretical), no UDF, no per-char explode."""
    ranks = suffix_ranks(df, text_col, id_col)
    docs = df.select(F.col(id_col).alias("doc"),
                     F.col(text_col).alias("__t"))
    reps = (ranks.groupBy("r")
            .agg(F.min(F.struct("doc", "p")).alias("m"),
                 F.count("*").cast("long").alias("cnt"))
            .select("r", F.col("m.doc").alias("doc"),
                    F.col("m.p").alias("p"), "cnt"))
    reps = (reps.join(docs, "doc")
            .select("r", "cnt",
                    F.expr(f"substring(__t, p, {REPEAT_WINDOW})")
                     .alias("s"),
                    (F.length("__t") - F.col("p") + 1).alias("slen")))
    # identical-suffix groups: the repeat is the (bounded) suffix
    ties = (reps.where(F.col("cnt") >= 2)
            .select(F.least(F.col("slen"), F.lit(REPEAT_WINDOW))
                     .cast("int").alias("lcp"), F.col("s").alias("sa")))
    # adjacent distinct ranks r, r+1: binary-walk LCP of the two
    # bounded strings
    right = reps.select((F.col("r") - 1).alias("r"),
                        F.col("s").alias("sb"),
                        F.col("slen").alias("lb"))
    pairs = (reps.join(right, "r")
             .select(F.col("s").alias("sa"), "sb",
                     F.col("slen").alias("la"), "lb"))
    lcp = sum((F.expr(f"substring(sa, 1, {step})")
               == F.expr(f"substring(sb, 1, {step})")).cast("int")
              for step in range(1, REPEAT_WINDOW + 1))
    adj = (pairs.withColumn("lcp", lcp)
           .select(F.least("lcp", "la", "lb", F.lit(REPEAT_WINDOW))
                   .cast("int").alias("lcp"), "sa"))
    cand = ties.unionAll(adj).where(F.col("lcp") >= min_len)
    return (cand.select(F.expr("substring(sa, 1, lcp)")
                        .alias("repeat_str"))
            .distinct()
            .select(F.length("repeat_str").cast("long")
                     .alias("repeat_len"), "repeat_str")
            .orderBy(F.col("repeat_len").desc(), F.col("repeat_str"))
            .limit(k))
