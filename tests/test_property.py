"""Property-based tests (SURVEY §5.2): the F2 nested rewrite against an
independent reference walker, and merge-aggregate ≡ recompute."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F, types as T

from bigdata_project_hust_spark.functions.scalar import rewrite_values_nested
from bigdata_project_hust_spark.operators.aggregations import merge_aggregate

# --- F2: value-only rewrite ------------------------------------------------

WORDS = st.sampled_from(
    ["twitter", "Twitter", "xtwitterx", "plain", "TwitterTwitter", "", "tw"])


def ref_rewrite(s: str) -> str:
    # independent model of the reference semantics (consumer1.py:61-69):
    # replace substrings in VALUES only; chained lowercase-then-capital
    return s.replace("twitter", "x").replace("Twitter", "X")


SCHEMA = T.StructType([
    T.StructField("s", T.StringType()),
    T.StructField("arr", T.ArrayType(T.StringType())),
    T.StructField("m", T.MapType(T.StringType(), T.StringType())),
])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=WORDS, arr=st.lists(WORDS, max_size=4),
       m=st.dictionaries(WORDS.filter(lambda w: w != ""), WORDS, max_size=3))
def test_rewrite_matches_reference_model(spark, s, arr, m):
    df = spark.createDataFrame([Row(s=s, arr=arr, m=m)], SCHEMA)
    out = df.select(*[
        rewrite_values_nested(F.col(f.name), f.dataType).alias(f.name)
        for f in SCHEMA.fields]).collect()[0]
    assert out.s == ref_rewrite(s)
    assert list(out.arr or []) == [ref_rewrite(x) for x in arr]
    # map KEYS untouched, values rewritten
    assert dict(out.m or {}) == {k: ref_rewrite(v) for k, v in m.items()}


# --- A2: incremental merge == recompute ------------------------------------

ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.one_of(st.none(),
                        st.floats(min_value=-100, max_value=100,
                                  allow_nan=False))),
    min_size=1, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, split=st.integers(min_value=0, max_value=12))
def test_merge_aggregate_is_recompute(spark, rows, split):
    split = min(split, len(rows))
    schema = "k string, v double"

    def agg_of(d):
        return d.groupBy("k").agg(
            F.count("*").alias("cnt"),
            F.sum(F.coalesce("v", F.lit(0.0))).alias("sv"),
            F.max(F.coalesce("v", F.lit(0.0))).alias("mv"))

    d0 = spark.createDataFrame(rows[:split] or [("_", 0.0)], schema)
    d1 = spark.createDataFrame(rows[split:] or [("_", 0.0)], schema)
    full = spark.createDataFrame(
        (rows[:split] or [("_", 0.0)]) + (rows[split:] or [("_", 0.0)]),
        schema)
    merged = {r.k: r for r in merge_aggregate(
        agg_of(d0), agg_of(d1), "k", ["sv"], ["mv"], "cnt").collect()}
    want = {r.k: r for r in agg_of(full).collect()}
    assert set(merged) == set(want)
    for k in want:
        assert merged[k].cnt == want[k].cnt
        assert abs(merged[k].sv - want[k].sv) < 1e-9
        assert merged[k].mv == want[k].mv


@given(st.lists(
    st.text(alphabet=" \t\nabcxyz0", min_size=0, max_size=12),
    min_size=0, max_size=6))
@settings(max_examples=25, deadline=None)
def test_tokens_matches_python_split(spark, parts):
    """tokens() ≡ str.lower().split(): whitespace runs collapse and
    empty tokens never appear (the phantom-""-token fix)."""
    from bigdata_project_hust_spark.operators.text import tokens
    s = " ".join(parts)
    df = spark.createDataFrame([(s,)], "text string")
    got = df.select(tokens("text").alias("t")).collect()[0].t
    assert got == s.lower().split()


@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 5),
                          st.integers(0, 100)),
                min_size=1, max_size=40))
@settings(max_examples=20, deadline=None)
def test_keep_last_window_equals_maxby_agg(spark, rows):
    """The two J3 physical strategies (row_number window vs max_by
    aggregation) are result-identical on any input, duplicates and
    order-ties included."""
    from bigdata_project_hust_spark.operators.joins import (
        keep_last, keep_last_agg)
    df = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts, _) in enumerate(rows)],
        "event_id long, k long, ts long")
    a = sorted(map(tuple, keep_last(df, ["k"], "ts", "event_id").collect()))
    b = sorted(map(tuple,
                   keep_last_agg(df, ["k"], "ts", "event_id").collect()))
    assert a == b


@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=25))
@settings(max_examples=15, deadline=None)
@pytest.mark.slow_tier
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation ≡ an independent union-find model on any
    random graph (self-loops and parallel edges included): every node
    labeled with the minimum id of its component."""
    from bigdata_project_hust_spark.operators.dedup import (
        connected_components)
    # independent reference: classic union-find
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.component
           for r in connected_components(df).collect()}
    assert got == want


@given(st.lists(st.text(
    alphabet="ab .@-0123456789xyz\n", min_size=0, max_size=40),
    min_size=1, max_size=4))
@settings(max_examples=15, deadline=None)
def test_pii_scrub_idempotent_and_leak_free(spark, texts):
    """Scrubbing is idempotent (placeholders never re-match any PII
    pattern) and the scrubbed text never still matches a PII pattern —
    for arbitrary digit/@/dash-laden input."""
    from bigdata_project_hust_spark.operators.text import pii_scrub
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = pii_scrub(df)
    twice = pii_scrub(
        once.select(F.col("doc_id"), F.col("scrubbed").alias("text")))
    a = {r.doc_id: r.scrubbed for r in once.collect()}
    b = {r.doc_id: r for r in twice.collect()}
    for i in a:
        assert b[i].scrubbed == a[i]                     # idempotent
        assert (b[i].n_email, b[i].n_ssn, b[i].n_ipv4,
                b[i].n_phone) == (0, 0, 0, 0)            # leak-free


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 9)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sequence_pack_invariants(spark, rows):
    """For arbitrary sparse ids and token counts (incl. zeros): offsets
    are the exact prefix sums in id order and every pack span matches
    the arithmetic model."""
    from bigdata_project_hust_spark.operators.curation import sequence_pack
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r.doc_id: r for r in
           sequence_pack(df, seq_len=7, bucket=16).collect()}
    run = 0
    for i, n in sorted(rows):
        r = out[i]
        assert r.offset == run
        assert r.pack_id == run // 7
        want = ((run + n - 1) // 7 - run // 7 + 1) if n > 0 else 1
        assert r.n_packs_spanned == want
        run += n


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60,
                unique=True))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_shuffle_permutation_property(spark, ids):
    """Any unique id set (including negatives) maps to exactly the
    positions 0..n-1 with a deterministic order."""
    from bigdata_project_hust_spark.operators.curation import corpus_shuffle
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.shuffle_pos for r in corpus_shuffle(df).collect()}
    assert sorted(got.values()) == list(range(len(ids)))
    assert set(got) == set(ids)


@given(st.lists(st.lists(st.sampled_from("abcd"), min_size=0, max_size=9)
                .map(" ".join), min_size=1, max_size=12))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_model_parity(spark, texts):
    """line_dedup ≡ a direct Python model (first-occurrence keep over
    (doc_id, line_no) order) on arbitrary tiny corpora with heavy
    collisions."""
    from bigdata_project_hust_spark.operators.curation import line_dedup
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
           for r in line_dedup(df, line_tokens=2).collect()}
    seen, want = set(), {}
    for i, t in rows:
        toks = t.split()
        if not toks:
            continue
        lines = [" ".join(toks[s:s + 2]) for s in range(0, len(toks), 2)]
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        want[i] = (len(lines), len(lines) - len(kept), " ".join(kept))
    assert got == want


@given(st.lists(st.text(alphabet="abct ", min_size=0, max_size=24),
                min_size=0, max_size=6))
@settings(max_examples=20, deadline=None)
def test_subword_fold_matches_python_reference(spark, texts):
    """The packed-BIGINT greedy fold must equal a straightforward
    Python greedy tokenizer on arbitrary text (any chars, any
    whitespace shape)."""
    from bigdata_project_hust_spark.operators.text import (
        SUBWORD_V2, SUBWORD_V3, subword_piece_counts)

    def ref(text):
        words = [w for w in text.lower().split() if w]
        total = 0
        for w in words:
            p = 0
            while p < len(w):
                if w[p:p + 3] in SUBWORD_V3:
                    p += 3
                elif w[p:p + 2] in SUBWORD_V2:
                    p += 2
                else:
                    p += 1
                total += 1
        return len(words), total

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] or [(0, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in subword_piece_counts(df).collect()}
    for i, t in enumerate(texts or [""]):
        assert got[i] == ref(t), (t, got[i], ref(t))


@given(st.lists(st.text(alphabet="ab", min_size=0, max_size=6),
                min_size=2, max_size=10, unique=True))
@settings(max_examples=15, deadline=None)
def test_fuzzy_ed1_matches_bruteforce(spark, strings):
    """Deletion-neighborhood blocking finds EXACTLY the ed<=1 pairs a
    brute-force Levenshtein scan finds, on arbitrary short strings
    (including empty strings and duplicates-by-value)."""
    from bigdata_project_hust_spark.operators.dedup import fuzzy_join_ed1

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(strings)),
                               "id long, s string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_join_ed1(df, "s", "id").collect()}
    want = {(i, j): lev(a, b)
            for i, a in enumerate(strings)
            for j, b in enumerate(strings)
            if i < j and lev(a, b) <= 1}
    assert got == want
