"""Suffix-rank family (operators/suffix.py): distributed prefix
doubling vs an independent Python model, plus the repeated-substring
report. The registry twins (suffix_rank_stats / longest_repeat_top10)
are additionally DuckDB-oracled by test_oracle_parity and the driver."""

from __future__ import annotations

from collections import Counter

from bigdata_project_hust_spark.operators import suffix


def _model_ranks(texts):
    """Dense rank of every suffix by sorted full-suffix strings."""
    sufs = {(i, p + 1, t[p:])
            for i, t in enumerate(texts) for p in range(len(t))}
    ranks, r, prev = {}, 0, None
    for i, p, s in sorted(sufs, key=lambda x: x[2]):
        if s != prev:
            r += 1
            prev = s
        ranks[(i, p)] = r
    return ranks


def _model_repeats(texts, k=10, min_len=4, window=64):
    """Adjacent-suffix LCPs + identical-suffix groups, bounded."""
    allsufs = sorted(s for _, _, s in
                     {(i, p + 1, t[p:]) for i, t in enumerate(texts)
                      for p in range(len(t))})
    cand = set()
    for a, b in zip(allsufs, allsufs[1:]):
        ab, bb = a[:window], b[:window]
        l = 0
        while l < min(len(ab), len(bb)) and ab[l] == bb[l]:
            l += 1
        if l >= min_len:
            cand.add(ab[:l])
    for s, c in Counter(allsufs).items():
        if c >= 2 and len(s[:window]) >= min_len:
            cand.add(s[:window])
    return [(len(s), s)
            for s in sorted(cand, key=lambda s: (-len(s), s))[:k]]


TEXTS = ["banana", "bandana", "abracadabra", "aaaa", "z",
         "the quick brown fox the quick brown dog",
         "x" * 200,                 # run longer than the report window
         "same doc twice", "same doc twice",   # identical docs: the
         # tied-forever suffixes that force the fixpoint exit
         "", "ab"]                  # empty doc: zero suffixes


def _df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_suffix_ranks_match_model(spark):
    got = {(r["doc"], r["p"]): r["r"]
           for r in suffix.suffix_ranks(_df(spark, TEXTS)).collect()}
    assert got == _model_ranks(TEXTS)


def test_suffix_rank_stats_shape_and_sums(spark):
    rows = suffix.suffix_rank_stats(_df(spark, TEXTS)).collect()
    model = _model_ranks(TEXTS)
    assert [r["doc_id"] for r in rows] == sorted(
        {i for i, _ in model} )
    by_doc = {}
    for (i, _), rk in model.items():
        by_doc.setdefault(i, []).append(rk)
    for r in rows:
        rks = by_doc[r["doc_id"]]
        assert (r["n_sfx"], r["min_rank"], r["max_rank"], r["sum_rank"]) \
            == (len(rks), min(rks), max(rks), sum(rks))
    # the empty doc contributes no row
    assert all(r["doc_id"] != 9 for r in rows)


def test_longest_repeats_match_model(spark):
    got = [(r["repeat_len"], r["repeat_str"])
           for r in suffix.longest_repeats(_df(spark, TEXTS)).collect()]
    assert got == _model_repeats(TEXTS)
    # the window cap is visible: the x-run reports at exactly 64
    assert got[0] == (64, "x" * 64)


def test_suffix_ranks_randomised_against_model(spark):
    """Deterministic pseudo-random corpora (tight alphabet → deep
    shared prefixes → several doubling rounds + persistent ties)."""
    import random
    rng = random.Random(0x5F)
    for trial in range(3):
        texts = ["".join(rng.choice("ab ") for _ in range(rng.randint(1, 60)))
                 for _ in range(12)]
        got = {(r["doc"], r["p"]): r["r"]
               for r in suffix.suffix_ranks(_df(spark, texts)).collect()}
        assert got == _model_ranks(texts), texts
