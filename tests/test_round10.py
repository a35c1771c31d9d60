"""Round-10: rank-1 ALS, bias baseline, boilerplate strip, SAX
symbolization, multi-round BPE merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_hust_spark.operators import curation, recsys, text
from bigdata_project_hust_spark.plans.round10 import (
    _BPE_ROUNDS, q_als_rank1, q_bias_baseline, q_boilerplate_strip,
    q_bpe_merge_rounds, q_sax_daily)

SF = "/root/testdata/sf0.001"


def test_als_rank1_separates_popular_item(spark):
    # item 'hot' is rated high by everyone, 'cold' low by few: the
    # learned rank-1 item factor must rank hot above cold
    rows = [(u, "hot", 40) for u in range(8)] + \
           [(u, "cold", 2) for u in range(2)]
    r = spark.createDataFrame(rows, "user_id string, item_id string, r long")
    out = {x["item_id"]: x for x in recsys.als_rank1(r, lam=1).collect()}
    assert out["hot"]["v_e6"] > out["cold"]["v_e6"] > 0
    assert out["hot"]["n_raters"] == 8 and out["cold"]["n_raters"] == 2


def test_als_rank1_fixture_shape_and_determinism(spark):
    a = q_als_rank1(spark, SF).collect()
    b = q_als_rank1(spark, SF).collect()
    assert a == b
    assert len(a) == 20
    vs = [r["v_e6"] for r in a]
    assert vs == sorted(vs, reverse=True)


def test_bias_baseline_beats_global_mean_on_biased_data(spark):
    # strong item effects, no noise: bias model must crush the
    # constant-mu predictor
    rows = [(u, i, 10 * (i + 1)) for u in range(6) for i in range(4)]
    r = spark.createDataFrame(rows, "user_id long, item_id long, r long")
    card = recsys.bias_baseline(r, damp=1).collect()[0]
    assert card["n_ratings"] == 24
    assert card["mae_bias_e6"] < card["mae_global_e6"]


def test_bias_baseline_fixture_card(spark):
    card = q_bias_baseline(spark, SF).collect()[0]
    assert card["n_ratings"] > 0
    assert card["mu_e6"] > 0
    assert card["mae_global_e6"] > 0
    assert card["mae_bias_e6"] > 0


def test_boilerplate_strip_flags_shared_segment(spark):
    # 8-token header shared by two docs of source A; doc in source B
    # shares the text but is alone in its source -> not boilerplate
    header = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [("d1", header + " unique one", "A"),
            ("d2", header + " unique two", "A"),
            ("d3", header + " unique three", "B")]
    df = spark.createDataFrame(rows, "doc_id string, text string, "
                                     "source string")
    out = {r["source"]: r for r in curation.boilerplate_strip(df).collect()}
    assert out["A"]["boiler_segments"] == 1
    assert out["A"]["removed_instances"] == 2
    assert out["A"]["removed_chars"] == 2 * len(header)
    assert out["B"]["boiler_segments"] == 0
    assert out["B"]["removed_instances"] == 0


def test_boilerplate_fixture_invariants(spark):
    out = q_boilerplate_strip(spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        assert 0 <= r["removed_instances"] <= r["n_segments"]
        assert 0 <= r["removed_chars"] <= r["n_chars"]
        assert r["removed_frac_e6"] == (
            r["removed_instances"] * 1_000_000 // r["n_segments"])


def test_sax_symbols_well_formed(spark):
    out = q_sax_daily(spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        assert len(r["sax"]) == r["n_days"]
        assert set(r["sax"]) <= set("abcd")
        assert r["n_a"] + r["n_b"] + r["n_c"] + r["n_d"] == r["n_days"]
        # z-scored series: both sides of the mean are populated for
        # any non-constant series of >= 2 days
        if r["n_days"] >= 2 and len(set(r["sax"])) > 1:
            assert r["n_a"] + r["n_b"] >= 1 and r["n_c"] + r["n_d"] >= 1


def test_bpe_merges_apply_before_next_round(spark):
    # corpus of one repeated word: round 1 must merge a character
    # pair of 'banana'; later rounds must pick pairs over the MERGED
    # symbol alphabet, and winning counts never increase
    df = spark.createDataFrame([("d1", "banana banana banana")],
                               "doc_id string, text string")
    out = text.bpe_merge_rounds(df, rounds=2).collect()
    assert [r["round"] for r in out] == [1, 2]
    # 'a n' and 'n a' both appear 6 times corpus-wide; tie-break is
    # lexicographic -> 'a n' wins round 1 and becomes symbol 'an'
    assert out[0]["pair"] == "a n"
    assert out[0]["merged"] == "an"
    assert out[0]["pair_count"] == 6
    # after ' b a n a n a ' -> ' b an an a ': the three candidate
    # pairs ('an a', 'an an', 'b an') all count 3; lexicographic
    # tie-break takes 'an a' ('an a' is a prefix of 'an an')
    assert out[1]["pair"] == "an a"
    assert out[1]["merged"] == "ana"
    assert out[1]["pair_count"] == 3


def test_bpe_fixture_rounds_monotone(spark):
    out = q_bpe_merge_rounds(spark, SF).collect()
    assert [r["round"] for r in out] == list(range(1, _BPE_ROUNDS + 1))
    cnts = [r["pair_count"] for r in out]
    assert cnts == sorted(cnts, reverse=True)
    for r in out:
        assert " " in r["pair"] and " " not in r["merged"]
        assert r["merged"] == r["pair"].replace(" ", "")


def test_als_rank1_rejects_zero_sweeps(spark):
    import pytest
    r = spark.createDataFrame([(1, 1, 5)], "user_id long, item_id long, r long")
    with pytest.raises(ValueError, match="sweeps"):
        recsys.als_rank1(r, sweeps=0)
