"""Round-13: RAKE keyphrases and stratified ATE."""

from __future__ import annotations

from bigdata_project_hust_spark.plans.round13 import (
    _RAKE_STOPS, q_rake_keyphrases, q_stratified_ate)

SF = "/root/testdata/sf0.001"


def test_rake_finds_known_phrase(spark, tmp_path):
    # 'data pipeline' appears three times as a stopword-bounded run;
    # 'quality' is trapped between stopwords -> single-word, excluded
    docs = spark.createDataFrame(
        [("d1", "the data pipeline is a data pipeline of the quality"),
         ("d2", "a data pipeline in the wild")],
        "doc_id string, text string")
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = q_rake_keyphrases(spark, str(tmp_path)).collect()
    top = out[0]
    assert top["phrase"] == "data pipeline"
    assert top["support"] == 3
    assert all(r["phrase"] != "quality" for r in out)

    res = q_rake_keyphrases(spark, SF).collect()
    assert 1 <= len(res) <= 20
    for r in res:
        assert r["n_words"] >= 2
        assert r["support"] >= 1
        assert r["score_e6"] >= 2_000_000  # >= 2 words, each score >= 1e6
        toks = r["phrase"].split(" ")
        assert all(t not in _RAKE_STOPS for t in toks)
        assert len(toks) == r["n_words"]


def test_rake_scores_descending(spark):
    res = q_rake_keyphrases(spark, SF).collect()
    scores = [r["score_e6"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_stratified_ate_consistency(spark):
    out = q_stratified_ate(spark, SF).collect()
    assert len(out) >= 1
    for r in out:
        assert 0 <= r["band"] <= 7
        assert r["n_t"] > 0 and r["n_c"] > 0
        assert r["n_users"] >= 1
        assert r["ate_c_e6"] == r["mean_t_c_e6"] - r["mean_c_c_e6"]
    bands = [r["band"] for r in out]
    assert bands == sorted(bands)


def test_triplet_violation_audit_bounds(spark):
    from bigdata_project_hust_spark.plans.round14 import (
        q_triplet_violations)
    out = q_triplet_violations(spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        assert 0 <= r["n_violations"] <= r["n_anchors"]
        assert r["viol_frac_e6"] == \
            r["n_violations"] * 1_000_000 // r["n_anchors"]
        # margin and violation rate must agree in direction: an
        # all-violating label cannot have a positive mean margin
        if r["viol_frac_e6"] == 1_000_000:
            assert r["mean_margin_e6"] < 0
        if r["viol_frac_e6"] == 0:
            assert r["mean_margin_e6"] >= 0
