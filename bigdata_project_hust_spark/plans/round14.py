"""Round-14 extension query: hard-negative mining audit over the
embedding table (similarity.triplet_violation_audit) — the
metric-learning readiness gate that prices label-conditioned
retrieval."""

from __future__ import annotations

from ..operators import similarity
from .spec import QuerySpec, _t

QUERIES_ROUND14: dict[str, QuerySpec] = {}

_TRIP_MOD = 5


def q_triplet_violations(spark, sf_dir):
    """Per-label triplet-violation rate on a 1/5 anchor hash-sample
    (see similarity.triplet_violation_audit)."""
    return similarity.triplet_violation_audit(
        _t(spark, sf_dir, "embeddings"), sample_mod=_TRIP_MOD) \
        .orderBy("label")


_TV_DOT = ("list_sum(list_transform(generate_series(1, 64), "
           "i -> ({a}[i])::DOUBLE * ({b}[i])::DOUBLE))")


def _oracle_triplets() -> str:
    dot = _TV_DOT.format(a="b.embedding", b="q.embedding")
    nb = _TV_DOT.format(a="b.embedding", b="b.embedding")
    nq = _TV_DOT.format(a="q.embedding", b="q.embedding")
    return f"""
  WITH pairs AS (
    SELECT q.vec_id AS qid, q.label AS qlabel,
           (q.label = b.label) AS same,
           floor({dot} / (sqrt({nq}) * sqrt({nb})) * 1e6)::BIGINT
             AS sim_e6
    FROM embeddings b,
         (SELECT * FROM embeddings WHERE vec_id % {_TRIP_MOD} = 0) q
    WHERE q.vec_id <> b.vec_id
  ),
  per AS (
    SELECT qid, qlabel,
           max(CASE WHEN same THEN sim_e6 END) AS pos,
           max(CASE WHEN NOT same THEN sim_e6 END) AS neg
    FROM pairs GROUP BY qid, qlabel
  ),
  kept AS (SELECT * FROM per WHERE pos IS NOT NULL AND neg IS NOT NULL)
  SELECT qlabel AS label, count(*)::BIGINT AS n_anchors,
         sum((neg >= pos)::BIGINT)::BIGINT AS n_violations,
         floor(sum((neg >= pos)::BIGINT)::DOUBLE * 1e6
               / count(*)::DOUBLE)::BIGINT AS viol_frac_e6,
         floor(sum(pos - neg)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mean_margin_e6
  FROM kept GROUP BY qlabel ORDER BY label
"""


QUERIES_ROUND14.update({
    "triplet_violation_audit": QuerySpec(
        q_triplet_violations, _oracle_triplets(),
        doc="hard-negative mining audit: per-label triplet violation "
            "rate on a 1/5 anchor sample (broadcast anchors, corpus "
            "streams once)"),
})
