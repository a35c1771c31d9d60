"""Round-11 extension queries: the learned-tokenizer apply loop and an
embedding class-separability audit (plus, outside the driver surface,
io.write_bucketed_table / bucketed_join with their plan-gate tests in
``tests/test_round11.py``).

* ``bpe_fertility_by_source`` — APPLY the 3 learned BPE merges
  (round10's bpe_merge_rounds) to the corpus and report per-source
  subword fertility (pieces per token) — the train→apply loop of a
  tokenizer pipeline, vocab-factored so corpus cost re-enters only as
  a (source, word)-stats join.
* ``label_silhouette`` — per-label cosine cohesion vs the nearest
  other label centroid (silhouette on the similarity scale): the audit
  run before trusting ``label`` for stratified splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity, text
from .spec import QuerySpec, _t

QUERIES_ROUND11: dict[str, QuerySpec] = {}

_BPE_ROUNDS = 3


def q_bpe_fertility(spark, sf_dir):
    """Per-source fertility of the 3-merge learned BPE tokenizer:
    n_tokens, n_pieces, fertility_e6 = pieces·1e6/tokens (floored).
    The vocab frame (distinct word → piece count) comes from
    text.bpe_learned_segmentation; the corpus re-enters as a
    (source, word) count join against it — both sides shuffle on the
    word key once."""
    d = _t(spark, sf_dir, "documents")
    vocab = text.bpe_learned_segmentation(d, rounds=_BPE_ROUNDS) \
        .select("w", "n_pieces")
    wsrc = (d.select("source", F.explode(text.tokens("text")).alias("w"))
            .groupBy("source", "w")
            .agg(F.count("*").cast("long").alias("cs")))
    return (wsrc.join(vocab, "w")
            .groupBy("source")
            .agg(F.sum("cs").cast("long").alias("n_tokens"),
                 F.sum(F.col("cs") * F.col("n_pieces")).cast("long")
                 .alias("n_pieces"),
                 F.floor(F.sum(F.col("cs") * F.col("n_pieces"))
                         .cast("double") * F.lit(1000000.0)
                         / F.sum("cs").cast("double"))
                 .cast("long").alias("fertility_e6"))
            .orderBy("source"))


def _oracle_bpe_fertility() -> str:
    pieces = [r"""
  WITH wrd AS (
    SELECT w, count(*)::BIGINT AS c FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS w
      FROM documents) GROUP BY w
  ),
  s0 AS (
    SELECT w, c, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seq
    FROM wrd
  )"""]
    for r in range(1, _BPE_ROUNDS + 1):
        prev = f"s{r - 1}"
        pieces.append(f"""
  p{r} AS MATERIALIZED (
    SELECT pair, sum(c)::BIGINT AS cnt FROM (
      SELECT c, t[i] || ' ' || t[i + 1] AS pair FROM (
        SELECT c, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM (SELECT c, string_split(trim(seq), ' ') AS t FROM {prev})
      )
    ) GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1
  ),
  s{r} AS (
    SELECT w, c,
           replace(replace(seq,
                           ' ' || p{r}.pair || ' ',
                           ' ' || replace(p{r}.pair, ' ', '') || ' '),
                   ' ' || p{r}.pair || ' ',
                   ' ' || replace(p{r}.pair, ' ', '') || ' ') AS seq
    FROM {prev}, p{r}
  )""")
    return (",".join(pieces) + f""",
  vocab AS (
    SELECT w, len(string_split(trim(seq), ' '))::BIGINT AS np
    FROM s{_BPE_ROUNDS}
  ),
  wsrc AS (
    SELECT source, w, count(*)::BIGINT AS cs FROM (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS w
      FROM documents) GROUP BY source, w
  )
  SELECT source, sum(cs)::BIGINT AS n_tokens,
         sum(cs * np)::BIGINT AS n_pieces,
         floor(sum(cs * np)::DOUBLE * 1e6
               / sum(cs)::DOUBLE)::BIGINT AS fertility_e6
  FROM wsrc JOIN vocab USING (w)
  GROUP BY source ORDER BY source
""")


def q_label_silhouette(spark, sf_dir):
    """Per-label cohesion audit (similarity.label_silhouette):
    mean own-centroid cosine, mean best-other-centroid cosine, mean
    margin, all e6."""
    return (similarity.label_silhouette(_t(spark, sf_dir, "embeddings"))
            .orderBy("label"))


_SIL_DOT = ("list_sum(list_transform(generate_series(1, 64), "
            "i -> ({a}[i])::DOUBLE * ({b}[i])::DOUBLE))")


def _oracle_silhouette() -> str:
    dot_ec = _SIL_DOT.format(a="e.embedding", b="c.centroid")
    nx = _SIL_DOT.format(a="e.embedding", b="e.embedding")
    nc = _SIL_DOT.format(a="c.centroid", b="c.centroid")
    return f"""
  WITH comp AS (
    SELECT label, gs.i AS dim,
           sum(floor((embedding[gs.i])::DOUBLE * 1e6))::BIGINT AS s,
           count(*)::BIGINT AS n
    FROM embeddings CROSS JOIN generate_series(1, 64) gs(i)
    GROUP BY label, gs.i
  ),
  cc AS (
    SELECT label, dim, n,
           floor(s::DOUBLE / n::DOUBLE)::BIGINT AS c
    FROM comp
  ),
  cents AS (
    SELECT label AS clabel, list(c ORDER BY dim) AS centroid
    FROM cc GROUP BY label
  ),
  probe AS (
    SELECT e.vec_id, e.label, c.clabel,
           floor({dot_ec} / (sqrt({nx}) * sqrt({nc})) * 1e6)::BIGINT
             AS sim_e6
    FROM embeddings e CROSS JOIN cents c
  ),
  per_vec AS (
    SELECT vec_id, label,
           max(CASE WHEN label = clabel THEN sim_e6 END) AS own,
           max(CASE WHEN label <> clabel THEN sim_e6 END) AS other
    FROM probe GROUP BY vec_id, label
  )
  SELECT label, count(*)::BIGINT AS n_vecs,
         floor(sum(own)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mean_own_e6,
         floor(sum(other)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mean_other_e6,
         floor(sum(own - other)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mean_margin_e6
  FROM per_vec GROUP BY label ORDER BY label
"""


QUERIES_ROUND11.update({
    "bpe_fertility_by_source": QuerySpec(
        q_bpe_fertility, _oracle_bpe_fertility(),
        doc="learned 3-merge BPE tokenizer applied: per-source subword "
            "fertility (vocab-factored join)"),
    "label_silhouette": QuerySpec(
        q_label_silhouette, _oracle_silhouette(),
        doc="per-label cosine cohesion vs nearest other centroid "
            "(silhouette margin at e6)"),
})
