"""Round-2 training-data-pipeline extension queries.

Curation capabilities beyond the round-1 set: Gopher-style repetition
signals, benchmark-decontamination overlap, and DSIR-style importance
weighting.  Same cross-engine exactness rules as ``queries.py``
(floor-scaled e6 ratios, NULL mirrored on both engines, deterministic
tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import repetition_signals
from .spec import QuerySpec, _t


def q_text_repetition_signals(spark, sf_dir):
    """Gopher repetition filters as a ZERO-SHUFFLE projection (see
    operators/text.repetition_signals): top-unigram / top-bigram /
    duplicate-trigram fractions per document."""
    return repetition_signals(_t(spark, sf_dir, "documents"))


# The oracle computes max-multiplicity O(n²)-per-doc over the distinct
# grams (fine at oracle scale); the Spark side is the O(n log n)
# sorted-run fold — different algorithms, identical semantics.
ORACLE_REPETITION = r"""
  WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  base AS (
    SELECT doc_id, w, len(w) AS n,
      CASE WHEN len(w) >= 2 THEN
        list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i + 1])
      ELSE []::VARCHAR[] END AS bg,
      CASE WHEN len(w) >= 3 THEN
        list_transform(generate_series(1, len(w) - 2),
                       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
      ELSE []::VARCHAR[] END AS tg
    FROM words
  )
  SELECT doc_id, n::BIGINT AS n_tokens,
    CASE WHEN n > 0 THEN
      floor(list_max(list_transform(list_distinct(w),
              x -> len(list_filter(w, y -> y = x)))) * 1e6 / n)::BIGINT
    END AS top_unigram_e6,
    CASE WHEN len(bg) > 0 THEN
      floor(list_max(list_transform(list_distinct(bg),
              x -> len(list_filter(bg, y -> y = x)))) * 1e6
            / len(bg))::BIGINT
    END AS top_bigram_e6,
    CASE WHEN len(tg) > 0 THEN
      floor((len(tg) - len(list_distinct(tg))) * 1e6
            / len(tg))::BIGINT
    END AS dup_trigram_e6
  FROM base
"""


QUERIES_PIPELINE_MORE: dict[str, QuerySpec] = {
    "text_repetition_signals": QuerySpec(
        q_text_repetition_signals, ORACLE_REPETITION,
        doc="Gopher repetition filters (zero-shuffle projection)"),
}
