"""Round-24 extension queries: the character-level suffix-rank family
(`operators/suffix.py`) — the exact substring-dedup machinery that
``span_duplicates`` approximates with token shingles (Lee et al.'s
exact-substring pass is a corpus suffix array).

* ``suffix_rank_stats`` — dense rank of EVERY suffix of every document
  under full lexicographic order, via distributed prefix doubling
  (O(log max_doc_len) rounds, each one narrow-row join + a
  dense_ids range-exchange re-rank; early exit once ranks are all
  distinct), aggregated per document (count/min/max/sum of ranks) so
  |docs| output rows value-hash the entire corpus-sized rank table.
* ``longest_repeat_top10`` — top-10 longest repeated substrings
  (64-char report window): identical-suffix rank groups plus the LCP
  of adjacent distinct ranks (the suffix-array adjacency property);
  LCP is a flat sum of 64 codegen'd prefix-equality indicators.

The DuckDB oracles rank ``substr(text, p)`` directly (corpus suffixes
are document-bounded and short, so the oracle can afford the whole
string sort the engine's prefix doubling avoids) and replay the same
64-term LCP over a lag window.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (query modules' idiom)

from ..operators import suffix
from .spec import QuerySpec, _t

QUERIES_ROUND24: dict[str, QuerySpec] = {}


def q_suffix_rank_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return suffix.suffix_rank_stats(docs)


def q_longest_repeat_top10(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return suffix.longest_repeats(docs, k=10, min_len=4)


_LCP_TERMS = " + ".join(
    f"(CASE WHEN substr(s, 1, {L}) = substr(ps, 1, {L}) "
    f"THEN 1 ELSE 0 END)"
    for L in range(1, suffix.REPEAT_WINDOW + 1))


def _oracle_suffix_stats() -> str:
    return """
  WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text))) AS p
    FROM documents
  ),
  r AS (
    SELECT doc_id,
           dense_rank() OVER (ORDER BY substr(text, p::INT)) AS rk
    FROM pos
  )
  SELECT doc_id, count(*)::BIGINT AS n_sfx, min(rk)::BIGINT AS min_rank,
         max(rk)::BIGINT AS max_rank, sum(rk)::BIGINT AS sum_rank
  FROM r GROUP BY doc_id ORDER BY doc_id
"""


def _oracle_longest_repeat() -> str:
    return f"""
  WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(1, length(text))) AS p
    FROM documents
  ),
  sfx AS (
    SELECT doc_id, p,
           substr(text, p::INT) AS full_s,
           substr(text, p::INT, {suffix.REPEAT_WINDOW}) AS s,
           (length(text) - p + 1) AS slen
    FROM pos
  ),
  ord AS (
    SELECT s, slen,
           lag(s)    OVER (ORDER BY full_s, doc_id, p) AS ps,
           lag(slen) OVER (ORDER BY full_s, doc_id, p) AS pslen
    FROM sfx
  ),
  lcps AS (
    SELECT least({_LCP_TERMS},
                 slen, pslen, {suffix.REPEAT_WINDOW}) AS lcp, s
    FROM ord WHERE ps IS NOT NULL
  ),
  cand AS (
    SELECT DISTINCT substr(s, 1, lcp::INT) AS repeat_str
    FROM lcps WHERE lcp >= 4
  )
  SELECT length(repeat_str)::BIGINT AS repeat_len, repeat_str
  FROM cand ORDER BY repeat_len DESC, repeat_str ASC LIMIT 10
"""


QUERIES_ROUND24.update({
    "suffix_rank_stats": QuerySpec(
        q_suffix_rank_stats, _oracle_suffix_stats(),
        doc="per-document count/min/max/sum of full-lexicographic "
            "suffix ranks via distributed prefix doubling (hash of "
            "the entire suffix-rank table in |docs| rows)"),
    "longest_repeat_top10": QuerySpec(
        q_longest_repeat_top10, _oracle_longest_repeat(),
        doc="top-10 longest repeated substrings (64-char window) from "
            "identical-suffix groups + adjacent-rank LCPs"),
})
