"""Round-2/3 training-data-pipeline extension queries.

Curation capabilities beyond the round-1 set: Gopher-style repetition
signals, benchmark-decontamination overlap, sequence packing, document
chunking, and DSIR-style importance weighting.  Same cross-engine
exactness rules as ``queries.py`` (floor-scaled e6 ratios, NULL
mirrored on both engines, deterministic tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpoint import materialize
from ..functions.scalar import stable_hash64_sql
from ..operators.curation import (benchmark_overlap, chunk_tokens,
                                  corpus_shuffle, dsir_logratio,
                                  dsir_resample, line_dedup,
                                  sequence_pack)
from ..operators.scale import morton2
from ..operators.similarity import quantize_int8
from ..operators.text import repetition_signals, tokens
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


# ---------------------------------------------------------------------------
# Round 3: decontamination / packing / chunking / DSIR
# ---------------------------------------------------------------------------

# Shared DuckDB shingle fragment over ALL documents (same tokenization
# as operators/dedup.shingles, n=3).
_SH3 = r"""
  words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  sh AS (
    SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(w) >= 3
                       THEN list_transform(generate_series(1, len(w) - 2),
                                           i -> w[i] || ' ' || w[i+1]
                                                || ' ' || w[i+2])
                       ELSE [array_to_string(w, ' ')] END) AS sh
    FROM words
  )
"""

_WORDS = r"""
  words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  )
"""

# Shared DSIR scoring chain: expects a CTE ``dwords(doc_id, is_t, w)``
# upstream.  The per-token log-ratio floor-quantizes to 1e-9 fixed
# point BEFORE the per-doc sum (exact BIGINT, order-insensitive) —
# mirroring operators/curation.dsir_logratio; one copy interpolated
# into every DSIR oracle so the smoothing math cannot drift.
_DSIR_CHAIN = r"""
  toks AS (SELECT doc_id, is_t, unnest(w) AS term FROM dwords),
  vocab AS (
    SELECT term, count(*)::BIGINT AS tf_r, sum(is_t)::BIGINT AS tf_t
    FROM toks GROUP BY term
  ),
  tot AS (
    SELECT sum(tf_r)::BIGINT AS r_tot, sum(tf_t)::BIGINT AS t_tot,
           count(*)::BIGINT AS v FROM vocab
  ),
  scored AS (
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           floor(sum(floor((ln((tf_t + 1) / (t_tot + v))
                            - ln((tf_r + 1) / (r_tot + v)))
                           * 1e9)::BIGINT)::BIGINT
                 / (count(*) * 1000))::BIGINT AS lr
    FROM toks JOIN vocab USING (term) CROSS JOIN tot
    GROUP BY doc_id
  )
"""


def q_benchmark_decontamination(spark, sf_dir):
    """Decontamination vs a held-out benchmark slice (doc_id % 10 == 7
    plays the eval set): per training doc, shingle-overlap counts and a
    contamination flag. Benchmark shingles broadcast; see
    operators/curation.benchmark_overlap."""
    docs = _t(spark, sf_dir, "documents")
    return benchmark_overlap(
        docs.where(F.col("doc_id") % 10 != 7),
        docs.where(F.col("doc_id") % 10 == 7))


ORACLE_DECONTAMINATION = f"""
  WITH {_SH3},
  hashed AS (
    SELECT doc_id, {stable_hash64_sql('sh', 0)} AS sh_h FROM sh
  ),
  tr AS (SELECT doc_id, sh_h FROM hashed WHERE doc_id % 10 <> 7),
  bn AS (SELECT sh_h, doc_id AS bench_doc FROM hashed
         WHERE doc_id % 10 = 7)
  SELECT tr.doc_id AS doc_id,
         count(DISTINCT tr.sh_h)::BIGINT AS n_shingles,
         count(DISTINCT CASE WHEN bn.bench_doc IS NOT NULL
                             THEN tr.sh_h END)::BIGINT AS n_overlap,
         count(DISTINCT bn.bench_doc)::BIGINT AS n_bench_docs,
         floor(count(DISTINCT CASE WHEN bn.bench_doc IS NOT NULL
                                   THEN tr.sh_h END) * 1000000
               / count(DISTINCT tr.sh_h))::BIGINT AS contamination_e6,
         (count(DISTINCT bn.bench_doc) > 0)::BIGINT AS contaminated
  FROM tr LEFT JOIN bn ON tr.sh_h = bn.sh_h
  GROUP BY tr.doc_id
"""


def q_sequence_packing(spark, sf_dir):
    """Concat-and-split sequence packing at seq_len=64: per doc, global
    token offset, pack id, spans. The Spark side runs the two-phase
    bucketed cumsum (no single-task global window); the oracle is the
    naive global window — identical semantics."""
    docs = _t(spark, sf_dir, "documents")
    nt = docs.select(F.col("doc_id"),
                     F.size(tokens("text")).cast("long").alias("n_tokens"))
    return sequence_pack(nt, seq_len=64, bucket=256)


ORACLE_SEQUENCE_PACKING = f"""
  WITH {_WORDS},
  nt AS (SELECT doc_id, len(w)::BIGINT AS n_tokens FROM words),
  off AS (
    SELECT doc_id, n_tokens,
           coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS "offset"
    FROM nt
  )
  SELECT doc_id, n_tokens, "offset",
         ("offset" // 64)::BIGINT AS pack_id,
         (CASE WHEN n_tokens > 0
               THEN ("offset" + n_tokens - 1) // 64
               ELSE "offset" // 64 END
          - "offset" // 64 + 1)::BIGINT AS n_packs_spanned
  FROM off
"""


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunks (size 32, stride 24) — zero-
    shuffle map-side projection; see operators/curation.chunk_tokens."""
    return chunk_tokens(_t(spark, sf_dir, "documents"),
                        chunk_size=32, stride=24)


ORACLE_CHUNKS = f"""
  WITH {_WORDS},
  st AS (
    SELECT doc_id, w, len(w) AS n,
           unnest(generate_series(1, len(w), 24)) AS s
    FROM words WHERE len(w) > 0
  )
  SELECT doc_id,
         ((s - 1) // 24)::BIGINT AS chunk_no,
         array_to_string(list_slice(w, s, least(s + 31, n)), ' ')
           AS chunk_text,
         (least(s + 31, n) - s + 1)::BIGINT AS n_chunk_tokens
  FROM st
"""


def q_dsir_importance(spark, sf_dir):
    """DSIR unigram importance weights with docs where doc_id % 5 == 1
    standing in for the target domain; see
    operators/curation.dsir_logratio."""
    return dsir_logratio(_t(spark, sf_dir, "documents"),
                         F.col("doc_id") % 5 == 1)


ORACLE_DSIR = rf"""
  WITH marked AS (
    SELECT doc_id, text,
           CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS is_t
    FROM documents
  ),
  dwords AS (
    SELECT doc_id, is_t,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM marked
  ),
{_DSIR_CHAIN}
  SELECT m.doc_id AS doc_id,
         coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
         coalesce(s.lr, 0)::BIGINT AS dsir_logratio_e6,
         m.is_t::BIGINT AS is_target
  FROM marked m LEFT JOIN scored s ON m.doc_id = s.doc_id
"""


def q_line_dedup(spark, sf_dir):
    """C4-style corpus-wide line dedup (8-token segments, keep first
    occurrence); see operators/curation.line_dedup."""
    return line_dedup(_t(spark, sf_dir, "documents"))


ORACLE_LINE_DEDUP = r"""
  WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  lines AS (
    SELECT doc_id, ((s - 1) // 8)::BIGINT AS line_no,
           array_to_string(list_slice(w, s, least(s + 7, len(w))), ' ')
             AS line_text
    FROM (SELECT doc_id, w,
                 unnest(generate_series(1, len(w), 8)) AS s
          FROM words WHERE len(w) > 0)
  ),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY line_text
                                 ORDER BY doc_id, line_no) AS rn
    FROM lines
  )
  SELECT doc_id,
         count(*)::BIGINT AS n_lines,
         sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
         coalesce(string_agg(CASE WHEN rn = 1 THEN line_text END,
                             ' ' ORDER BY line_no), '') AS clean_text
  FROM ranked
  GROUP BY doc_id
"""


def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization of the embeddings table — the
    compression step before an ANN index ships; zero-shuffle map-side;
    see operators/similarity.quantize_int8."""
    return quantize_int8(_t(spark, sf_dir, "embeddings"))


ORACLE_QUANTIZE = """
  WITH base AS (
    SELECT vec_id,
           list_transform(embedding, e -> e::DOUBLE) AS v,
           list_max(list_transform(embedding, e -> abs(e::DOUBLE))) AS m
    FROM embeddings
  ),
  qz AS (
    SELECT vec_id, v, m,
           CASE WHEN m > 0 THEN m / 127 ELSE 0.0::DOUBLE END AS s,
           CASE WHEN m > 0
                THEN list_transform(v, e -> floor(e * 127 / m + 0.5)::BIGINT)
                ELSE list_transform(v, e -> 0::BIGINT) END AS q
    FROM base
  )
  SELECT vec_id,
         floor(s * 1e9)::BIGINT AS scale_e9,
         array_to_string(list_transform(q, x -> x::VARCHAR), ',') AS q_csv,
         floor(CASE WHEN m > 0
                    THEN list_max(list_transform(
                           generate_series(1, len(v)),
                           i -> abs(v[i] - q[i] * s)))
                    ELSE 0.0::DOUBLE END * 1e9)::BIGINT AS max_err_e9
  FROM qz
"""


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle of the documents
    table (two-phase hash-prefix ranks, no single-task global window);
    see operators/curation.corpus_shuffle."""
    return corpus_shuffle(_t(spark, sf_dir, "documents"))


ORACLE_CORPUS_SHUFFLE = f"""
  SELECT doc_id,
         (row_number() OVER (ORDER BY h, doc_id) - 1)::BIGINT
           AS shuffle_pos
  FROM (SELECT doc_id,
               {stable_hash64_sql('doc_id::VARCHAR', 7)} AS h
        FROM documents)
"""


def q_dsir_resample(spark, sf_dir):
    """Deterministic DSIR importance resampling (hash-accept against a
    linear squash of the weight); see operators/curation.dsir_resample."""
    return dsir_resample(_t(spark, sf_dir, "documents"),
                         F.col("doc_id") % 5 == 1)


ORACLE_DSIR_RESAMPLE = f"""
  WITH marked AS (
    SELECT doc_id, text,
           CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS is_t
    FROM documents
  ),
  dwords AS (
    SELECT doc_id, is_t,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t <> '') AS w
    FROM marked
  ),
{_DSIR_CHAIN},
  ds AS (
    SELECT m.doc_id AS doc_id,
           coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(s.lr, 0)::BIGINT AS lr,
           m.is_t::BIGINT AS is_target
    FROM marked m LEFT JOIN scored s ON m.doc_id = s.doc_id
  )
  SELECT doc_id, n_tokens, lr AS dsir_logratio_e6,
         greatest(0, least(1000000,
                           500000 + floor(lr / 4)))::BIGINT
           AS p_accept_e6,
         is_target
  FROM ds
  WHERE {stable_hash64_sql('doc_id::VARCHAR', 11)} % 1000000
        < greatest(0, least(1000000, 500000 + floor(lr / 4)))
"""


def q_multimodal_image_raster(spark, sf_dir):
    """REAL image decode path (PPM P6 via stdlib+numpy — no stub):
    each document's text bytes become a 4×4 PPM payload; the raster
    codec decodes, extracts the 8-dim pixel-statistics vector, and
    isolates undecodable payloads (empty docs) as ok=false rows.
    Rows-only driver check (no ANSI-SQL twin for the decoder; the
    bit-level batch twin lives in tests/test_unit_operators.py)."""
    from ..operators.multimodal import extract_image_features
    docs = _t(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(b"P6\n4 4\n255\n"),
        F.substring(F.encode(F.repeat(F.col("text"), 3), "utf-8"), 1, 48))
    assets = docs.select(F.col("doc_id").alias("asset_id"),
                         payload.alias("payload"))
    out = extract_image_features(assets)
    fcsv = F.concat_ws(",", F.transform(
        "feature", lambda x: F.floor(x * 1e6).cast("long").cast("string")))
    return out.select(
        "asset_id", F.col("ok").cast("long").alias("ok"),
        F.coalesce("width", F.lit(-1)).cast("long").alias("width"),
        F.coalesce("height", F.lit(-1)).cast("long").alias("height"),
        F.when(F.col("ok"), fcsv).otherwise(F.lit("")).alias("feature_e6"))


def q_variant_props_rollup(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    the events.props payload once into a variant, ``variant_get``
    typed fields out, aggregate per event type.  Versus from_json with
    a fixed schema (the F3 path, props_json_extract), variant defers
    the schema to read time — the open-schema ingestion pattern; the
    binary variant encoding stays columnar through the shuffle."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"))
    return (v.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.sum("k").alias("sum_k"),
                  F.max("k").alias("max_k"),
                  F.count_distinct("k").alias("n_distinct_k"))
             .orderBy("event_type"))


ORACLE_VARIANT = """
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
         max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
         count(DISTINCT json_extract(props, '$.k')::BIGINT)::BIGINT
           AS n_distinct_k
  FROM events
  GROUP BY event_type
  ORDER BY event_type
"""


def q_recursive_nation_tree(spark, sf_dir):
    """WITH RECURSIVE (new in Spark 4) through the spark.sql text
    interface: walk the synthetic nation hierarchy parent(k) = k div 2
    from the root, emitting depth and the full path — the org-chart /
    BOM-closure query shape.  Iterations are driver-coordinated but
    each step is a distributed join; depth is O(log n) here.  The
    iterative connected-components operator (operators/dedup) remains
    the scale path for unbounded-depth graphs."""
    from ..io import load_table
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_v")
    return spark.sql("""
      WITH RECURSIVE tree AS (
        SELECT n_nationkey AS key, n_name AS name,
               0 AS depth, n_name AS path
        FROM nation_v WHERE n_nationkey = 0
        UNION ALL
        SELECT n.n_nationkey, n.n_name, t.depth + 1,
               concat(t.path, '>', n.n_name)
        FROM nation_v n JOIN tree t
          ON n.n_nationkey DIV 2 = t.key AND n.n_nationkey > 0
      )
      SELECT key, name, CAST(depth AS BIGINT) AS depth, path FROM tree
    """)


ORACLE_RECURSIVE_TREE = """
  WITH RECURSIVE tree AS (
    SELECT n_nationkey AS key, n_name AS name,
           0 AS depth, n_name AS path
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT n.n_nationkey, n.n_name, t.depth + 1,
           t.path || '>' || n.n_name
    FROM nation n JOIN tree t
      ON n.n_nationkey // 2 = t.key AND n.n_nationkey > 0
  )
  SELECT key, name, depth::BIGINT AS depth, path FROM tree
"""


def q_zorder_codes(spark, sf_dir):
    """Morton z-codes of (custkey low 16 bits, nationkey) — the exact
    bit-interleave the z-order layout sorts by, verified bit-for-bit
    against DuckDB's bitwise operators; see operators/scale.morton2."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        morton2(F.col("c_custkey"), F.col("c_nationkey").cast("long"))
        .alias("zvalue"))


def _spread_sql(col: str) -> str:
    e = f"({col} & 65535)"
    for sh, m in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                  (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                  (1, 0x5555555555555555)):
        e = f"(({e} | ({e} << {sh})) & {m})"
    return e


ORACLE_ZORDER = f"""
  SELECT c_custkey,
         ({_spread_sql('c_custkey::BIGINT')}
          | ({_spread_sql('c_nationkey::BIGINT')} << 1))::BIGINT AS zvalue
  FROM customer
"""


def q_training_manifest(spark, sf_dir):
    """End-to-end round-3 curation chain, raw documents → training
    manifest: (1) corpus-wide line dedup, keep docs retaining ≥ half
    their lines; (2) benchmark decontamination (doc_id%10==7 plays the
    eval set), drop contaminated docs; (3) DSIR importance gate
    (doc_id%5==1 plays the target domain), keep non-negative weights;
    (4) concat-and-split sequence packing of the survivors.  Every
    stage is the already-oracled operator — this query is the
    composition a real pretraining pipeline runs nightly.

    Scale: stages chain without materialization (one lazy plan); the
    wide exchanges are the line-hash argmin, the per-doc decon agg,
    the token→vocab join, and the bucketed pack cumsum — all keyed
    shuffles, no broadcast of anything corpus-sized."""
    docs = _t(spark, sf_dir, "documents")
    ld = line_dedup(docs)
    kept = (ld.where(F.col("n_removed") < F.col("n_lines"))
              .select("doc_id", F.col("clean_text").alias("text")))
    # the cleaned train slice feeds BOTH the decon aggregate and the
    # DSIR stage; eager localCheckpoint so the line-dedup subtree runs
    # once (at cluster scale: checkpoint to a shuffle-service-backed
    # path, the same trade documented for the MinHash shingle subtree)
    train = materialize(kept.where(F.col("doc_id") % 10 != 7),
                        "curation_train", prefer="local")
    bench = docs.where(F.col("doc_id") % 10 == 7)
    # 13-gram overlap — the published decontamination standard (GPT-3
    # appendix C); short shingles over-flag on a small vocabulary
    ok = (benchmark_overlap(train, bench, n=13)
          .where(F.col("contaminated") == 0).select("doc_id"))
    surv = train.join(ok, "doc_id", "left_semi")
    ds = dsir_logratio(surv, F.col("doc_id") % 5 == 1)
    sel = ds.where(F.col("dsir_logratio_e6") >= -3000)
    packed = sequence_pack(
        sel.select("doc_id", "n_tokens"), seq_len=64, bucket=256)
    return (packed.join(sel.select("doc_id", "dsir_logratio_e6"),
                        "doc_id")
            .select("doc_id", "n_tokens", "dsir_logratio_e6",
                    "offset", "pack_id", "n_packs_spanned"))


ORACLE_TRAINING_MANIFEST = rf"""
  WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  lines AS (
    SELECT doc_id, ((s - 1) // 8)::BIGINT AS line_no,
           array_to_string(list_slice(w, s, least(s + 7, len(w))), ' ')
             AS line_text
    FROM (SELECT doc_id, w,
                 unnest(generate_series(1, len(w), 8)) AS s
          FROM words WHERE len(w) > 0)
  ),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY line_text
                                 ORDER BY doc_id, line_no) AS rn
    FROM lines
  ),
  ld AS (
    SELECT doc_id, count(*)::BIGINT AS n_lines,
           sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           coalesce(string_agg(CASE WHEN rn = 1 THEN line_text END,
                               ' ' ORDER BY line_no), '') AS clean_text
    FROM ranked GROUP BY doc_id
  ),
  kept AS (
    SELECT doc_id, clean_text AS text FROM ld
    WHERE n_removed < n_lines
  ),
  tr AS (SELECT * FROM kept WHERE doc_id % 10 <> 7),
  trw AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM tr
  ),
  trsh AS (
    SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(w) >= 13
                       THEN list_transform(
                              generate_series(1, len(w) - 12),
                              i -> array_to_string(
                                     list_slice(w, i, i + 12), ' '))
                       ELSE [array_to_string(w, ' ')] END) AS sh
    FROM trw
  ),
  bnsh AS (
    SELECT DISTINCT
           unnest(CASE WHEN len(w) >= 13
                       THEN list_transform(
                              generate_series(1, len(w) - 12),
                              i -> array_to_string(
                                     list_slice(w, i, i + 12), ' '))
                       ELSE [array_to_string(w, ' ')] END) AS sh
    FROM words WHERE doc_id % 10 = 7
  ),
  surv AS (
    SELECT tr.* FROM tr
    WHERE NOT EXISTS (
      SELECT 1 FROM trsh JOIN bnsh USING (sh)
      WHERE trsh.doc_id = tr.doc_id)
  ),
  dwords AS (
    SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS is_t,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM surv
  ),
{_DSIR_CHAIN},
  sel AS (SELECT * FROM scored WHERE lr >= -3000),
  off AS (
    SELECT doc_id, n_tokens, lr,
           coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS "offset"
    FROM sel
  )
  SELECT doc_id, n_tokens, lr AS dsir_logratio_e6, "offset",
         ("offset" // 64)::BIGINT AS pack_id,
         (("offset" + n_tokens - 1) // 64
          - "offset" // 64 + 1)::BIGINT AS n_packs_spanned
  FROM off
"""


QUERIES_PIPELINE_MORE: dict[str, QuerySpec] = {
    "text_repetition_signals": QuerySpec(
        q_text_repetition_signals, ORACLE_REPETITION,
        doc="Gopher repetition filters (zero-shuffle projection)"),
    "benchmark_decontamination": QuerySpec(
        q_benchmark_decontamination, ORACLE_DECONTAMINATION, headline=True,
        doc="benchmark n-gram decontamination (broadcast eval shingles)"),
    "sequence_packing": QuerySpec(
        q_sequence_packing, ORACLE_SEQUENCE_PACKING,
        doc="concat-and-split sequence packing (two-phase bucketed cumsum)"),
    "chunk_documents": QuerySpec(
        q_chunk_documents, ORACLE_CHUNKS,
        doc="overlapping token-window chunking (zero-shuffle)"),
    "dsir_importance": QuerySpec(
        q_dsir_importance, ORACLE_DSIR,
        doc="DSIR unigram importance weighting (broadcast vocabulary)"),
    "embedding_quantize_int8": QuerySpec(
        q_embedding_quantize_int8, ORACLE_QUANTIZE,
        doc="symmetric int8 embedding quantization (zero-shuffle)"),
    "corpus_shuffle_positions": QuerySpec(
        q_corpus_shuffle, ORACLE_CORPUS_SHUFFLE,
        doc="deterministic global corpus shuffle (two-phase ranks)"),
    "line_dedup_clean": QuerySpec(
        q_line_dedup, ORACLE_LINE_DEDUP,
        doc="C4-style corpus-wide line dedup + doc reassembly"),
    "training_manifest": QuerySpec(
        q_training_manifest, ORACLE_TRAINING_MANIFEST,
        doc="full curation chain: line dedup → 13-gram decontamination "
            "→ DSIR gate → sequence packing"),
    "dsir_resampled_corpus": QuerySpec(
        q_dsir_resample, ORACLE_DSIR_RESAMPLE,
        doc="deterministic DSIR importance resampling (hash-accept)"),
    "zorder_codes": QuerySpec(
        q_zorder_codes, ORACLE_ZORDER,
        doc="Morton z-codes (bit-interleave) for z-order clustering"),
    "recursive_nation_tree": QuerySpec(
        q_recursive_nation_tree, ORACLE_RECURSIVE_TREE,
        doc="WITH RECURSIVE hierarchy walk (Spark 4 recursive CTE)"),
    "variant_props_rollup": QuerySpec(
        q_variant_props_rollup, ORACLE_VARIANT,
        doc="VARIANT semi-structured path (parse_json/variant_get)"),
    "multimodal_image_raster": QuerySpec(
        q_multimodal_image_raster, None,
        doc="REAL raster image codec (PPM decode + pixel features; "
            "rows-only)"),
}
