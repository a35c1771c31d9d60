"""Explicit StructType schemas — the engine's single schema registry.

Two families (FIXTURES.md):

* DRIVER_TABLES — the ten TPC-H-ish fixture tables the driver generates
  under /root/testdata/sf*/ . Declared explicitly so JSON/CSV variants
  of the same tables never pay an inference pass and so streaming
  sources (which require a schema) can reuse them.

* Reference-shaped topic schemas — the three Kafka topics / Mongo
  collections of the reference system (schema registry at reference
  consumer2.py:78-114): projects_social_media, tweets, twitter_users,
  plus the nested ``twitter`` struct parsed out of a JSON string column.

All reference fields are nullable, matching the reference registry
(consumer2.py:81-107 passes nullable=True throughout).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Family A: driver fixture tables (FIXTURES.md §A)
# ---------------------------------------------------------------------------

REGION = T.StructType([
    _f("r_regionkey", T.IntegerType()),
    _f("r_name", T.StringType()),
])

NATION = T.StructType([
    _f("n_nationkey", T.IntegerType()),
    _f("n_name", T.StringType()),
    _f("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    _f("c_custkey", T.LongType()),
    _f("c_name", T.StringType()),
    _f("c_nationkey", T.IntegerType()),
    _f("c_acctbal", T.DoubleType()),
    _f("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    _f("s_suppkey", T.LongType()),
    _f("s_name", T.StringType()),
    _f("s_nationkey", T.IntegerType()),
    _f("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    _f("p_partkey", T.LongType()),
    _f("p_name", T.StringType()),
    _f("p_brand", T.StringType()),
    _f("p_type", T.StringType()),
    _f("p_size", T.IntegerType()),
    _f("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    _f("o_orderkey", T.LongType()),
    _f("o_custkey", T.LongType()),
    _f("o_orderstatus", T.StringType()),
    _f("o_totalprice", T.DoubleType()),
    _f("o_orderdate", T.TimestampType()),
    _f("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    _f("l_orderkey", T.LongType()),
    _f("l_partkey", T.LongType()),
    _f("l_suppkey", T.LongType()),
    _f("l_linenumber", T.IntegerType()),
    _f("l_quantity", T.DoubleType()),
    _f("l_extendedprice", T.DoubleType()),
    _f("l_discount", T.DoubleType()),
    _f("l_tax", T.DoubleType()),
    _f("l_returnflag", T.StringType()),
    _f("l_linestatus", T.StringType()),
    _f("l_shipdate", T.TimestampType()),
])

EVENTS = T.StructType([
    _f("event_id", T.LongType()),
    _f("ts", T.TimestampType()),
    _f("user_id", T.LongType()),
    _f("event_type", T.StringType()),
    _f("value", T.DoubleType()),
    _f("props", T.StringType()),  # JSON string → from_json target (F3)
])

DOCUMENTS = T.StructType([
    _f("doc_id", T.LongType()),
    _f("text", T.StringType()),
    _f("lang", T.StringType()),
    _f("source", T.StringType()),
    _f("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    _f("vec_id", T.LongType()),
    _f("embedding", T.ArrayType(T.FloatType())),
    _f("label", T.IntegerType()),
])

DRIVER_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}


# ---------------------------------------------------------------------------
# Family B: reference-shaped topic schemas (reference consumer2.py:78-114)
# ---------------------------------------------------------------------------

# Nested struct carried as a JSON *string* column in project docs and
# parsed with from_json (reference consumer2.py:111-114,126).
TWITTER_STRUCT = T.StructType([
    _f("id", T.StringType()),
    _f("url", T.StringType()),
])

PROJECTS_SOCIAL_MEDIA = T.StructType([
    _f("projectId", T.StringType()),
    _f("twitter", T.StringType()),   # JSON string of TWITTER_STRUCT
    _f("website", T.StringType()),
])

TWEETS = T.StructType([
    _f("author", T.StringType()),
    _f("authorName", T.StringType()),
    _f("views", T.LongType()),
    _f("likes", T.LongType()),
    _f("replyCounts", T.LongType()),
    _f("retweetCounts", T.LongType()),
])

TWITTER_USERS = T.StructType([
    _f("_id", T.StringType()),
    _f("userName", T.StringType()),
    _f("url", T.StringType()),
    _f("favouritesCount", T.IntegerType()),
    _f("friendsCount", T.IntegerType()),
    _f("listedCount", T.IntegerType()),
    _f("mediaCount", T.IntegerType()),
    _f("followersCount", T.IntegerType()),
    _f("statusesCount", T.IntegerType()),
    _f("blue", T.BooleanType()),
    _f("location", T.StringType()),
])

TOPIC_SCHEMAS: dict[str, T.StructType] = {
    "projects_social_media": PROJECTS_SOCIAL_MEDIA,
    "tweets": TWEETS,
    "twitter_users": TWITTER_USERS,
}

# Multimodal extension: media assets as opaque binary + typed metadata.
# The payload column is an opaque blob; decode is a (stubbed) Pandas UDF
# over mapInPandas — see operators/multimodal.py.
MEDIA_ASSETS = T.StructType([
    _f("asset_id", T.LongType()),
    _f("kind", T.StringType()),          # image | audio | video
    _f("payload", T.BinaryType()),
    _f("mime", T.StringType()),
    _f("width", T.IntegerType()),
    _f("height", T.IntegerType()),
    _f("duration_ms", T.LongType()),
])
