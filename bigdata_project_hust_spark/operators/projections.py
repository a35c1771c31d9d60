"""Projection / filter operators and the reference's preprocess chain
(SURVEY §2.2, §3.1).

``preprocess_*`` are the Spark re-expressions of the reference speed
layer (consumer1.py:71-110): value-only twitter→x rewrite (F2),
per-topic projection (P1), ingest timestamp (F5), influence score (F1),
KOL threshold (P2). They are plain DataFrame→DataFrame functions, so
the *same* code runs under batch and Structured Streaming (streaming/
pipeline.py wires them to a stream source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.scalar import influence_score, rewrite_values
from ..schemas import TWITTER_STRUCT

KOL_THRESHOLD = 50.0  # reference consumer1.py:39


def with_ingest_ts(df: DataFrame) -> DataFrame:
    """F5: add unix-seconds ingest timestamp (consumer1.py:81,92,108)."""
    return df.withColumn("timestamp",
                         F.unix_timestamp(F.current_timestamp()))


def preprocess_projects(df: DataFrame) -> DataFrame:
    """P1 (projects): rewrite string values, parse the twitter JSON
    string into a struct (F3, consumer2.py:111-114,126), keep id/url/
    website (consumer1.py:75-82)."""
    return (df
            .withColumn("projectId", rewrite_values("projectId"))
            .withColumn("website", rewrite_values("website"))
            .withColumn("twitter_struct",
                        F.from_json(rewrite_values("twitter"), TWITTER_STRUCT))
            .select("projectId",
                    F.col("twitter_struct.url").alias("twitter_url"),
                    "website"))


def preprocess_tweets(df: DataFrame) -> DataFrame:
    """P1 (tweets): rewrite strings, keep author/engagement fields
    (consumer1.py:83-93). Engagement nulls are preserved here — the
    null→0 coalesce happens inside aggregation (A1), matching the
    reference's `or 0` placement (consumer2.py:184-191)."""
    return (df
            .withColumn("author", rewrite_values("author"))
            .withColumn("authorName", rewrite_values("authorName"))
            .select("author", "authorName", "views", "likes",
                    "replyCounts", "retweetCounts"))


def preprocess_users(df: DataFrame) -> DataFrame:
    """P1 (users) + F1: rewrite strings, compute influence score with
    nulls→0 (consumer1.py:55-59,94-109)."""
    return (df
            .withColumn("userName", rewrite_values("userName"))
            .withColumn("url", rewrite_values("url"))
            .withColumn("influence_score",
                        influence_score("followersCount", "statusesCount",
                                        "friendsCount"))
            .select("_id", "userName", "url", "followersCount",
                    "statusesCount", "friendsCount", "blue", "location",
                    "influence_score"))


def kol_filter(df: DataFrame,
               threshold: float = KOL_THRESHOLD) -> DataFrame:
    """P2: influence_score >= threshold — note `>=`, not `>`
    (consumer1.py:136; boundary unit-tested)."""
    return df.where(F.col("influence_score") >= F.lit(threshold))
