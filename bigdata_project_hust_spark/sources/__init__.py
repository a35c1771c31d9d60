"""Custom Python Data Source API connectors (Spark 4)."""

from .kafka_log import (KAFKA_FRAME_SCHEMA, KafkaShapedSource,
                        append_records, create_topic, expire_before,
                        produce_topic_from_df, register_kafka_shaped)
from .pyds import FixtureReplaySource, register_fixture_replay

__all__ = ["FixtureReplaySource", "register_fixture_replay",
           "KafkaShapedSource", "register_kafka_shaped", "create_topic",
           "append_records", "expire_before", "produce_topic_from_df",
           "KAFKA_FRAME_SCHEMA"]
