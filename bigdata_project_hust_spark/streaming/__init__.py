"""Structured Streaming layer (SURVEY §2.9).

The reference speed layer is a single-threaded Kafka consumer loop
(consumer1.py:155-172); its batch layer is a hand-rolled poll loop with
a Mongo checkpoint (consumer2.py:278-353). Both collapse onto
Structured Streaming primitives:

* file/kafka source + checkpointLocation  → S9/S12/ST5 for free
* withWatermark + dropDuplicates          → ST2 bounded-state dedup
* update-mode groupBy().agg()             → ST6 incremental aggregates
* tumbling window agg                     → ST7 engagement change log
* foreachBatch + idempotent merge         → S6/S7/S10 upsert sinks
"""
