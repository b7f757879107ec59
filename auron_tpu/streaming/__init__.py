"""Streaming front-end: micro-batch sources + record serde + continuously
maintained queries over the batch engine (the auron-flink-extension
analog, SURVEY §2.3 / kafka_scan_exec.rs / flink/serde)."""

from .query import StreamingQuery
from .serde import FieldSpec, JsonDeserializer, PbDeserializer
from .source import MicroBatchSource, MockSource, Record

__all__ = ["StreamingQuery", "FieldSpec", "JsonDeserializer",
           "PbDeserializer", "MicroBatchSource", "MockSource", "Record"]
