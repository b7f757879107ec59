"""Streaming front-end: micro-batch sources + record serde + continuously
maintained queries over the batch engine (the auron-flink-extension
analog, SURVEY §2.3 / kafka_scan_exec.rs / flink/serde)."""

from .query import StreamingQuery
from .serde import FieldSpec, JsonDeserializer, PbDeserializer
from .source import MicroBatchSource, MockSource, Record

__all__ = ["StreamingQuery", "FieldSpec", "JsonDeserializer",
           "PbDeserializer", "MicroBatchSource", "MockSource", "Record",
           "KafkaWireSource", "FakeBroker", "PbWireDeserializer"]


def __getattr__(name):  # lazy: socket/wire modules only when asked for
    if name in ("KafkaWireSource", "FakeBroker"):
        from . import kafka
        return getattr(kafka, name)
    if name in ("PbWireDeserializer", "PbField", "PbSchema"):
        from . import pbwire
        return getattr(pbwire, name)
    raise AttributeError(name)
