"""Structured Streaming layer: the reference's native execution mode.

The batch operators (plans/topology.py) are pure column programs, so they
run unchanged under ``readStream``; this package adds only what genuinely
differs in streaming:

- ``kafka``: source/sink wiring (subscribePattern, includeHeaders, the S2
  brute-force decode cascade, sink encodings, the E3 error-topic loop).
- ``engine``: the stateful pieces — update-mode statistics and the
  arrival-order first-example operator (``applyInPandasWithState``).
"""

from kafka_dead_letter_analyzer_spark.streaming.engine import (
    StreamingTopology,
    build_streaming_topology,
    start_stateless_outputs,
    streaming_error_statistics,
    streaming_error_statistics_per_record,
    streaming_dedup_records,
    streaming_first_examples,
    streaming_interval_join,
    streaming_threshold_alerts,
    streaming_topk_types,
    streaming_session_statistics,
    streaming_windowed_statistics,
    streaming_error_statistics_ttl,
)
from kafka_dead_letter_analyzer_spark.streaming.kafka import (
    decode_kafka_records,
    kafka_sink_projection,
    read_dead_letter_stream,
)
from kafka_dead_letter_analyzer_spark.streaming.large_message import (
    claim_check_reads,
    claim_check_writes,
    header_decode,
    header_encode,
    wire_decode,
    wire_encode,
)

__all__ = [
    "claim_check_reads",
    "claim_check_writes",
    "header_decode",
    "header_encode",
    "wire_decode",
    "wire_encode",
    "StreamingTopology",
    "build_streaming_topology",
    "start_stateless_outputs",
    "streaming_error_statistics",
    "streaming_error_statistics_per_record",
    "streaming_dedup_records",
    "streaming_first_examples",
    "streaming_interval_join",
    "streaming_threshold_alerts",
    "streaming_topk_types",
    "streaming_session_statistics",
    "streaming_windowed_statistics",
    "streaming_error_statistics_ttl",
    "decode_kafka_records",
    "kafka_sink_projection",
    "read_dead_letter_stream",
]
