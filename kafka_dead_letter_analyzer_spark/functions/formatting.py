"""Timestamp formatting (N3) and sink-key derivation (K1/K2).

Reference:
- Formatter.java:42-65 builds ``yyyy-MM-dd'T'HH:mm:ss.SSS`` strings in the
  *system default* time zone. We pin the session zone to UTC
  (SURVEY.md §7.4) so sink strings are reproducible; this is a documented
  divergence, not an accident.
- Main-output key ``"{topic}+{partition}+{offset}"``:
  KeyedDeadLetterWithContext.java:51-54.
- Stats/examples key ``"{topic}:{type}"``:
  DeadLetterAnalyzerTopology.java:74-76.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark SimpleDateFormat-style pattern (Formatter.java:43-56).
TS_PATTERN = "yyyy-MM-dd'T'HH:mm:ss.SSS"
# The same pattern in DuckDB strftime dialect (%g = milliseconds) for oracles.
TS_PATTERN_SQL = "%Y-%m-%dT%H:%M:%S.%g"


def format_timestamp(ts: Column | str) -> Column:
    """Instant -> sink string (Formatter.java:58-60), UTC session zone."""
    return F.date_format(ts, TS_PATTERN)


def elastic_document_key(topic: Column, partition: Column, offset: Column) -> Column:
    """Main-output key ``{topic}+{partition}+{offset}``
    (KeyedDeadLetterWithContext.java:51-54)."""
    return F.format_string("%s+%d+%d", topic, partition, offset)


def stats_key(topic: Column, error_type: Column) -> Column:
    """Stats/examples key ``{topic}:{type}``
    (DeadLetterAnalyzerTopology.java:74-76)."""
    return F.format_string("%s:%s", topic, error_type)
