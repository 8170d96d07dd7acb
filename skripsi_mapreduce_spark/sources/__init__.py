"""Source/sink connectors."""

from .readers import read_any, read_json_lines, AVRO_AVAILABLE  # noqa: F401
