from .spans import (  # noqa: F401
    NODE_JSON_SCHEMA,
    WAY_JSON_SCHEMA,
    explode_spans,
    parse_nodes,
    parse_ways,
    span_sequence_violations,
)
