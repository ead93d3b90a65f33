from .spans import (  # noqa: F401
    NODE_JSON_SCHEMA,
    WAY_JSON_SCHEMA,
    explode_spans,
    parse_nodes,
    parse_ways,
    span_sequence_violations,
)
from .osm_xml import osm_xml_to_documents, systematic_sample  # noqa: F401
