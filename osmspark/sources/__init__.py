from .spans import (  # noqa: F401
    ANY_JSON_SCHEMA,
    NODE_JSON_SCHEMA,
    RELATION_JSON_SCHEMA,
    WAY_JSON_SCHEMA,
    count_xml_tags,
    explode_spans,
    parse_nodes,
    parse_relations,
    parse_ways,
    span_sequence_violations,
)
from .osm_xml import osm_xml_to_documents, systematic_sample  # noqa: F401
