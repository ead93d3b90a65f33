"""OSM XML ingestion — the reference's native input format (SURVEY A1).

The reference consumes `.osm` files via ET.iterparse (mapparser.py:~L8 /
data.py:~L72 [C]).  This module lets a user of the reference point the
engine at the same files:

  * `osm_xml_to_documents`: distributed parse.  Files load whole (element
    boundaries intact), split into top-level element blobs
    (node/way/relation open..close) by regex, parsed with ElementTree
    per partition (the one justified RDD use in the engine: per-file
    imperative splitting of a format Spark has no columnar reader for).
    Output is the engine's interleaved-documents schema, spans carrying the
    same JSON grammar the synthetic generator emits — the whole downstream
    engine (audits, cells, PIP, tiles) runs unchanged on real OSM data.
  * `systematic_sample`: every-k-th-document sampling (sample.py [C], A2) —
    deterministic hash-mod, not row order, so it is stable under
    repartitioning.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ELEMENT_RE = re.compile(
    # self-closing element, or element with children up to its close tag
    # (a naive non-greedy ".*?/>" would stop at an inner <tag .../>)
    r"<(node|way|relation)\b[^>]*/>"
    r"|<(node|way|relation)\b[^>]*>.*?</\2>",
    re.DOTALL,
)

DOC_BATCH = 100  # OSM elements per output document


def _element_to_span(el: ET.Element) -> dict | None:
    """node/way/RELATION -> span.  Relations were dropped in round 1, which
    made tag-name frequency diverge from the reference's count_tags
    (mapparser.py:~L6 [C] counts every element kind) on real .osm files."""
    kind = el.tag
    if kind not in ("node", "way", "relation"):
        return None
    payload: dict = dict(el.attrib)
    tag_elems = list(el.iter("tag"))
    tags = {t.attrib["k"]: t.attrib["v"] for t in tag_elems}
    if tags:
        payload["tags"] = tags
        # the map collapses duplicate k attributes on one element; the raw
        # <tag> child count is kept so count_xml_tags stays exact on real
        # .osm files with repeated keys (round-2 ADVICE)
        payload["n_tags"] = len(tag_elems)
    if kind == "way":
        payload["nd"] = [nd.attrib["ref"] for nd in el.iter("nd")]
    if kind == "relation":
        payload["members"] = [
            {"type": m.attrib.get("type", ""),
             "ref": m.attrib.get("ref", ""),
             "role": m.attrib.get("role", "")}
            for m in el.iter("member")
        ]
    for fl in ("lat", "lon"):
        if fl in payload:
            payload[fl] = float(payload[fl])
    return {"kind": kind, "text": json.dumps(payload, sort_keys=True),
            "media_ref": "", "offset": 0}


def parse_xml_blobs(blobs) -> list[dict]:
    """XML element strings -> span dicts (shared by the distributed path
    and tests)."""
    spans = []
    for blob in blobs:
        try:
            el = ET.fromstring(blob)
        except ET.ParseError:
            continue
        s = _element_to_span(el)
        if s is not None:
            spans.append(s)
    return spans


def osm_xml_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """.osm file(s) -> interleaved-documents DataFrame.

    spark.read.text splits lines across partitions, which can cut an XML
    element in half at a partition boundary; wholeTextFiles-per-file keeps
    elements intact (OSM extracts are distributed as many modest files at
    scale; a single planet file would be pre-split by osmium/osmconvert)."""
    rdd = spark.sparkContext.wholeTextFiles(path)

    def to_rows(kv):
        fname, content = kv
        blobs = [m.group(0) for m in _ELEMENT_RE.finditer(content)]
        for batch_no in range(0, len(blobs), DOC_BATCH):
            spans = parse_xml_blobs(blobs[batch_no:batch_no + DOC_BATCH])
            for off, s in enumerate(spans):
                s["offset"] = off
            if spans:
                yield (f"{fname.rsplit('/', 1)[-1]}-{batch_no // DOC_BATCH:06d}",
                       spans)

    return spark.createDataFrame(
        rdd.flatMap(to_rows),
        schema=("doc_id string, spans array<struct<"
                "kind:string,text:string,media_ref:string,offset:int>>"),
    )


def systematic_sample(docs: DataFrame, k: int = 10,
                      id_col: str = "doc_id") -> DataFrame:
    """A2 (sample.py [C]): keep every k-th document, deterministically
    (hash-mod on the id, not row position — stable under shuffles)."""
    return docs.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(k)) == 0)
