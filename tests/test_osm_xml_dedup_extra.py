"""OSM-XML source (A1 real-format ingestion), systematic sample (A2),
dedup keep-list (connected components)."""

import pytest
from pyspark.sql import functions as F

from osmspark.operators import audit, dedup
from osmspark.sources import (
    osm_xml_to_documents,
    parse_nodes,
    parse_ways,
    systematic_sample,
)

OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="1.2901" lon="103.8501" version="2" changeset="10"
        timestamp="2016-01-01T00:00:00Z" user="alice" uid="7">
    <tag k="addr:street" v="Bedok St."/>
    <tag k="addr:postcode" v="018956"/>
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="2" lat="1.3501" lon="103.6901" version="1" changeset="11"
        timestamp="2016-02-02T00:00:00Z" user="bob" uid="8"/>
  <way id="3" version="1" changeset="12"
       timestamp="2016-03-03T00:00:00Z" user="alice" uid="7">
    <nd ref="1"/><nd ref="2"/><nd ref="1"/>
    <tag k="highway" v="residential"/>
    <tag k="name" v="Jln Ahmad Ibrahim"/>
  </way>
  <relation id="4" version="1"><member type="way" ref="3"/></relation>
</osm>
"""


@pytest.fixture(scope="module")
def osm_docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("osm")
    (d / "sample.osm").write_text(OSM_XML)
    return osm_xml_to_documents(spark, str(d / "sample.osm")).cache()


def test_osm_xml_roundtrip(osm_docs):
    nodes = parse_nodes(osm_docs)
    got = {r["id"]: r for r in nodes.collect()}
    assert set(got) == {"1", "2"}
    assert got["1"]["tags"]["addr:street"] == "Bedok St."
    assert abs(got["1"]["lat"] - 1.2901) < 1e-12
    assert got["1"]["user"] == "alice"
    ways = parse_ways(osm_docs).collect()
    assert len(ways) == 1
    assert list(ways[0]["nd"]) == ["1", "2", "1"]  # order + dup preserved
    # relations ARE spans now (A4 parity with count_tags [C]); A3 filters
    # still exclude them from node/way pipelines
    from osmspark.sources import count_xml_tags, explode_spans, parse_relations

    kinds = {r["kind"] for r in explode_spans(osm_docs).collect()}
    assert kinds == {"node", "way", "relation"}
    rels = parse_relations(osm_docs).collect()
    assert len(rels) == 1 and rels[0]["id"] == "4"
    assert [m["ref"] for m in rels[0]["members"]] == ["3"]
    # full count_tags parity: every tag NAME the .osm carried
    counts = {r["name"]: r["cnt"] for r in count_xml_tags(osm_docs).collect()}
    assert counts == {"node": 2, "way": 1, "relation": 1,
                      "tag": 5, "nd": 3, "member": 1}


def test_osm_xml_feeds_audit(osm_docs):
    nodes = parse_nodes(osm_docs)
    norm = {
        r["normalized_type"]: r["cnt"]
        for r in audit.normalized_street_counts(audit.streets(nodes)).collect()
    }
    assert norm == {"Street": 1}


def test_systematic_sample(docs):
    s = systematic_sample(docs, k=10)
    n, total = s.count(), docs.count()
    assert 0 < n < total
    # deterministic and repartition-stable
    assert systematic_sample(docs.repartition(3), k=10).count() == n


def test_dedup_keep_list(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "a long, b long",
    )
    docs = spark.createDataFrame([(i,) for i in
                                  [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]],
                                 "doc_id long")
    keep = {r["doc_id"]: r["keeper"]
            for r in dedup.dedup_keep_list(pairs, docs).collect()}
    assert keep == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20, 23: 20, 99: 99}


def test_minhash_native_plan_no_python(texts):
    sigs = dedup.minhash_signatures(texts, 32)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z")],
        "doc_id long, text string",
    )
