"""B1 span extraction + the span-sequence invariant (input_hint [D])."""

from pyspark.sql import functions as F

from osmspark.sources import explode_spans, span_sequence_violations


def test_span_sequence_invariant(docs):
    assert span_sequence_violations(docs).count() == 0


def test_explode_preserves_order_and_count(docs, docs_py):
    spans = explode_spans(docs)
    total = sum(len(s) for _, s in docs_py)
    assert spans.count() == total
    # per-doc positions are 0..n-1 and offsets strictly increase with pos
    bad = (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.max("pos").alias("maxpos"),
            F.min("pos").alias("minpos"),
        )
        .filter((F.col("maxpos") != F.col("n") - 1) | (F.col("minpos") != 0))
    )
    assert bad.count() == 0
    w_prev = (
        spans.withColumn(
            "prev",
            F.lag("offset").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("doc_id").orderBy("pos")
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("offset") <= F.col("prev")))
    )
    assert w_prev.count() == 0


def test_kind_pushdown_filter(docs, docs_py):
    only_nodes = explode_spans(docs, kinds=["node"])
    expected = sum(1 for _, s in docs_py for x in s if x["kind"] == "node")
    assert only_nodes.count() == expected
    assert only_nodes.filter(F.col("kind") != "node").count() == 0


def test_parse_nodes_fields(nodes, docs_py):
    import json

    rows = {r["id"]: r for r in nodes.collect()}
    n_checked = 0
    for _, spans in docs_py:
        for s in spans:
            if s["kind"] != "node":
                continue
            el = json.loads(s["text"])
            r = rows[el["id"]]
            assert abs(r["lat"] - el["lat"]) < 1e-12
            assert abs(r["lon"] - el["lon"]) < 1e-12
            assert r["user"] == el["user"]
            assert (r["tags"] or {}) == (el.get("tags") or {})
            n_checked += 1
    assert n_checked == len(rows) > 0


def test_parse_ways_nd_order(ways, docs_py):
    """A15: node_refs preserve payload order exactly."""
    import json

    rows = {r["id"]: list(r["nd"]) for r in ways.collect()}
    for _, spans in docs_py:
        for s in spans:
            if s["kind"] != "way":
                continue
            el = json.loads(s["text"])
            assert rows[el["id"]] == el["nd"]
