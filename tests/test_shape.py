"""A13-A16 shape semantics vs the oracle's shape_element."""

import json

from osmspark.operators import shape

from . import oracle


def _oracle_shaped(docs_py, kind):
    out = {}
    for el in oracle.iter_elements(docs_py):
        if el["_kind"] == kind:
            out[el["id"]] = oracle.shape_element(el)
    return out


def test_shape_nodes_matches_oracle(nodes, docs_py):
    exp = _oracle_shaped(docs_py, "node")
    got = shape.shape_nodes(nodes).collect()
    assert len(got) == len(exp)
    for r in got:
        e = exp[r["id"]]
        assert r["type"] == "node"
        assert r["created"].asDict() == e["created"]
        assert [round(x, 10) for x in r["pos"]] == [round(x, 10) for x in e["pos"]]
        assert dict(r["address"] or {}) == e["address"]
        assert dict(r["tags"] or {}) == e["tags"]


def test_shape_ways_node_refs_order(ways, docs_py):
    exp = _oracle_shaped(docs_py, "way")
    got = shape.shape_ways(ways).collect()
    assert len(got) == len(exp)
    for r in got:
        assert list(r["node_refs"]) == exp[r["id"]]["node_refs"]


def test_shape_drops_problem_and_two_level_keys(nodes):
    rows = shape.shape_nodes(nodes).collect()
    seen_raw_dotted = nodes.filter(
        nodes["tags"]["name.zh"].isNotNull()
    ).count()
    assert seen_raw_dotted > 0  # the fixture must exercise the dotted key
    for r in rows:
        for k in dict(r["tags"] or {}):
            assert not k.startswith("addr:")
            assert "bad key!" != k
            assert "name.zh" != k  # '.' is problemchars (tags.py [C])
        for k in dict(r["address"] or {}):
            assert ":" not in k


def test_json_lines_sink_roundtrip(tmp_path, nodes, spark):
    """A16: one JSON object per line; readable back with same row count."""
    out = str(tmp_path / "shaped_json")
    df = shape.shape_nodes(nodes)
    shape.write_json_lines(df, out)
    back = spark.read.json(out)
    assert back.count() == df.count()
    # spot-check a line is a JSON object with the shaped fields
    import glob

    f = sorted(glob.glob(out + "/part-*"))[0]
    with open(f) as fh:
        obj = json.loads(fh.readline())
    assert {"id", "type", "created"} <= set(obj)
