"""PageRank vs an independent numpy power iteration, closed-form cases,
mass conservation, guards, and the domain-authority composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmspark.operators.pagerank import domain_authority, pagerank


def _np_pagerank(edges, d=0.85, max_iter=100, tol=1e-6):
    """Independent power iteration (dict/numpy, same dangling rule and
    the same RELATIVE tol semantics: stop at max |delta| <= tol/n)."""
    import numpy as np

    eset = sorted(set(edges))
    nodes = sorted({u for u, _ in eset} | {v for _, v in eset})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for u, v in eset:
        out.setdefault(u, []).append(v)
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    dang = [idx[x] for x in nodes if x not in out]
    dm = r[dang].sum() if dang else 0.0
    for _ in range(max_iter):
        new = np.full(n, (1 - d) / n) + d * dm / n
        for u, vs in out.items():
            w = r[idx[u]] / len(vs)
            for v in vs:
                new[idx[v]] += d * w
        delta = float(np.max(np.abs(new - r)))
        r = new
        dm = r[dang].sum() if dang else 0.0
        if delta <= tol / n:
            break
    return {x: float(r[idx[x]]) for x in nodes}


def test_two_cycle_closed_form(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert abs(got["a"] - 0.5) < 1e-9 and abs(got["b"] - 0.5) < 1e-9


def test_matches_numpy_oracle_random_graph(spark):
    """60-node digraph with hubs, chains, and genuine dangling nodes."""
    edges = []
    for i in range(60):
        edges.append((f"n{i}", f"n{(i * 7 + 3) % 60}"))
        if i % 3 == 0:
            edges.append((f"n{i}", "hub"))
        if i % 5 == 0:
            edges.append(("hub", f"n{i}"))
        if i % 11 == 0:
            edges.append((f"n{i}", f"dead{i}"))  # dead* have no out-edges
    e = spark.createDataFrame(edges, "src string, dst string")
    # relative tol: 1e-6 of the uniform rank; ~0.85^k contraction
    got = {r["node"]: r["rank"] for r in
           pagerank(e, tol=1e-6, max_iter=150).collect()}
    exp = _np_pagerank(edges, tol=1e-6, max_iter=150)
    assert set(got) == set(exp)
    assert max(abs(got[k] - exp[k]) for k in exp) < 1e-7
    # mass conservation despite the dangling sinks
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub is the most authoritative node
    assert got["hub"] == max(got.values())


def test_duplicate_edges_collapse(spark):
    e1 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")],
        "src string, dst string")
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    g1 = {r["node"]: r["rank"] for r in pagerank(e1).collect()}
    g2 = {r["node"]: r["rank"] for r in pagerank(e2).collect()}
    assert g1 == g2


def test_guards_and_nonconvergence(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(RuntimeError, match="did NOT converge"):
        pagerank(e, max_iter=1, tol=1e-300)
    # strict=False warns instead and still returns a frame
    out = pagerank(e, max_iter=1, tol=1e-300, strict=False)
    assert abs(sum(r["rank"] for r in out.collect()) - 1.0) < 1e-9


def test_domain_authority_composition(spark):
    """Everyone links to hub.com; hub links back to one site only —
    hub.com must outrank everything, and self-links are dropped."""
    docs = spark.createDataFrame(
        [
            ("site1.com", "see https://hub.com/a and https://site2.com/x"),
            ("site2.com", "see https://hub.com/b"),
            ("site3.com", "see https://hub.com/c and https://site3.com/me"),
            ("hub.com", "back to https://site1.com/y"),
        ],
        "source_domain string, text string",
    )
    got = {r["node"]: r["rank"] for r in domain_authority(docs).collect()}
    assert set(got) == {"site1.com", "site2.com", "site3.com", "hub.com"}
    assert got["hub.com"] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_domain_authority_src_folds_like_dst(spark):
    """A source_domain with a subdomain ('www.site1.com', 'blog.hub.com')
    must fold to the same registered-domain node its inbound links use —
    otherwise one site splits into two graph nodes and the self-link
    drop stops working (round-5 review finding)."""
    docs = spark.createDataFrame(
        [
            ("www.site1.com", "self https://site1.com/me and "
                              "out https://hub.com/a"),
            ("blog.hub.com", "back to https://www.site1.com/y"),
        ],
        "source_domain string, text string",
    )
    got = {r["node"]: r["rank"] for r in domain_authority(docs).collect()}
    # exactly two folded nodes; the www/blog variants never appear, and
    # the site1->site1 self-link was dropped (else site1 would hoard rank)
    assert set(got) == {"site1.com", "hub.com"}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert abs(got["site1.com"] - got["hub.com"]) < 1e-9  # symmetric 2-cycle