"""Connected components / dedup clustering vs a python union-find."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gorillaspark.operators.cluster import connected_components, dedup_clusters


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items()
            for n in members}


def test_connected_components_random_graph(spark):
    rng = np.random.default_rng(3)
    n_nodes, n_edges = 300, 260
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, n_nodes, (n_edges, 2)) if a != b]
    nodes = sorted({x for e in edges for x in e})
    exp = _uf_components(edges, nodes)
    got = (connected_components(
        spark.createDataFrame(edges, "src long, dst long"))
        .toPandas().set_index("node")["component"].to_dict())
    assert got == exp


def test_connected_components_long_chain(spark):
    # a 64-node path: stresses pointer doubling (O(log n) rounds);
    # plain 1-hop propagation would need 64 rounds and trip max_iter
    edges = [(i, i + 1) for i in range(63)]
    got = (connected_components(
        spark.createDataFrame(edges, "src long, dst long"), max_iter=10)
        .toPandas())
    assert (got["component"] == 0).all()
    assert len(got) == 64


def test_dedup_clusters_keep_flags(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 3)], "doc_a long, doc_b long")
    out = dedup_clusters(docs, pairs).toPandas().set_index("doc_id")
    assert out.loc[[1, 4, 7], "cluster_id"].tolist() == [1, 1, 1]
    assert out.loc[[2, 3], "cluster_id"].tolist() == [2, 2]
    assert out.loc[[1, 4, 7], "cluster_size"].tolist() == [3, 3, 3]
    # singletons keep themselves
    assert out.loc[0, "cluster_id"] == 0 and out.loc[0, "cluster_size"] == 1
    assert bool(out.loc[1, "keep"]) and not bool(out.loc[4, "keep"])
    assert int(out["keep"].sum()) == 7  # 10 docs - 3 dropped dupes
