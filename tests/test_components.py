"""Connected-components property tests vs a driver-side union-find."""

from __future__ import annotations

import random

from datasketches_server_spark.operators.components import (
    attach_singletons,
    connected_components,
)
from datasketches_server_spark.plans.oracle import union_find_clusters


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        nodes = [f"n{i:03d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(20, 140))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["a", "b"])
        labels = {r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()}
        want = union_find_clusters(edges)
        assert labels == want, f"trial {trial}"


def test_cc_chain_and_star_topologies(spark):
    # long chain: worst case for naive propagation, fine for star ops
    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(40)]
    df = spark.createDataFrame(chain, ["a", "b"])
    labels = {r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert set(labels.values()) == {"c00"}
    # star
    star = [("hub", f"s{i}") for i in range(25)]
    df2 = spark.createDataFrame(star, ["a", "b"])
    labels2 = {r["conv_id"]: r["cluster_id"] for r in connected_components(df2).collect()}
    assert set(labels2.values()) == {"hub"}


def test_attach_singletons_covers_all(spark):
    edges = spark.createDataFrame([("a", "b")], ["a", "b"])
    labels = connected_components(edges)
    all_nodes = spark.createDataFrame([("a",), ("b",), ("z",)], ["conv_id"])
    out = {r["conv_id"]: r["cluster_id"] for r in attach_singletons(labels, all_nodes).collect()}
    assert out == {"a": "a", "b": "a", "z": "z"}


def test_distributed_star_loop_matches_driver_union_find(spark):
    """driver_threshold=0 forces the distributed large/small-star loop;
    both execution paths must produce the identical min-id labeling."""
    rng = random.Random(11)
    nodes = [f"m{i:03d}" for i in range(150)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(160)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["a", "b"])
    dist = {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    drv = {r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert dist == drv == union_find_clusters(edges)
