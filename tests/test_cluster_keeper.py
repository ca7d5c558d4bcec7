"""Connected-component cluster resolution (operators/dedup.cluster_keepers):
transitive chains, partition invariance, and equality with a python
union-find twin on the fixture's real near-dup pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators import dedup as D


def _resolve(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r["doc_id"]: r["keeper_id"]
        for r in D.cluster_keepers(df).collect()
    }


def test_transitive_chain_and_isolated_pair(spark):
    # 1-2-3-4 is one chain (diameter 3 — needs >1 propagation round);
    # 10-11 is separate; 20-21, 21-22, 20-22 a triangle
    got = _resolve(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_long_path_converges(spark):
    # a 40-node path: worst-case diameter for min-label propagation
    pairs = [(i, i + 1) for i in range(40)]
    got = _resolve(spark, pairs)
    assert got == {i: 0 for i in range(41)}


def test_partition_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 30, 2)] + [(5, 100), (100, 101)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = sorted(map(tuple, D.cluster_keepers(df).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        b = sorted(map(tuple, D.cluster_keepers(df).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_matches_union_find_on_fixture_pairs(spark, sf_dir):
    """Drive the REGISTERED op (ngram-jaccard pairs → clusters) and
    compare with a sequential union-find over the same pairs."""
    from storm_focused_crawler_spark.plans.pipeline_ops import (
        dedup_cluster_keeper,
        dedup_ngram_jaccard,
    )

    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b").collect()
    ]
    assert pairs, "fixture produced no near-dup pairs — test is vacuous"
    want = _union_find(pairs)
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup_cluster_keeper(spark, sf_dir).collect()
    }
    assert got == want
