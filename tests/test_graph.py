"""Connected-components / dedup-cluster operator tests
(operators/graph.py): chain graphs that need multiple propagation
sweeps, multi-component separation, and canonical-survivor election.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_chain_converges_to_single_component(spark):
    # 0-1-2-3-4-5: diameter 5 forces several propagation sweeps.
    pairs = _pairs(spark, [(i, i + 1) for i in range(5)])
    labels = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert labels == {i: 0 for i in range(6)}


def test_components_stay_separate(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    labels = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_metadata(spark):
    pairs = _pairs(spark, [(5, 9), (9, 7), (100, 101)])
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_canonical"]
    assert rows[7]["cluster_id"] == 5 and not rows[7]["is_canonical"]
    assert rows[9]["cluster_size"] == 3
    assert rows[100]["cluster_id"] == 100 and rows[100]["cluster_size"] == 2
    # exactly one canonical per cluster
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert sorted(c["cluster_id"] for c in canon) == [5, 100]


def test_edge_direction_irrelevant(spark):
    a = connected_components(_pairs(spark, [(3, 8), (8, 4)])).collect()
    b = connected_components(_pairs(spark, [(8, 3), (4, 8)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_star_algorithm_handles_long_chain(spark):
    """Kiveris large/small-star: a diameter-60 chain (which min-label
    propagation cannot finish in its default sweep budget) resolves in
    O(log n) rounds."""
    from lavasmart_bank_sync_etl_spark.operators.graph import (
        large_small_star_components,
    )

    pairs = _pairs(spark, [(i, i + 1) for i in range(60)])
    labels = {r["node"]: r["comp"] for r in large_small_star_components(pairs).collect()}
    assert labels == {i: 0 for i in range(61)}


def test_propagation_raises_instead_of_wrong_labels(spark):
    """Exhausting max_iter must raise — silently returning split
    components would elect several canonical survivors for one true
    cluster."""
    import pytest

    pairs = _pairs(spark, [(i, i + 1) for i in range(60)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=5)


def test_star_and_propagation_agree(spark):
    """Both algorithms share the (node, comp=component-min) contract."""
    from lavasmart_bank_sync_etl_spark.operators.graph import (
        large_small_star_components,
    )

    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (40, 41), (5, 3)]
    pairs = _pairs(spark, edges)
    a = sorted(map(tuple, connected_components(pairs).collect()))
    b = sorted(map(tuple, large_small_star_components(pairs).collect()))
    assert a == b


def test_dedup_clusters_star_on_chain(spark):
    """dedup_clusters defaults to the diameter-independent path."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(30)])
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[0]["is_canonical"] and rows[0]["cluster_size"] == 31
    assert all(rows[i]["cluster_id"] == 0 for i in range(31))
