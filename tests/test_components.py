"""Distributed connected components vs a Python union-find oracle."""

from __future__ import annotations

import random

from skripsi_mapreduce_spark.operators.components import (
    connected_components,
    duplicate_groups,
)


def _py_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _py_components(edges)


def test_components_basic_shapes(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4)])  # chain
    _check(spark, [(1, 2), (1, 3), (1, 4)])  # star from min
    _check(spark, [(10, 4), (10, 7)])  # star from max
    _check(spark, [(1, 2), (3, 4), (5, 6)])  # three pairs
    _check(spark, [(8, 9), (9, 8), (8, 9)])  # duplicate/reversed edges


def test_components_long_chain_and_random(spark):
    chain = [(i, i + 1) for i in range(1, 60)]
    _check(spark, chain)
    rng = random.Random(11)
    nodes = list(range(1, 120))
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(150)]
    _check(spark, edges)


def test_duplicate_groups_vs_onepass_divergence(spark):
    """Component {2,3,10} with edges (3,10),(2,10): node 3 never appears
    as a greater pair id, so the one-pass rule keeps BOTH 2 and 3; the
    transitive rule keeps exactly the minimum."""
    pairs = spark.createDataFrame([(3, 10), (2, 10)], "id_a long, id_b long")
    groups = {
        (r["doc_id"], r["group_id"], r["is_keeper"])
        for r in duplicate_groups(pairs).collect()
    }
    assert groups == {(2, 2, True), (3, 2, False), (10, 2, False)}


def test_components_contracted_equals_pure_join_form(spark):
    """local_contract=True (partition-local union-find pre-pass) must be
    result-identical to the pure large-star/small-star form on a graph
    deliberately scattered across partitions."""
    rng = random.Random(7)
    nodes = list(range(1, 200))
    edges = [(i, i + 1) for i in range(1, 80)] + [
        tuple(rng.sample(nodes, 2)) for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(16)
    a = sorted(
        (r["node"], r["component"])
        for r in connected_components(df, local_contract=True).collect()
    )
    b = sorted(
        (r["node"], r["component"])
        for r in connected_components(df, local_contract=False).collect()
    )
    assert a == b and dict(a) == _py_components(edges)


def test_triangle_counts_known_graphs(spark):
    from skripsi_mapreduce_spark.operators.components import triangle_counts

    # K4: each node is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # triangle + pendant edge: pendant node has none and doesn't appear
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(tri).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
    # duplicate / reversed edges collapse
    dup = spark.createDataFrame([(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)], "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(dup).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_bounded_closure_matches_native_recursive_cte(spark):
    """bounded_closure (pointer doubling, one lazy plan) must be
    row-identical — bag semantics included — to Spark 4's native WITH
    RECURSIVE executor on the same graph, including a branching DAG
    (two children share a parent → duplicate (node,hop) rows per path)
    and the hop cap at a non-power-of-two."""
    from skripsi_mapreduce_spark.operators.components import bounded_closure

    # chain 1→2→3→4→5→6, branch 3→10→11, diamond 20→{21,22}→23
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
        (3, 10), (10, 11),
        (20, 21), (20, 22), (21, 23), (22, 23),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = spark.createDataFrame([(1,), (20,)], "root long")
    for cap in (3, 5, 8):
        e.createOrReplaceTempView("bc_edges")
        r.createOrReplaceTempView("bc_roots")
        native = spark.sql(
            f"""
            WITH RECURSIVE walk (node, root, hop) AS (
                SELECT root AS node, root, 0 AS hop FROM bc_roots
                UNION ALL
                SELECT e.dst, w.root, w.hop + 1
                FROM walk w JOIN bc_edges e ON e.src = w.node
                WHERE w.hop < {cap}
            )
            SELECT node, root, hop FROM walk
            """
        ).collect()
        got = bounded_closure(e, r, cap).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, native)), cap


def test_bounded_closure_random_graphs_vs_native(spark):
    """Seeded random sparse digraphs (including branch-out/branch-in and
    self-contained cycles): doubling must stay bag-identical to the
    native recursive-CTE executor — cycles bounded by the hop cap, path
    multiplicities preserved."""
    from skripsi_mapreduce_spark.operators.components import bounded_closure

    rng = random.Random(42)
    for trial in range(2):
        n = 30
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        roots = sorted(rng.sample(range(n), 3))
        e = spark.createDataFrame(edges, "src long, dst long")
        r = spark.createDataFrame([(x,) for x in roots], "root long")
        e.createOrReplaceTempView("bcr_edges")
        r.createOrReplaceTempView("bcr_roots")
        cap = 6
        native = spark.sql(
            f"""
            WITH RECURSIVE walk (node, root, hop) AS (
                SELECT root AS node, root, 0 AS hop FROM bcr_roots
                UNION ALL
                SELECT e.dst, w.root, w.hop + 1
                FROM walk w JOIN bcr_edges e ON e.src = w.node
                WHERE w.hop < {cap}
            )
            SELECT node, root, hop FROM walk
            """
        ).collect()
        got = bounded_closure(e, r, cap).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, native)), trial


def test_components_assume_distinct_edges_identical_labels(spark):
    """assume_distinct_edges skips only the input-sym distinct exchange;
    labels must be identical to the default on ordered unique edge
    lists (the caller contract) — across single-round star graphs,
    multi-round chains, and both local_contract settings."""
    rng = random.Random(23)
    nodes = list(range(1, 90))
    rand = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(110)}
    )
    cases = [
        [(1, 2), (2, 3), (3, 4)],                 # chain (needs rounds)
        [(1, 2), (1, 3), (1, 4)],                 # star from min
        [(i, i + 1) for i in range(1, 60)],       # long chain
        rand,                                      # random unique ordered
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        for lc in (True, False):
            base = {
                (r["node"], r["component"])
                for r in connected_components(df, local_contract=lc).collect()
            }
            fast = {
                (r["node"], r["component"])
                for r in connected_components(
                    df, local_contract=lc, assume_distinct_edges=True
                ).collect()
            }
            assert fast == base
            got = dict(fast)
            assert got == _py_components(edges)
