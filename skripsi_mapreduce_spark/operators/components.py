"""Distributed connected components over an edge list — the cluster
step of a near-duplicate pipeline (pairs → duplicate GROUPS, transitive).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame joins and aggregations:

- large-star: every node points its LARGER neighbors at its current
  minimum neighbor (or itself) — ``(v, min(N(v) ∪ {v}))`` for u > v's
  min; keeps the graph's components while shrinking tall stars.
- small-star: every node points itself and its smaller neighbors at the
  minimum — collapsing chains toward the component minimum.

Each round is two self-groupBys + a filter; convergence (no edge
changed) is checked with one count. The label of a component is its
SMALLEST node id — deterministic and stable under re-runs. Rounds are
O(log n) for real graphs; lineage is cut per round.

Scale: edges shuffle by node id only (two longs per row), never
payloads; the iteration count is logarithmic in the largest component's
diameter, and near-dup graphs are shallow (dup clusters are cliques or
near-cliques from the pair generator), so 2-4 rounds is typical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize + strip loops: both directions of every edge."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges`` — component = the
    smallest node id reachable from it. Isolated nodes don't appear
    (callers left-join and coalesce to the node's own id).
    """
    g = _sym(
        edges.select(F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst"))
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # large-star: for each u, attach neighbors v > u's min to m(u)
        m = g.groupBy("u").agg(F.min("v").alias("m"))
        m = m.select("u", F.least("u", "m").alias("m"))
        large = (
            g.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        g2 = _sym(large.select(F.col("u").alias("src"), F.col("v").alias("dst")))
        # small-star: for each u, attach u and its smaller neighbors to min
        m2 = g2.groupBy("u").agg(F.min("v").alias("m"))
        m2 = m2.select("u", F.least("u", "m").alias("m"))
        small = (
            g2.join(m2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )
        g_new = _sym(small.select(F.col("u").alias("src"), F.col("v").alias("dst"))).localCheckpoint(
            eager=True
        )
        # converged when the edge multiset is stable (star-contraction is
        # monotone, so equal counts + subset check reduces to anti-join)
        changed = g_new.join(g, ["u", "v"], "left_anti").limit(1).count()
        same_size = g_new.count() == g.count()
        g = g_new
        if changed == 0 and same_size:
            break

    # at convergence every edge is (node, component-min)
    labels = g.groupBy("u").agg(F.min("v").alias("component"))
    return labels.select(
        F.col("u").alias("node"),
        F.least("u", "component").alias("component"),
    )


def duplicate_groups(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → transitive duplicate groups:
    (doc_id, group_id, is_keeper) where group_id is the smallest member
    and exactly that member has ``is_keeper`` true — the row set a dedup
    pass needs to drop everything else."""
    comp = connected_components(pairs, src_col, dst_col)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )


def pagerank_e8(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    node_col: str = "node",
) -> DataFrame:
    """Weighted PageRank over an edge list, in pure int64 e8 fixed point
    so ranks are bit-identical across engines, runs, and partitionings
    (no float summation-order hazard — the repo's kmeans_fixedpoint
    convention applied to the power iteration).

    ``edges``: (src, dst, weight) with positive integer weights;
    ``nodes``: one row per node id (isolated nodes rank at the base).
    Per iteration each node sends ``(rank_e8 * w) div wout`` along every
    out-edge (truncating integer division, identical in Spark ``div``
    and DuckDB ``//`` for non-negative operands) and collects
    ``base + (damping_pct * Σ in-contrib) div 100``; dangling nodes'
    mass simply evaporates (the no-redistribution variant — documented,
    deterministic, and the common formulation for link-graph sketches).

    Scale: the edge table shuffles by src once per iteration (join with
    the 1-row-per-node rank table) and aggregates by dst — the standard
    Pregel-free DataFrame PageRank; ranks are narrow (node, long) and no
    driver collect happens at any size. Lineage is cut every
    ``checkpoint_every`` iterations, NOT every iteration: for shallow
    fixed loops Catalyst's ReusedExchange serves the repeated edge
    subtree from one shuffle and the plan stays cheap, while measured
    per-iteration localCheckpoints cost ~1-2s each in RDD conversion —
    4x the entire 3-iteration query. Deep loops still get periodic cuts
    so the plan can't grow unboundedly.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    checkpoint_every = 8
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank needs a non-empty node set")
    e8 = 10**8
    base = (100 - damping_pct) * e8 // (100 * n_nodes)
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
    ew = edges.join(out_w, "src")
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(e8 // n_nodes).cast("long").alias("rank_e8")
    )
    for i in range(n_iter):
        contrib = ew.join(ranks, ew["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr("(rank_e8 * weight) div wout").alias("c"),
        )
        agg = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.select(F.col(node_col).alias("node"))
            .join(agg, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank_e8"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
