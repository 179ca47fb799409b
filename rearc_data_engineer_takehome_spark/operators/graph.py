"""Graph analytics as DataFrame transformations: co-occurrence graph
construction + PageRank power iteration.

The reference has no graph surface; this is extension tier next to
``dedup.cluster_pairs`` (connected components). The pattern shared by
both: iterate joins over the EDGE relation, never materialize anything
quadratic in the node count, and keep per-round lineage bounded.

Determinism contract (same one that makes k-means oracle-able,
operators/similarity.py): ranks are rounded to 8dp after every
iteration on both engines, so ranking/threshold decisions downstream
see identical operands despite engine-specific double-summation
order. The DuckDB oracle replays the iterations as unrolled CTEs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Directed edge list (both directions) between items co-occurring
    in an order — the simple graph (DISTINCT pairs, no self-loops).

    Scale shape: the self-join is keyed on the order — per-task pair
    fan-out is bounded by order size squared (single digits per order),
    never by the catalog. One shuffle on the order key; the distinct
    folds repeated co-purchases."""
    items = lineitem.select(order_col, item_col).distinct()
    a = items.select(F.col(order_col).alias("o"), F.col(item_col).alias("src"))
    b = items.select(F.col(order_col).alias("o"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "o")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85, round_to: int = 8
) -> DataFrame:
    """PageRank power iteration over a directed edge list.

    Per iteration: contributions flow along edges (rank/out-degree,
    one shuffle keyed on dst), fold into the damped update, round. The
    node-count normalizer is a single driver scalar (one count — a
    bounded aggregate at any graph size). Nodes without in-edges keep
    the teleport mass. Returns (node, rank) after ``iters`` rounds
    from a uniform 1/N start.

    At 100 TB graph scale the edge relation dominates; each round is
    one join + one aggregate on it — O(iters) passes, no per-node
    state beyond the (node, rank) table. Dangling mass redistribution
    (nodes with NO out-edges) is deliberately omitted: co-occurrence
    graphs are symmetric so every node has out-degree ≥ 1; a directed
    web-style graph would add the dangling-sum scalar per round.
    """
    # edges feeds nodes + outdeg + every iteration's contribution join;
    # without materialization each reference re-runs the edge build
    # (e.g. the co-purchase self-join) — measured 55 exchanges -> 13
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n = nodes.count()
    init = round(1.0 / n, round_to)
    ranks = nodes.select("node", F.lit(init).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, edges.src == outdeg.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("c", F.lit(0.0)),
                round_to,
            ).alias("rank"),
        )
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 8,
    node_alias: str = "node",
) -> str:
    """DuckDB SQL replaying :func:`pagerank` over ``edges_cte`` (a CTE
    body producing (src, dst)) — iterations unrolled, same rounding."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        "deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        f"r0 AS (SELECT node, round(1.0 / nn.n, {round_to}) AS rank"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT nd.node,"
            f" round((1 - {damping}) / nn.n + {damping} * coalesce(s.c, 0),"
            f" {round_to}) AS rank"
            f" FROM nodes nd CROSS JOIN nn LEFT JOIN ("
            f" SELECT e.dst AS node, sum(r.rank / d.outdeg) AS c"
            f" FROM edges e JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN deg d ON d.node = e.src GROUP BY e.dst"
            f" ) s ON s.node = nd.node)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node AS {node_alias}, rank FROM r{iters}"
    )
