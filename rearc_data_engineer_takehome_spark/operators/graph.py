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

    Scale shape: one groupBy folds each order into a sorted DISTINCT
    item set (collect_set dedups on the same exchange), then C(k,2)
    ordered pairs are generated IN-ROW from the sorted array — k is the
    per-order item count (single digits), so fan-out is bounded per
    order, never by the catalog. Only the src<dst half is shuffled
    through the pair distinct; the mirror direction is a map-side
    union. Replaces the round-1 basket self-join (distinct + two-sided
    order-key join): 2 exchanges instead of 4, measured 4.9 s -> ~2 s
    at sf0.1."""
    sets = lineitem.groupBy(order_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("items")
    )
    pair_expr = (
        "flatten(transform(items, (x, i) ->"
        " transform(slice(items, i + 2, size(items)),"
        " y -> struct(x AS src, y AS dst))))"
    )
    half = (
        sets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.src", "p.dst")
        .distinct()
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    round_to: int = 8,
    broadcast_ranks: bool | None = None,
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
    # (e.g. the co-purchase self-join) — measured 55 exchanges -> 13.
    # Round 2: out-degree is pre-JOINED into the edge relation once and
    # the result hash-partitioned on src BEFORE the checkpoint —
    # localCheckpoint preserves outputPartitioning, so every iteration's
    # contribution join reuses that one exchange instead of re-shuffling
    # the edge side (and the per-iteration outdeg join disappears
    # entirely): 13 exchanges -> ~1 per iteration (the dst groupBy,
    # which is inherent to rank flow along edges).
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    # out-degree is one row per node with out-edges — catalog-sized, so
    # its checkpoint is a cheap insurance against re-aggregating the
    # edge relation every iteration
    outdeg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint()
    )
    n = nodes.count()
    # The rank table is exactly one row per node. While it fits a
    # broadcast (node catalog, not fact scale), ship it to the edge
    # partitions instead of shuffling the edge relation's join side —
    # each iteration then costs ONE exchange (the dst groupBy, inherent
    # to rank flow) plus small broadcast builds, and the weighted-edge
    # relation stays LAZY (a broadcast join over the checkpointed edge
    # blocks — materializing it costs more than re-reading). Past the
    # threshold the shuffle path takes over: weighted edges are
    # materialized hash(src)-partitioned ONCE, so every iteration
    # reuses that single exchange instead of re-shuffling edges.
    if broadcast_ranks is None:
        broadcast_ranks = n <= 2_000_000
    if broadcast_ranks:
        _b = F.broadcast
        wedges = edges.join(F.broadcast(outdeg), edges.src == outdeg.node).select(
            "src", "dst", "outdeg"
        )
    else:
        _b = lambda df: df  # noqa: E731
        shuffle_parts = edges.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"
        )
        wedges = (
            edges.join(outdeg, edges.src == outdeg.node)
            .select("src", "dst", "outdeg")
            .repartition(int(shuffle_parts), "src")
            .localCheckpoint()
        )
    init = round(1.0 / n, round_to)
    ranks = nodes.select("node", F.lit(init).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            wedges.join(_b(ranks), wedges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # division (not reciprocal multiply): bit-identical to
                # the oracle's r.rank / d.outdeg
                (F.col("rank") / F.col("outdeg")).alias("w"),
            )
            .groupBy("node")
            .agg(F.sum("w").alias("c"))
        )
        ranks = nodes.join(_b(contrib), "node", "left").select(
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
    # Interpolate the PRECOMPUTED Python double: DuckDB evaluates the
    # literal (1 - 0.85) in DECIMAL to exactly 0.15, while Spark adds
    # the Python double 1.0-0.85 = 0.15000000000000002 — a last-ulp
    # divergence that could flip an 8dp rounding boundary.
    teleport = 1.0 - damping
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT nd.node,"
            f" round({teleport!r}::DOUBLE / nn.n + {damping} * coalesce(s.c, 0),"
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
