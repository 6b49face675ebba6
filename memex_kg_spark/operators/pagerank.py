"""Personalized PageRank as a DataFrame power iteration.

Reference parity: ``gds.pageRank.stream(maxIterations: 10, dampingFactor:
0.85, sourceNodes: [seed])`` (db/db_search.py:291-316). Semantics used
here (and by the SQL oracle, which unrolls the same 10 iterations):

    rank_0(v)     = 1.0 if v == seed else 0.0
    rank_{i+1}(v) = (1-d) * [v == seed]
                    + d * sum_{u -> v} rank_i(u) / out_degree(u)

Dangling mass is dropped (nodes with no out-edges leak rank), matching
the simple streaming formulation. Each iteration is one join + one
groupBy shuffle; ``localCheckpoint`` truncates lineage so the 10-step
plan stays flat. Ranks/degrees are broadcast-sized relative to the edge
fact table, so the per-iteration join broadcasts the rank vector when
small and falls back to a shuffle join (AQE decides) when not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def personalized_pagerank(edges: DataFrame, seed: str, iterations: int = 10,
                          damping: float = 0.85, src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """Return (id, rank) after ``iterations`` power steps from ``seed``."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = (e.select(F.col("u").alias("id"))
             .union(e.select(F.col("v").alias("id")))
             .distinct()
             .localCheckpoint())
    deg = e.groupBy("u").agg(F.count("*").alias("out_deg"))
    e_deg = e.join(deg, "u").localCheckpoint()

    ranks = nodes.withColumn(
        "rank", F.when(F.col("id") == seed, 1.0).otherwise(0.0))
    base = F.when(F.col("id") == seed, 1.0 - damping).otherwise(0.0)

    for _ in range(iterations):
        contrib = (e_deg.join(ranks.withColumnRenamed("id", "u"), "u")
                   .select(F.col("v").alias("id"),
                           (F.col("rank") / F.col("out_deg"))
                           .alias("c"))
                   .groupBy("id").agg(F.sum("c").alias("inflow")))
        ranks = (nodes.join(contrib, "id", "left")
                 .select("id",
                         (base + F.lit(damping)
                          * F.coalesce(F.col("inflow"), F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks


def ppr_topk(edges: DataFrame, seed: str, k: int = 10,
             iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """T5: top-k by rank (rounded for cross-engine comparability),
    deterministic id tie-break."""
    r = personalized_pagerank(edges, seed, iterations, damping)
    return (r.select("id", F.round("rank", 8).alias("rank"))
            .filter(F.col("rank") > 0)
            .orderBy(F.col("rank").desc(), F.col("id").asc())
            .limit(k))


def ppr_subgraph(edges: DataFrame, seed: str, k: int = 10,
                 iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """J9: the 1-hop neighborhood expansion of the PPR top-k (reference
    get_ppr_subgraph, db/db_search.py:319-340) — edges with either
    endpoint in the top-k set."""
    top = ppr_topk(edges, seed, k, iterations, damping).select("id")
    by_src = edges.join(top.withColumnRenamed("id", "src"), "src",
                        "left_semi")
    by_dst = edges.join(top.withColumnRenamed("id", "dst"), "dst",
                        "left_semi")
    return (by_src.unionByName(by_dst)
            .dropDuplicates(["src", "pred", "dst"]))


def unrolled_ppr_sql(edges_cte: str, seed: str, iterations: int = 10,
                     damping: float = 0.85,
                     seed_expr: str | None = None) -> str:
    """Generate the DuckDB oracle: the SAME power iteration unrolled into
    pr0..prN CTEs (no recursion — aggregation per step is plain SQL).
    ``edges_cte`` must define a relation ``pedges(u, v)``. ``seed_expr``
    (a SQL scalar expression, e.g. a subquery) overrides the quoted
    ``seed`` literal so a composed query can derive the seed inside SQL
    (the EP3 search-prefix oracle)."""
    d = damping
    sd = seed_expr if seed_expr is not None else f"'{seed}'"
    parts = [edges_cte, f"""
pnodes AS MATERIALIZED (SELECT DISTINCT id FROM (
    SELECT u AS id FROM pedges UNION ALL SELECT v AS id FROM pedges)),
pdeg AS MATERIALIZED (SELECT u, count(*) AS out_deg FROM pedges GROUP BY u),
pr0 AS (SELECT id, CASE WHEN id = {sd} THEN 1.0 ELSE 0.0 END AS rank
        FROM pnodes)"""]
    for i in range(iterations):
        parts.append(f"""
pr{i + 1} AS MATERIALIZED (
    SELECT n.id,
           CASE WHEN n.id = {sd} THEN {1 - d} ELSE 0.0 END
           + {d} * coalesce(c.inflow, 0.0) AS rank
    FROM pnodes n LEFT JOIN (
        SELECT e.v AS id, sum(p.rank / g.out_deg) AS inflow
        FROM pedges e
        JOIN pr{i} p ON e.u = p.id
        JOIN pdeg g ON e.u = g.u
        GROUP BY e.v) c ON n.id = c.id)""")
    return ",".join(parts) + f"\n, ppr AS (SELECT id, round(rank, 8) AS rank FROM pr{iterations} WHERE round(rank, 8) > 0)"
