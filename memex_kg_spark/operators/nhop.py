"""Iterative n-hop frontier expansion (G1).

The reference walks Wikidata depth-first one HTTP GET at a time with a
global visited set (get_wiki_entity_rec / already_present,
ingestion/recursive_hops_ingestion.py:167-201, db/db_connection.py:
241-250). The distributed form is breadth-first set semantics:

    visited_0  = seeds
    frontier_0 = seeds
    frontier_k = distinct(dst of edges from frontier_{k-1}) ANTI-JOIN visited
    visited_k  = visited_{k-1} UNION frontier_k

Each hop is one join + one anti-join (both on the node-id key);
``localCheckpoint`` per hop truncates lineage. Returns every reached node
with its minimum hop distance — deterministic regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def n_hop_expand(edges: DataFrame, seeds: list[str], hops: int,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, hop) for all nodes within ``hops`` of ``seeds`` (hop = min
    distance; seeds at hop 0). Follows OUTGOING edges, matching the
    reference's father->son recursion direction."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    visited = spark.createDataFrame([(s, 0) for s in seeds],
                                    ["id", "hop"]).localCheckpoint()
    frontier = visited
    for k in range(1, hops + 1):
        nxt = (e.join(frontier.withColumnRenamed("id", "u"), "u")
               .select(F.col("v").alias("id")).distinct()
               .join(visited.select("id"), "id", "left_anti")
               .withColumn("hop", F.lit(k)))
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def unrolled_nhop_sql(seeds: list[str], hops: int) -> str:
    """DuckDB oracle: the same BFS unrolled (expects a ``pedges(u, v)``
    CTE in scope). Produces a CTE ``nhop(id, hop)``."""
    seed_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS id, 0 AS hop" for s in seeds)
    parts = [f"v0 AS (SELECT DISTINCT id, hop FROM ({seed_rows}))"]
    for k in range(1, hops + 1):
        parts.append(f"""
f{k} AS MATERIALIZED (
    SELECT DISTINCT e.v AS id, {k} AS hop
    FROM pedges e JOIN v{k - 1} p ON e.u = p.id
    WHERE e.v NOT IN (SELECT id FROM v{k - 1})),
v{k} AS MATERIALIZED (
    SELECT id, hop FROM v{k - 1} UNION ALL SELECT id, hop FROM f{k})""")
    return (",".join(parts)
            + f", nhop AS (SELECT id, hop FROM v{hops})")
