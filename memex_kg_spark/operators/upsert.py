"""Key-wise upsert (MERGE) — the reference's update/edit semantics.

The reference mutates stored entities in place: ``edit_story`` rewrites a
Story node's properties (db/db_connection.py:305-330) and the property
rewriter SETs/REMOVEs node fields (db/db_connection.py:174-203). Neo4j
gives it per-node MERGE; a set-oriented engine expresses the same thing
as a key-wise delete+insert:

    upsert(base, updates, keys) = (base ANTI JOIN updates ON keys)
                                  UNION ALL updates

Properties:
- idempotent: applying the same update batch twice equals once (the
  second anti-join removes the first batch's rows);
- last-writer-wins per key, matching the reference's SET semantics;
- scale: one broadcast anti-join when the update batch is small (the
  overwhelmingly common case — edits are human-driven), one shuffle
  join otherwise. At warehouse scale this is the Iceberg
  ``MERGE INTO``/copy-on-write pattern; partition pruning confines the
  rewrite to partitions that actually contain updated keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame,
           keys: list[str], broadcast_updates: bool = True) -> DataFrame:
    """Return ``base`` with rows whose key appears in ``updates`` replaced
    by the update rows (and brand-new keys appended). Schemas must match
    by name."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"upsert schema mismatch: base {sorted(base.columns)} vs "
            f"updates {sorted(updates.columns)}")
    key_side = updates.select(*keys)
    if broadcast_updates:
        key_side = F.broadcast(key_side)
    kept = base.join(key_side, keys, "left_anti")
    return kept.unionByName(updates)


def detach_delete(nodes: DataFrame, edges: DataFrame, victims: DataFrame,
                  key: str = "qid", src: str = "src", dst: str = "dst"
                  ) -> tuple[DataFrame, DataFrame]:
    """DETACH DELETE — the reference's delete path (``delete_story``,
    db/db_connection.py:348-361: ``MATCH (p:Story {sid}) DETACH DELETE
    p`` removes the node AND every relationship touching it; the clear-
    database path at :82 is the same verb unfiltered). Set-oriented
    form: anti-join the victims out of the node table, and out of BOTH
    endpoint columns of the edge table. The victim set is an edit-sized
    batch, so all three anti-joins broadcast — no fact-side shuffle at
    warehouse scale; with partitioned/bucketed storage the rewrite is
    the Iceberg MERGE/DELETE copy-on-write pattern confined to
    partitions holding victim keys."""
    v = victims.select(F.col(key))
    nodes2 = nodes.join(F.broadcast(v), [key], "left_anti")
    edges2 = (edges
              .join(F.broadcast(v.withColumnRenamed(key, src)),
                    [src], "left_anti")
              .join(F.broadcast(v.withColumnRenamed(key, dst)),
                    [dst], "left_anti"))
    return nodes2, edges2
