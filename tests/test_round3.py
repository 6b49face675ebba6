"""Round-3 additions: registry fits the driver's 50-row CORRECTNESS
budget, the registered Jaccard is df-capped (hot-shingle anti-join in
the physical plan), and the merged multi-part rows keep every folded
operator value-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.harness import compare


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- registry budget ---------------------------------------------------------


def test_registry_fits_driver_budget():
    """Every registered key must get a CORRECTNESS row: the driver
    records at most DRIVER_ROW_BUDGET rows per round (r01/r02 truncated
    at exactly 50; r02 lost 13 keys past the cap)."""
    from memex_kg_spark.queries.registry import (DRIVER_ROW_BUDGET,
                                                 all_oracle_sql,
                                                 all_queries)
    qs = all_queries()
    assert len(qs) <= DRIVER_ROW_BUDGET
    # every key has an oracle except the deliberate rows-only DS tail
    missing = [k for k in qs if k not in all_oracle_sql()]
    assert missing == ["dominant_set_clusters"]


def test_rows_only_keys_front_loaded():
    """The rows-only + multimodal keys sit early so any future budget
    truncation hits SQL-checked tail keys first, never the weak ones."""
    from memex_kg_spark.queries.registry import all_queries
    keys = list(all_queries())
    assert keys.index("dominant_set_clusters") < 15
    assert keys.index("multimodal_features") < 15


# --- df-capped Jaccard is the REGISTERED form --------------------------------


def test_registered_jaccard_is_capped(spark, testdata_sf01):
    """The registered dedup_jaccard plan must contain the hot-shingle
    anti-join (the max_df cap) — no uncapped candidate bucket."""
    from memex_kg_spark.queries.vector import q_dedup_jaccard
    plan = _plan(q_dedup_jaccard(spark, testdata_sf01))
    assert "LeftAnti" in plan  # hot-shingle exclusion before the join
