"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (transcripts ->
mention detection -> entity linking -> canonicalization -> triples) at the
smoke scale. ``queries()`` exposes every implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives each a DuckDB-runnable ANSI-SQL twin
(the KG queries read the same deterministic synthetic parquet the Spark
side reads, via absolute read_parquet paths, so the comparison is
engine-vs-engine on identical bytes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the KG triple set over the sf0.001 synthetic
    transcript corpus (the BASELINE.json-mandated input shape)."""
    from memex_kg_spark.synth import ensure_synth
    from memex_kg_spark.pipeline import build_kg

    sf_dir = ensure_synth(0.001)
    return build_kg(spark, sf_dir)["triples"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from memex_kg_spark.queries.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from memex_kg_spark.queries.registry import all_oracle_sql

    return all_oracle_sql()
