"""Per-operator unit tests (SURVEY.md §5 strategy)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from memex_kg_spark.operators.canonicalize import salted_counts
from memex_kg_spark.operators.components import connected_components
from memex_kg_spark.operators.extraction import (
    extract_statements,
    extract_statements_sql,
)
from memex_kg_spark.functions.geo import haversine_km
from memex_kg_spark.pipeline import load_synth
from memex_kg_spark.synth.vocab import clean_label


def test_pandas_vs_sql_extraction(spark, sf_dir_smoke):
    """The mapInPandas stage and its whole-stage-codegen twin must agree
    row-for-row (same statements, offsets, ordering keys)."""
    tr = load_synth(spark, sf_dir_smoke)["transcripts"]
    cols = ["conv_id", "turn_idx", "sent_idx", "subj_surface", "phrase",
            "obj_surface", "subj_start", "obj_start"]
    a = extract_statements(tr).toPandas()[cols]
    b = extract_statements_sql(tr).toPandas()[cols]
    key = lambda d: sorted(map(tuple, d.astype(str).values))  # noqa: E731
    assert key(a) == key(b)


def test_salted_counts_equals_plain(spark, sf_dir_smoke):
    tr = load_synth(spark, sf_dir_smoke)["transcripts"]
    plain = (tr.groupBy("role").count()
             .withColumnRenamed("count", "n").toPandas())
    salted = salted_counts(tr, "role", n_salts=8).toPandas()
    a = plain.sort_values("role").reset_index(drop=True)
    b = salted.sort_values("role").reset_index(drop=True)
    assert (a["role"] == b["role"]).all()
    assert (a["n"].astype(int) == b["n"].astype(int)).all()


def test_connected_components_fixture(spark):
    """F5 fixture: two components (ring of 4 + star with hot hub of 5),
    plus two singleton-free isolates via a bridge; golden labels = min id."""
    edges = [
        # ring: a-b-c-d-a
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        # star with hub h: h-x1..x4, and a chain tail x4-y1-y2
        ("h", "x1"), ("h", "x2"), ("h", "x3"), ("h", "x4"),
        ("x4", "y1"), ("y1", "y2"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "h": "h", "x1": "h", "x2": "h", "x3": "h", "x4": "h",
        "y1": "h", "y2": "h",
    }
    # distributed hash-min loop (the scale path)
    got_dist = {r["id"]: r["component"]
                for r in connected_components(
                    df, force_distributed=True).collect()}
    assert got_dist == want
    # driver union-find fast path (dimension-sized graphs)
    got_drv = {r["id"]: r["component"]
               for r in connected_components(df).collect()}
    assert got_drv == want


def test_haversine_known_value(spark):
    """Paris (48.8566, 2.3522) to Rome (41.9028, 12.4964) ~= 1105.76 km."""
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522),
                     F.lit(41.9028), F.lit(12.4964)).alias("d"))
    d = df.collect()[0]["d"]
    assert math.isclose(d, 1105.76, rel_tol=0.005), d


def test_clean_label_reference_rules():
    """P7 parity: strip non-alnum (keeping space/newline/dot), spaces->_,
    '3'->'three' — exact order (recursive_hops_ingestion.py:53-55)."""
    assert clean_label("located in") == "located_in"
    assert clean_label("adjoins (3rd ed.)") == "adjoins_threerd_ed."
    assert clean_label("architect #3") == "architect_three"
    assert clean_label("a,b;c") == "abc"


def test_determinism_across_partitionings(spark, sf_dir_smoke):
    """Same input at 1 vs 16 partitions -> identical sorted triple set
    (the sandbox stand-in for N vs 4N executors determinism)."""
    from memex_kg_spark.pipeline import extract_triples

    d = load_synth(spark, sf_dir_smoke)
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_type"]
    t1 = extract_triples(d["transcripts"].repartition(1), d["alias_dim"],
                         d["pred_dim"]).toPandas()[cols]
    t16 = extract_triples(d["transcripts"].repartition(16), d["alias_dim"],
                          d["pred_dim"]).toPandas()[cols]
    key = lambda x: sorted(map(tuple, x.astype(str).values))  # noqa: E731
    assert key(t1) == key(t16)


def test_synth_determinism():
    from memex_kg_spark.synth import gen_conv_batch

    a = gen_conv_batch(range(5))
    b = gen_conv_batch(range(5))
    pd.testing.assert_frame_equal(a, b)
    # unique (conv_id, turn_idx)
    assert not a.duplicated(["conv_id", "turn_idx"]).any()


def test_synth_edge_cases():
    from memex_kg_spark.synth import gen_conv_batch

    df = gen_conv_batch(range(200))
    texts = df["text"]
    assert (texts == "").any(), "needs empty-text turns"
    assert (texts == "...").any(), "needs punctuation-only turns"
    assert texts.str.contains('"quoted"', regex=False).any()
    assert texts.str.contains("a\\b", regex=False).any()
    assert texts.str.contains("café", regex=False).any()
