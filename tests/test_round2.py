"""Round-2 additions: ANN oracles, composed geo-semantic search, SimHash
banding, scale-safe id assignment, Europeana cleaner, modularity, sinks,
df-capped Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.harness import compare


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- ANN oracle parity ------------------------------------------------------


def test_ann_lsh_matches_oracle(spark, testdata_sf01):
    from memex_kg_spark.queries.vector import SQL_ANN_LSH, q_ann_lsh_topk
    ok, msg = compare(q_ann_lsh_topk(spark, testdata_sf01), SQL_ANN_LSH,
                      testdata_sf01)
    assert ok, msg


def test_ann_ivf_matches_oracle(spark, testdata_sf01):
    from memex_kg_spark.queries.vector import SQL_ANN_IVF, q_ann_ivf_topk
    ok, msg = compare(q_ann_ivf_topk(spark, testdata_sf01), SQL_ANN_IVF,
                      testdata_sf01)
    assert ok, msg


def test_semantic_geo_matches_oracle_and_plans_topk(spark, testdata_sf01):
    from memex_kg_spark.queries.vector import (SQL_SEMANTIC_GEO,
                                               q_semantic_geo_topk)
    df = q_semantic_geo_topk(spark, testdata_sf01)
    # the reference's :237 Python-slice bug is absent: LIMIT is in-plan
    assert "TakeOrderedAndProject" in _plan(df)
    ok, msg = compare(df, SQL_SEMANTIC_GEO, testdata_sf01)
    assert ok, msg


# --- SimHash banding --------------------------------------------------------


def test_simhash_banding_no_cross_join(spark, testdata_sf01):
    from memex_kg_spark.operators.dedup import simhash_pairs
    docs = spark.read.parquet(f"{testdata_sf01}/documents.parquet")
    df = simhash_pairs(docs, max_hamming=8)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_banding_exact_recall(spark):
    """Pigeonhole banding is exact: banded pairs == brute-force pairs."""
    from memex_kg_spark.operators.dedup import simhash, simhash_pairs
    rows = [(i, f"alpha beta gamma delta {'epsilon' if i % 3 else 'zeta'} "
                f"token{i % 5}") for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = sorted(
        (a, b, bin(fp[a] ^ fp[b]).count("1"))
        for a in fp for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 6)
    got = sorted(map(tuple, simhash_pairs(docs, max_hamming=6)
                     .select("a_id", "b_id", "hamming").collect()))
    assert got == want


# --- df-capped Jaccard ------------------------------------------------------


def test_jaccard_df_cap_bound(spark):
    """Capped candidates lose ONLY pairs whose entire overlap is hot
    shingles; survivors keep exact J."""
    from memex_kg_spark.operators.dedup import jaccard_pairs
    stop = "the quick brown"  # shared 3-shingle across every doc
    rows = [(i, f"the quick brown fox{i % 2} jumps{i % 2} high{i % 2}")
            for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in jaccard_pairs(docs, 0.1).collect()}
    capped = {(r["a_id"], r["b_id"]): r["jaccard"]
              for r in jaccard_pairs(docs, 0.1, max_df=6).collect()}
    assert set(capped) <= set(exact)
    for k, v in capped.items():
        assert v == exact[k]  # J recomputed over FULL sets
    # same-parity docs share non-hot shingles -> must survive the cap
    assert (0, 2) in capped


# --- scale-safe id assignment -----------------------------------------------


def test_assign_global_ids_matches_global_window(spark):
    from pyspark.sql import Window
    from memex_kg_spark.operators.ids import assign_global_ids
    rows = [(i, f"name_{i % 7}_{i}") for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "name"])
    w = Window.orderBy("name", "k")
    want = {(r["k"], r["rid"]) for r in
            df.withColumn("rid", F.row_number().over(w)).collect()}
    got_df = assign_global_ids(df, ["name", "k"], out="rid", n_parts=8)
    got = {(r["k"], r["rid"]) for r in got_df.collect()}
    assert got == want
    # the whole point: no single-partition exchange in the plan
    assert "Exchange SinglePartition" not in _plan(got_df)


def test_minmax_ids_plan_is_partitioned(spark, testdata_sf01):
    from memex_kg_spark.queries.relational import q_minmax_ids
    plan = _plan(q_minmax_ids(spark, testdata_sf01))
    # the row-number window must partition by _pid (range buckets), not
    # run globally; the only single-partition exchange allowed is the
    # metadata-sized final step of the scalar MAX aggregate
    assert "windowspecdefinition(_pid" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "rangepartitioning" in plan.lower()


# --- service / P4 / P5 / A6 / S10 / G6 -------------------------------------


def test_europeana_clean_oracle(spark, testdata_sf01):
    from memex_kg_spark.queries.service import (SQL_EUROPEANA,
                                                q_europeana_clean)
    ok, msg = compare(q_europeana_clean(spark, testdata_sf01),
                      SQL_EUROPEANA, testdata_sf01)
    assert ok, msg


def test_latlon_validity_oracle(spark, testdata_sf01):
    from memex_kg_spark.queries.service import SQL_LATLON, q_latlon_validity
    df = q_latlon_validity(spark, testdata_sf01)
    rows = {r["valid"]: r["n"] for r in df.collect()}
    assert set(rows) == {True, False}  # predicate partitions both ways
    ok, msg = compare(df, SQL_LATLON, testdata_sf01)
    assert ok, msg


def test_ordered_distinct_oracle(spark, testdata_sf01):
    """A6 now rides in the merged doc_fingerprint row (textq)."""
    from memex_kg_spark.queries.textq import SQL_FINGERPRINT, q_fingerprint
    ok, msg = compare(q_fingerprint(spark, testdata_sf01),
                      SQL_FINGERPRINT, testdata_sf01)
    assert ok, msg


def test_image_sink_oracle_and_idempotent(spark, testdata_sf01):
    from memex_kg_spark.queries.service import SQL_IMAGE_SINK, q_image_sink
    ok, msg = compare(q_image_sink(spark, testdata_sf01), SQL_IMAGE_SINK,
                      testdata_sf01)
    assert ok, msg
    # second run writes nothing new, returns the same manifest
    again = q_image_sink(spark, testdata_sf01).count()
    assert again == 50


def test_graph_modularity_oracle(spark, testdata_sf01):
    from memex_kg_spark.queries.service import (q_graph_modularity,
                                                sql_graph_modularity)
    from memex_kg_spark.synth.generator import synth_dir
    ok, msg = compare(q_graph_modularity(spark, testdata_sf01),
                      sql_graph_modularity(synth_dir(0.01)),
                      testdata_sf01)
    assert ok, msg


def test_search_prefix_oracle_and_determinism(spark, testdata_sf01):
    from memex_kg_spark.queries.service import (q_search_prefix,
                                                sql_search_prefix)
    from memex_kg_spark.synth.generator import synth_dir
    df = q_search_prefix(spark, testdata_sf01)
    a = [tuple(r) for r in df.collect()]
    b = [tuple(r)
         for r in q_search_prefix(spark, testdata_sf01).collect()]
    assert a == b
    assert 0 < len(a) <= 10
    assert a[0][0] == 1  # rk starts at 1 (the seed row ranks first)
    ok, msg = compare(df, sql_search_prefix(synth_dir(0.01)),
                      testdata_sf01)
    assert ok, msg


def test_csv_manual_max_mid_is_computed(spark, testdata_sf01):
    """A2: base mid comes from MAX(mid) of the pre-existing Manual set
    (999 in the deterministic prev table), not a constant."""
    from memex_kg_spark.queries.kg import q_csv_manual_ingest
    first = q_csv_manual_ingest(spark, testdata_sf01).first()
    assert first["mid"] == 1000  # 999 + row_number 1
