"""Unit tests: Dominant-Set dynamics, reference embedding bug pin,
n-hop frontier."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_dominant_set_two_cliques():
    from memex_kg_spark.operators.dominant_set import (
        dominant_set_clusters, modularity)
    # two 3-cliques (the second internally weaker — exactly symmetric
    # cliques are a degenerate fixed point the reference's eps=1e-4
    # dynamics also cannot split) joined by one weak edge
    A = np.zeros((6, 6))
    for grp, w in (([0, 1, 2], 1.0), ([3, 4, 5], 0.8)):
        for i in grp:
            for j in grp:
                if i != j:
                    A[i, j] = w
    A[2, 3] = A[3, 2] = 0.1
    clusters = dominant_set_clusters(A)
    assert sorted(map(tuple, clusters[:2])) == [(0, 1, 2), (3, 4, 5)]
    labels = [0, 0, 0, 1, 1, 1]
    assert modularity(A, labels) > 0.3


def test_constrained_ds_prefers_seed():
    from memex_kg_spark.operators.dominant_set import (
        constrained_dominant_set)
    A = np.zeros((6, 6))
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in grp:
            for j in grp:
                if i != j:
                    A[i, j] = 1.0
    x = constrained_dominant_set(A, seed_idx=[4])
    # the seed's clique carries the mass
    assert x[3:].sum() > x[:3].sum()


def test_reference_embedding_bug_documented(spark):
    """Pin the DELIBERATE deviation: the reference's accumulator
    overwrite (db/models.py:43) yields last_word_vector / n_words, NOT
    the mean. Both behaviors implemented; the pipeline uses the mean."""
    from memex_kg_spark.operators.embed_text import (
        avg_feature_vector, avg_feature_vector_reference_buggy,
        word_vector)
    df = spark.createDataFrame([("alpha beta",)], ["text"])
    out = df.select(
        avg_feature_vector(F.col("text")).alias("mean_vec"),
        avg_feature_vector_reference_buggy(F.col("text")).alias("bug_vec"),
        word_vector(F.lit("alpha")).alias("va"),
        word_vector(F.lit("beta")).alias("vb"),
    ).first()
    va, vb = np.array(out["va"]), np.array(out["vb"])
    np.testing.assert_allclose(out["mean_vec"], (va + vb) / 2, atol=1e-6)
    np.testing.assert_allclose(out["bug_vec"], vb / 2, atol=1e-6)
    assert not np.allclose(out["mean_vec"], out["bug_vec"])


def test_nhop_known_graph(spark):
    from memex_kg_spark.operators.nhop import n_hop_expand
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "a"), ("b", "a")],
        ["src", "dst"])
    got = {(r["id"], r["hop"])
           for r in n_hop_expand(edges, ["a"], hops=2).collect()}
    # outgoing only: a->b (1), b->{c,a} (c at 2), x unreachable, d beyond
    assert got == {("a", 0), ("b", 1), ("c", 2)}
