"""Oracle parity: the Spark pipeline must reproduce the pure-Python
reference-semantics oracle exactly (P/R target 1.0; BASELINE.json demands
>= 0.95 on the (subj, pred, obj) set)."""

from __future__ import annotations

import pandas as pd
import pytest

from memex_kg_spark.oracle import reference_impl as ref
from memex_kg_spark.pipeline import build_kg


@pytest.fixture(scope="module")
def kg(spark, sf_dir_smoke):
    return build_kg(spark, sf_dir_smoke)


@pytest.fixture(scope="module")
def golden(sf_dir_smoke):
    tr = pd.read_parquet(f"{sf_dir_smoke}/transcripts.parquet")
    al = pd.read_parquet(f"{sf_dir_smoke}/alias_dim.parquet")
    pr = pd.read_parquet(f"{sf_dir_smoke}/pred_dim.parquet")
    return ref.run_all(tr, al, pr)


def _as_sorted_set(df: pd.DataFrame, cols: list[str]) -> set[tuple]:
    return set(map(tuple, df[cols].astype(str).itertuples(index=False,
                                                          name=None)))


def precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return (0.0, 0.0)
    tp = len(got & want)
    return tp / len(got), tp / len(want)


def test_triples_pr(kg, golden):
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_type"]
    got = _as_sorted_set(kg["triples"].toPandas(), cols)
    want = _as_sorted_set(golden["triples"], cols)
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, f"P={p} R={r}"
    assert p == 1.0 and r == 1.0, f"expected exact parity, P={p} R={r}"


def test_spo_set_pr(kg, golden):
    """The headline metric: bare (subj, pred, obj) set P/R."""
    cols = ["subj", "pred", "obj"]
    got = _as_sorted_set(kg["triples"].toPandas(), cols)
    want = _as_sorted_set(golden["triples"], cols)
    p, r = precision_recall(got, want)
    assert p == 1.0 and r == 1.0, f"P={p} R={r}"


def test_mentions_exact(kg, golden):
    cols = ["conv_id", "turn_idx", "mention_id", "surface", "norm_surface",
            "start", "end"]
    got = _as_sorted_set(kg["mentions"].toPandas(), cols)
    want = _as_sorted_set(golden["mentions"], cols)
    assert got == want


def test_nodes_edges_exact(kg, golden):
    ncols = ["qid", "label", "node_type", "lat", "lon", "canonical_id"]
    got_n = _as_sorted_set(kg["nodes"].toPandas(), ncols)
    want_n = _as_sorted_set(golden["nodes"], ncols)
    assert got_n == want_n
    ecols = ["src", "pred", "dst"]
    got_e = _as_sorted_set(kg["edges"].toPandas(), ecols)
    want_e = _as_sorted_set(golden["edges"], ecols)
    assert got_e == want_e


def test_turn_order_invariant(spark, sf_dir_smoke):
    """Per-row invariant: per-turn text equality under stable (conv_id,
    turn_idx) ordering — row-for-row against the sorted raw data."""
    from memex_kg_spark.pipeline import load_synth, stable_turns

    tr = load_synth(spark, sf_dir_smoke)["transcripts"]
    got = (stable_turns(tr).orderBy("conv_id", "turn_idx")
           .select("conv_id", "turn_idx", "turn_seq", "text").toPandas())
    want = (pd.read_parquet(f"{sf_dir_smoke}/transcripts.parquet")
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert (got["text"].fillna("") == want["text"].fillna("")).all()
    # dense 1..n within each conversation
    assert (got.groupby("conv_id")["turn_seq"].apply(
        lambda s: (s.values == range(1, len(s) + 1)).all())).all()
