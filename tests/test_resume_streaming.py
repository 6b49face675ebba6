"""M4 invariants: resume-equals-fresh, idempotent re-run, streaming
equals batch (SURVEY.md §5.3)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from memex_kg_spark.io.tables import ResumableKGWriter
from memex_kg_spark.pipeline import extract_triples, load_synth

TRIPLE_COLS = ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_type"]


def _triple_set(df):
    return set(map(tuple,
                   df.toPandas()[TRIPLE_COLS].astype(str).values.tolist()))


@pytest.fixture(scope="module")
def batch_triples(spark, sf_dir_smoke):
    d = load_synth(spark, sf_dir_smoke)
    return _triple_set(extract_triples(d["transcripts"], d["alias_dim"],
                                       d["pred_dim"]))


def test_resume_equals_fresh(spark, sf_dir_smoke, batch_triples):
    tmp = tempfile.mkdtemp(prefix="kgwh-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                              run_id="crashy")
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.run(fail_after=2)
        assert len(w.committed_buckets()) == 2

        # resume with a new writer (fresh process semantics)
        w2 = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                               run_id="resume")
        stats = w2.run()
        assert stats["skipped"] == 2 and stats["processed"] == 4

        assert _triple_set(w2.triples()) == batch_triples

        # idempotent re-run: nothing pending, nothing rewritten
        stats3 = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                                   run_id="noop").run()
        assert stats3["processed"] == 0 and stats3["skipped"] == 6
        assert _triple_set(w2.triples()) == batch_triples

        # lineage metrics: one ok row per bucket (6 total across runs)
        m = w2.metrics().toPandas()
        assert sorted(m["bucket"].unique().tolist()) == list(range(6))
        assert (m["status"] == "ok").all()
        assert (m["wall_ms"] >= 0).all()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_finalize_graph_matches_oracle(spark, sf_dir_smoke):
    import pandas as pd
    from memex_kg_spark.oracle import reference_impl as ref

    tmp = tempfile.mkdtemp(prefix="kgwh-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=4,
                              run_id="full")
        w.run()
        nodes, edges = w.finalize_graph()
        tr = pd.read_parquet(f"{sf_dir_smoke}/transcripts.parquet")
        al = pd.read_parquet(f"{sf_dir_smoke}/alias_dim.parquet")
        pr = pd.read_parquet(f"{sf_dir_smoke}/pred_dim.parquet")
        golden = ref.run_all(tr, al, pr)
        got_e = set(map(tuple, edges.toPandas()[["src", "pred", "dst"]]
                        .astype(str).values.tolist()))
        want_e = set(map(tuple, golden["edges"].astype(str)
                         .values.tolist()))
        assert got_e == want_e
        assert nodes.count() == len(golden["nodes"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_equals_batch(spark, sf_dir_smoke, batch_triples):
    from memex_kg_spark.streaming.incremental import (
        run_incremental, streamed_triples)

    tmp = tempfile.mkdtemp(prefix="kgstream-")
    try:
        # split the corpus into several files so multiple micro-batches fire
        src_dir = os.path.join(tmp, "in")
        d = load_synth(spark, sf_dir_smoke)
        d["transcripts"].repartition(8).write.mode("overwrite").parquet(
            src_dir)
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        run_incremental(spark, src_dir, sf_dir_smoke, out, ckpt)
        got = _triple_set(streamed_triples(spark, out))
        assert got == batch_triples

        # drain again with the same checkpoint: no new data -> no new rows
        n_before = streamed_triples(spark, out).count()
        run_incremental(spark, src_dir, sf_dir_smoke, out, ckpt)
        assert streamed_triples(spark, out).count() == n_before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
