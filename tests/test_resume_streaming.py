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


def test_concurrent_run_matches_sequential(spark, sf_dir_smoke,
                                           batch_triples):
    """r4: bucket jobs submitted through a bounded thread pool produce
    the identical graph + lineage as the sequential path (bucket output
    dirs are disjoint; the lineage append is lock-serialized)."""
    tmp = tempfile.mkdtemp(prefix="kgwh-conc-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                              run_id="conc")
        stats = w.run(concurrency=3)
        assert stats["processed"] == 6 and stats["skipped"] == 0
        assert _triple_set(w.triples()) == batch_triples

        m = w.metrics().toPandas()
        assert sorted(m["bucket"].tolist()) == list(range(6))
        assert (m["status"] == "ok").all()
        # observe-metric exactness: per-bucket rows_in sums to the corpus
        # turn count, per-bucket n_triples sums to the global triple count
        # (conv_ids are hash-disjoint across buckets)
        d = load_synth(spark, sf_dir_smoke)
        assert int(m["rows_in"].sum()) == d["transcripts"].count()
        assert int(m["n_triples"].sum()) == w.triples().count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_process_bucket_single_write_job(spark, sf_dir_smoke):
    """r4 verdict #6: lineage metrics ride the write via df.observe —
    no separate input-count job and no re-read-what-was-written job.
    Pin it by counting jobs in a job group on a warm session (dim memos
    built): the bucket's job group must contain no more jobs than the
    write itself plus its broadcast/AQE sub-jobs, and crucially FEWER
    than the old 3-scans-per-bucket shape."""
    tmp = tempfile.mkdtemp(prefix="kgwh-jobs-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=4,
                              run_id="jobs")
        w.process_bucket(0)  # warm: session dim memos, Python workers
        sc = spark.sparkContext
        sc.setJobGroup("pb-probe", "process_bucket job-count probe")
        try:
            rows_in, n_triples = w.process_bucket(1)
        finally:
            sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup("pb-probe")
        assert jobs, "no jobs recorded in the probe group"
        # Every job must belong to the single write action: AQE stage
        # materializations inherit the action's call site ('parquet at
        # ...'), broadcast builds surface as '$anonfun...' future jobs.
        # The old shape ran two additional ACTIONS per bucket — an input
        # t.count() and a written-re-read .count() — which would appear
        # here as 'count at ...' stages. Pin their absence.
        names = []
        for j in jobs:
            info = st.getJobInfo(j)
            for s in (info.stageIds if info else []):
                si = st.getStageInfo(s)
                if si:
                    names.append(si.name.split("\n")[0])
        assert names and all(
            n.startswith("parquet at") or n.startswith("$anonfun")
            for n in names), names
        assert rows_in > 0 and n_triples > 0
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


def test_committed_buckets_reraises_transient_errors(spark, sf_dir_smoke):
    """r5 (verdict #4): a transient lineage READ failure must abort the
    resume, not silently return "no buckets committed" and reprocess the
    whole warehouse. Only true absence (fresh run) maps to set()."""
    tmp = tempfile.mkdtemp(prefix="kgwh-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                              run_id="r1")
        # fresh warehouse: lineage absent -> empty set, no raise
        assert w.committed_buckets() == set()
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.run(fail_after=2)
        assert len(w.committed_buckets()) == 2

        # corrupt the lineage dir so the read fails while the path
        # EXISTS: a stand-in for any transient FS/catalog read error
        lp = w.lineage_path
        shutil.rmtree(lp)
        os.makedirs(lp)
        with open(os.path.join(lp, "part-corrupt.parquet"), "w") as f:
            f.write("not a parquet file")
        with pytest.raises(Exception):
            w.committed_buckets()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lineage_compaction_preserves_resume(spark, sf_dir_smoke):
    """r5 (r4 verdict cosmetic #4): after a full run the per-bucket
    lineage files compact into one; committed_buckets is unchanged and
    a re-run still skips every bucket."""
    import glob
    tmp = tempfile.mkdtemp(prefix="kgwh-")
    try:
        w = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                              run_id="c1")
        w.run()  # default min_files=16 > 6: no compaction yet
        before = w.committed_buckets()
        assert before == set(range(6))
        n_files = len(glob.glob(os.path.join(w.lineage_path, "part-*")))
        assert n_files >= 6

        removed = w.compact_lineage(min_files=2)
        assert removed == n_files
        assert len(glob.glob(
            os.path.join(w.lineage_path, "part-*"))) == 1
        assert w.committed_buckets() == before

        w2 = ResumableKGWriter(spark, sf_dir_smoke, tmp, n_buckets=6,
                              run_id="c2")
        stats = w2.run()
        assert stats["processed"] == 0 and stats["skipped"] == 6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
