#!/usr/bin/env python
"""Break down the extract_triples stage at one core count (warm measures).

Usage: python scripts/profile_triples.py --cores 32 --synth /root/repo/.synth/sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--synth", required=True)
    a = ap.parse_args()

    import bench
    from memex_kg_spark import pipeline
    from memex_kg_spark.operators.extraction import extract_statements

    spark = bench.make_spark(a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    d = pipeline.load_synth(spark, a.synth)

    def t(name, df, reps=2):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            bench.noop_write(df)
            best = min(best, time.time() - t0)
        print(f"TIMING {name}={best:.3f}", flush=True)

    stmts = extract_statements(d["transcripts"])
    t("extraction_only", stmts)
    st = pipeline.statement_triples(stmts, d["alias_dim"], d["pred_dim"])
    t("statement_triples", st)
    ct = pipeline.claim_triples(stmts, d["alias_dim"])
    t("claim_triples", ct)
    un = st.unionByName(ct)
    t("union_nodedup", un)
    dd = un.dropDuplicates(
        ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_type"])
    t("union_dedup", dd)

    full = pipeline.extract_triples(d["transcripts"], d["alias_dim"],
                                    d["pred_dim"])
    for reps in range(2):
        t0 = time.time()
        p = full.persist()
        n = p.count()
        el = time.time() - t0
        print(f"TIMING persist_count run{reps}={el:.3f} n={n}", flush=True)
        p.unpersist(blocking=True)
    spark.stop()


if __name__ == "__main__":
    main()
