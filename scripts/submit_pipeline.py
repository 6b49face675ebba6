"""spark-submit entry point for the KG-construction pipeline.

The north rule runs the job "via spark-submit --py-files on a
multi-executor cluster".  This is that job main: the driver script is
self-contained, imports `memex_kg_spark` from the --py-files zip (NOT
from a repo checkout on the driver's filesystem), and materializes the
bucketed triples warehouse + nodes/edges through the lineage-aware
resumable writer.

Usage (see scripts/spark_submit.sh for the packaged invocation):

    spark-submit --master local[8] \
        --py-files /tmp/memex_kg_spark.zip \
        scripts/submit_pipeline.py \
        --synth /root/repo/.synth/sf0.001 --out /tmp/kg_out \
        --n-buckets 8 --run-id run-1

On a real cluster only --master changes (yarn / k8s / spark://...);
the job itself is master-agnostic.  Re-running after a crash resumes
from committed lineage (anti-join of pending buckets vs lineage rows).
"""
import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", required=True,
                    help="transcript corpus dir (conv_id, turn_idx, role, "
                         "text, tool, ts)")
    ap.add_argument("--out", required=True, help="warehouse output root")
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--run-id", default="run-1")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    a = ap.parse_args()

    from pyspark.sql import SparkSession
    b = SparkSession.builder.appName("memex-kg-construct")
    if a.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(a.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Import AFTER the session exists so the module resolves from the
    # --py-files zip on executors exactly as it does on the driver.
    from memex_kg_spark.io.tables import ResumableKGWriter

    w = ResumableKGWriter(spark, a.synth, a.out,
                          n_buckets=a.n_buckets, run_id=a.run_id)
    stats = w.run()
    nodes, edges = w.finalize_graph()
    summary = {
        **stats,
        "n_triples": w.triples().count(),
        "n_nodes": nodes.count(),
        "n_edges": edges.count(),
    }
    print("SUBMIT_SUMMARY=" + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
