"""Diagnostic: is the sf6 local[2] in-run probe reading self-load or host noise?

Round-4 evidence question (BENCH/BASELINE.md "sf6 local[2] self-load note"):
three quiet-window shots landed walls within 0.4% of each other while their
in-run bandwidth probes read 6.4-7.9x — storms inflate WALLS 3-10x with high
variance, so consistent walls + hot probe points at the measured job's OWN
memory traffic. Prime suspect: GC ergonomics. The bench JVM sees all 32 host
vCPUs, so even local[2] runs with ~20+ parallel GC threads; their collection
bursts saturate memory bandwidth in a way a REAL 2-core executor (whose JVM
sizes GC threads from its container's 2 CPUs) never would.

This script re-runs the IDENTICAL pipeline (bench.run_pipeline, same synth
corpus, same make_spark config) with `-XX:ActiveProcessorCount=<cores>` so the
JVM sizes GC/JIT/common pools for the core count it is actually given — the
faithful emulation of an N-core executor. It banks NOTHING (measured config
differs from the workload hash's); it only prints walls + in-run probe ratios
so the two configurations can be compared:

  - wall unchanged + in-run drops under the gate  => probe was reading our own
    GC; the banked "dirty" sf6 c2 walls are honest clean-host walls.
  - wall drops materially                          => GC contention was also
    costing wall time; a salt-bumped re-harvest is worth it.
  - in-run still hot                               => hypothesis wrong; keep
    treating those samples as dirty.

Usage: python scripts/diag_gc_selfload.py <synth_dir> <cores> [repeat]
(Heavy Spark work: callers should hold BENCH/.camp.lock around it.)
"""
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    synth = sys.argv[1]
    cores = int(sys.argv[2])
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # Must be set BEFORE the driver JVM launches (client-mode
    # driver-java-options cannot come from SparkConf).
    flags = (f"-XX:ActiveProcessorCount={cores} "
             f"-XX:ParallelGCThreads={cores} -XX:ConcGCThreads=1")
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f'--driver-java-options "{flags}" pyspark-shell')

    import bench  # noqa: E402  (after env so the JVM picks the flags up)

    spark = bench.make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    # confirm the flags actually reached the JVM
    rmx = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    print(f"# JVM availableProcessors = {rmx.availableProcessors()} "
          f"(requested {cores})", flush=True)

    bench.run_pipeline(spark, synth)  # warm-up (JIT, broadcasts), untimed
    floor = bench._cal_floor()
    samples_out = []
    for i in range(repeat):
        ticks: list = []
        stop = threading.Event()

        def poll():
            while not stop.wait(5.0):
                v = bench._calibrate(skip_if_busy=True)
                if v is not None:
                    ticks.append(v)

        pre = bench._calibrate()
        th = threading.Thread(target=poll, daemon=True)
        th.start()
        t0 = time.time()
        stages = bench.run_pipeline(spark, synth)
        wall = round(time.time() - t0, 3)
        stop.set()
        th.join(timeout=2.0)
        post = bench._calibrate()
        fl = min(floor, pre, post)
        rec = {
            "wall": wall,
            "pipeline_total": stages["pipeline_total"],
            "bracket": round(max(pre, post) / fl, 2),
            "inrun_worst": round(max(ticks) / fl, 2) if ticks else None,
            "inrun_all": [round(v / fl, 2) for v in ticks],
            "n_triples": stages["n_triples"],
        }
        samples_out.append(rec)
        print("DIAG_SAMPLE=" + json.dumps(rec), flush=True)
    print("DIAG_JSON=" + json.dumps({
        "cores": cores, "synth": synth, "flags": flags,
        "samples": samples_out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
