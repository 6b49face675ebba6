#!/usr/bin/env python
"""Per-stage scaling profile: run the flagship pipeline at one core count,
repeated R times in the same JVM (run 1 = warm-up: JVM JIT, Python worker
spawn, broadcast build). Prints one JSON line per run.

Usage: python scripts/profile_scaling.py --cores 8 --synth /root/repo/.synth/sf1 [--repeat 2]
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
    ap.add_argument("--repeat", type=int, default=2)
    a = ap.parse_args()

    import bench
    spark = bench.make_spark(a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    for i in range(a.repeat):
        t0 = time.time()
        stages = bench.run_pipeline(spark, a.synth)
        stages["wall_total"] = round(time.time() - t0, 3)
        stages["run"] = i
        stages["cores"] = a.cores
        print("PROFILE=" + json.dumps(stages), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
