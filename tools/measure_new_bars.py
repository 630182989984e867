"""Measure cold bars for newly-benched entries under the r10
self-contained protocol: one fresh JVM per invocation, bench._warmup +
bench._calibrate, then bench._run_suite over the requested names (each
row pays its own fixtures; caches invalidated after every query).
Prints one JSON line {calib, timings, phases}. Run N times for an
N-session envelope; scale each session by calib/CALIB_REF_S and take
the max per query (bench.py's _R10_COLD_BARS recipe).

Usage: PYTHONPATH=/root/repo python tools/measure_new_bars.py name [name...]
"""

from __future__ import annotations

import json
import sys

import bench
from cargo_chat_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure_new_bars")
    bench._warmup(spark, sf_dir)
    calib = bench._calibrate(spark)
    timings, phases = bench._run_suite(spark, sf_dir, names)
    print(json.dumps({"calib": calib, "timings": timings, "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
