"""Warm-context measurement for optimization A/B runs: one JVM,
bench._warmup, then the named queries run N passes (caches invalidated
between queries and between passes, exactly like bench._run_suite).
Pass 1 approximates the cold single-shot; later passes approximate the
mid-suite warm context the driver's bench actually measures queries in
(JIT/codegen families already compiled by earlier queries).

Usage: PYTHONPATH=/root/repo python tools/measure_warm.py [--passes N] name...
"""

from __future__ import annotations

import argparse
import json

import bench
from cargo_chat_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("names", nargs="+")
    opts = ap.parse_args()
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="measure_warm")
    bench._warmup(spark, sf_dir)
    calib = bench._calibrate(spark)
    out = []
    for _ in range(opts.passes):
        timings, _phases = bench._run_suite(spark, sf_dir, opts.names)
        out.append(timings)
    print(json.dumps({"calib": calib, "passes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
