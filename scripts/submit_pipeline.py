#!/usr/bin/env python
"""spark-submit entry point (north_rule: runs via spark-submit --py-files
on multi-executor clusters).

Usage:
    scripts/package.sh     # builds dist/ccspark.zip
    spark-submit --master <master> --py-files dist/ccspark.zip \
        scripts/submit_pipeline.py [n_urls]

Runs the scheduling pipeline over a synthetic frontier and prints one
JSON line. On a real cluster the only local-mode assumption to revisit
is spark.driver.memory (executors carry the work).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (SparkSession.builder.appName("ccspark-pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
             .getOrCreate())
    from ccspark.benchflow import schedule_pipeline
    t0 = time.perf_counter()
    scheduled = schedule_pipeline(spark, n)
    dt = time.perf_counter() - t0
    print(json.dumps({"n_urls": n, "scheduled": scheduled,
                      "sec": round(dt, 2),
                      "urls_per_sec": round(n / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
